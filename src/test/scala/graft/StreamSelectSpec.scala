package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation
import graft.serve.TxTable
import graft.streaming.StreamSelect
import java.nio.file.Files

/** Ingest-time DSIR gate: offline-trained LM ratio table, per-batch
  * scoring, atomic TxTable MERGE — streamed decisions must equal the batch
  * pipeline's weights exactly (shared binning/smoothing kernels). */
class StreamSelectSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streamed selection equals batch weights; replay is idempotent") {
    val root = Files.createTempDirectory("stream_select").toString
    // the "arriving" half of the corpus: odd doc_ids
    val arriving = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 1).select("doc_id", "text")
    arriving.write.mode("overwrite").parquet(s"$root/in")
    // offline training over the WHOLE lake (the nightly job)
    val ratio = Curation.dsirRatio(spark, sf).cache()
    val table = s"$root/decisions"
    StreamSelect.selectStreamTx(spark, s"$root/in", ratio, table, s"$root/ckpt")
    val streamed = TxTable.read(spark, table).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("log_weight"),
        r.getAs[Boolean]("keep"))).toSet
    // batch truth: the registered q_dsir_weights pipeline's weights for
    // the same docs (same ratio, same kernels), thresholded at 0
    val batch = StreamSelect.selectGate(arriving, ratio).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("log_weight"),
        r.getAs[Boolean]("keep"))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) ==
      arriving.select("doc_id").collect().map(_.getLong(0)).toSet,
      "total coverage: every arriving doc gets a decision")
    // the weights must ALSO match the registered batch query bit-for-bit
    val registered = Curation.dsirWeights(spark, sf)
      .select(col("doc_id"), col("log_weight"))
      .filter(col("doc_id") % 2 === 1).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(streamed.map(t => (t._1, t._2)) == registered,
      "gate and registered query share kernels — weights must be identical")
    // replay from a fresh checkpoint: decisions converge to the same table
    StreamSelect.selectStreamTx(spark, s"$root/in", ratio, table, s"$root/ckpt2")
    val replayed = TxTable.read(spark, table).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("log_weight"),
        r.getAs[Boolean]("keep"))).toSet
    assert(replayed == streamed)
  }

  test("novel vocabulary is neutral, not dropped and not rewarded; duplicates score once") {
    import spark.implicits._
    val ratio = Curation.dsirRatio(spark, sf).cache()
    // a doc whose vocabulary the lake has never seen: every feature hashes
    // to SOME bucket of the dense ratio table and must be COUNTED — but an
    // evidence-free bucket contributes lr = 0, never the corpus-size-bias
    // floor ln((ts+αB)/(tt+αB)) > 0, which would make the gate score
    // gibberish ABOVE genuine target docs, growing with document length
    val novel = Seq((900001L, "zzqx wvvk pflm zzqx wvvk")).toDF("doc_id", "text")
    val scored = StreamSelect.selectGate(novel, ratio).collect().head
    // 5 unigrams + 4 bigrams = 9 feature occurrences, all counted (at
    // B=4096 most buckets hold SOME corpus evidence, so hash collisions
    // legitimately give a small nonzero weight — that is DSIR's hashed
    // feature sharing, not a bug)
    assert(scored.getAs[Long]("n_feats") == 9L,
      s"unseen-bucket features must still count: ${scored}")
    // the anti-bias invariant: before the evidence-free floor fix, every
    // novel feature added ~ln(ts/tt) ≈ +0.9, so this doc scored ≈ +8 and
    // a 10× longer one ≈ +80 — gibberish weight must NOT grow with length
    val long = Seq((900002L,
      Seq.fill(10)("zzqx wvvk pflm zzqx wvvk").mkString(" qqvz ")))
      .toDF("doc_id", "text")
    val wShort = scored.getAs[Double]("log_weight")
    val wLong = StreamSelect.selectGate(long, ratio).collect().head
      .getAs[Double]("log_weight")
    assert(math.abs(wShort) < 1.0,
      s"novel doc must score near-neutral, got $wShort (bias would be ~+8)")
    assert(wLong < 1.0,
      s"gibberish weight must not grow with length, got $wLong (bias would be ~+80)")
    assert(!StreamSelect.selectGate(long, ratio, threshold = 1.0)
      .collect().head.getAs[Boolean]("keep"),
      "long gibberish must not out-score a target-likeness threshold")
    // the same doc twice in one micro-batch scores as ONE doc (a producer
    // retry must not double the weight)
    val dup = novel.unionAll(novel)
    val once = StreamSelect.selectGate(dup, ratio).collect()
    assert(once.length == 1)
    assert(once.head.getAs[Long]("n_feats") == 9L &&
      once.head.getAs[Double]("log_weight") ==
        scored.getAs[Double]("log_weight"))
  }
}
