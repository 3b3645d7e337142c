package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.serve.TxTable
import graft.streaming.StreamSemantic
import java.nio.file.Files

/** Ingest-time semantic gate: stream replay → per-batch probe of the
  * STORED IVF layout → atomic TxTable MERGE per micro-batch — the IVF
  * twin of StreamCurateSpec's LSH contract. */
class StreamSemanticSpec extends AnyFunSuite {
  import SparkTestSession._

  // the incremental convention throughout the repo: even ids = stored
  // index, odd ids = the arriving batch
  private def oddVecs = Tables.spread(spark, Tables.embeddings(spark, sf))
    .filter(col("vec_id") % 2 === 1)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  test("streamed semantic gate equals the batch probe; replay is idempotent") {
    val root = Files.createTempDirectory("stream_semantic").toString
    Similarity.writeIvfIndex(spark, sf, s"$root/index")
    oddVecs.write.mode("overwrite").parquet(s"$root/in")
    val table = s"$root/decisions"
    StreamSemantic.semanticStreamTx(spark, s"$root/in", s"$root/index",
      table, s"$root/ckpt")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"), r.getAs[Boolean]("near_dup"),
        Option(r.getAs[java.lang.Double]("max_cosine")).map(_.doubleValue),
        Option(r.getAs[java.lang.Long]("nearest_index_id")).map(_.longValue),
        r.getAs[Long]("n_hits"))
    val streamed = TxTable.read(spark, table).collect().map(key).toSet
    // the batch truth: the stored-index probe's pair list collapsed the
    // same way the gate collapses it
    val pairs = Similarity.semanticProbeStored(spark, sf, s"$root/index").collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("index_id"),
        r.getAs[Double]("cosine")))
    val byVec = pairs.groupBy(_._1)
    val expected = oddVecs.collect().map(_.getLong(0)).map { v =>
      byVec.get(v) match {
        case Some(hs) =>
          val best = hs.maxBy(h => (h._3, -h._2))
          (v, true, Some(best._3), Some(best._2), hs.map(_._2).distinct.length.toLong)
        case None => (v, false, None, None, 0L)
      }
    }.toSet
    assert(streamed == expected)
    // the fixtures plant cross-half near-dups, so the gate must fire
    assert(streamed.exists(_._2))
    // replay from a FRESH checkpoint: merge re-collapses the same keys
    StreamSemantic.semanticStreamTx(spark, s"$root/in", s"$root/index",
      table, s"$root/ckpt2")
    assert(TxTable.read(spark, table).collect().map(key).toSet == streamed)
  }

  test("gate verdicts come only from probed-cell hits; empty index keeps all") {
    val root = Files.createTempDirectory("stream_semantic_gate").toString
    Similarity.writeIvfIndex(spark, sf, s"$root/index")
    val cents = TxTable.read(spark, s"$root/index/centroids")
    val cells = TxTable.read(spark, s"$root/index/cells")
    val d = StreamSemantic.semanticGate(oddVecs, cents, cells).collect()
    assert(d.length == oddVecs.count())
    d.foreach { r =>
      assert(r.getAs[Boolean]("keep") == !r.getAs[Boolean]("near_dup"))
      if (r.getAs[Boolean]("near_dup")) {
        assert(r.getAs[Long]("n_hits") >= 1L)
        assert(r.getAs[Long]("nearest_index_id") % 2 == 0,
          "hits must come from the even-id stored index")
      } else assert(r.getAs[Long]("n_hits") == 0L)
    }
    // no index vectors ⇒ nothing can be a near-dup
    val none = StreamSemantic.semanticGate(oddVecs, cents, cells.limit(0)).collect()
    assert(none.forall(_.getAs[Boolean]("keep")))
  }
}
