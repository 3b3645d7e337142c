package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.serve.TxTable
import graft.streaming.StreamCurate
import java.nio.file.Files

/** Ingest-time curation gate: stream replay → per-batch gate against the
  * stored LSH index → atomic TxTable MERGE per micro-batch. */
class StreamCurateSpec extends AnyFunSuite {
  import SparkTestSession._

  private def evenIndex = Dedup.bandSignatureRows(
    Tables.spread(spark, Tables.documents(spark, sf))
      .filter(col("doc_id") % 2 === 0), "doc_id", "text")

  private def oddDocs = Tables.documents(spark, sf)
    .filter(col("doc_id") % 2 === 1).select("doc_id", "text")

  test("streamed gate decisions equal the batch gate; replay is idempotent") {
    val root = Files.createTempDirectory("stream_curate").toString
    oddDocs.write.mode("overwrite").parquet(s"$root/in")
    val table = s"$root/decisions"
    StreamCurate.curateStreamTx(spark, s"$root/in", evenIndex, table,
      s"$root/ckpt")
    val streamed = TxTable.read(spark, table).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("keep"),
        r.getAs[String]("drop_reason"))).toSet
    val batch = StreamCurate.curateGate(oddDocs, evenIndex).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("keep"),
        r.getAs[String]("drop_reason"))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == oddDocs.collect().map(_.getLong(0)).toSet)
    // replay from a FRESH checkpoint: the merge re-collapses the same keys,
    // the table converges to the identical decision set
    StreamCurate.curateStreamTx(spark, s"$root/in", evenIndex, table,
      s"$root/ckpt2")
    val replayed = TxTable.read(spark, table).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("keep"),
        r.getAs[String]("drop_reason"))).toSet
    assert(replayed == streamed)
  }

  test("gate semantics: near-dup verdicts come only from probe collisions") {
    val decisions = StreamCurate.curateGate(oddDocs, evenIndex).collect()
    val probed = Dedup.dedupProbe(oddDocs, evenIndex).collect()
      .map(_.getAs[Long]("new_id")).toSet
    decisions.foreach { r =>
      val reason = r.getAs[String]("drop_reason")
      assert(r.getAs[Boolean]("keep") == (reason == null))
      if (reason == "near_duplicate")
        assert(probed.contains(r.getAs[Long]("doc_id")))
    }
    // the fixtures plant cross-half near-dups, so the gate must fire
    assert(decisions.exists(_.getAs[String]("drop_reason") == "near_duplicate"))
    // and an empty index must never yield a near-dup verdict
    val noIndex = StreamCurate.curateGate(oddDocs, evenIndex.limit(0)).collect()
    assert(!noIndex.exists(_.getAs[String]("drop_reason") == "near_duplicate"))
  }
}
