package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Classifier
import graft.streaming.StreamScore
import java.nio.file.Files

/** Ingest-time learned quality gate: offline-trained weights, per-batch
  * row-local scoring, TxTable MERGE — streamed verdicts ≡ the batch gate
  * (doc-local embedding ⇒ batch-invariant scores), replay idempotent. */
class StreamScoreSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val w = Classifier.qualityTrainFull(spark, sf)._2

  test("streamed verdicts equal the batch gate; replay converges") {
    val root = Files.createTempDirectory("stream_score").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    (0 to 1).foreach { i =>
      docs.filter(col("doc_id") % 2 === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$root/tmp_$i")
      val part = new java.io.File(s"$root/tmp_$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$root/in/drop_$i.parquet"))
    }
    val table = s"$root/verdicts"
    StreamScore.scoreStreamTx(spark, s"$root/in", w, table, s"$root/ckpt")
    val streamed = serve.TxTable.read(spark, table).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
        r.getAs[Boolean]("keep"))).toSet
    val batch = Classifier.qualityGate(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
        r.getAs[Boolean]("keep"))).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} rows vs batch ${batch.size}")
    // replay from a fresh checkpoint: the MERGE re-collapses the same keys
    StreamScore.scoreStreamTx(spark, s"$root/in", w, table, s"$root/ckpt2")
    val replayed = serve.TxTable.read(spark, table).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
        r.getAs[Boolean]("keep"))).toSet
    assert(replayed == streamed)
  }

  test("producer-retry duplicates collapse to one deterministic verdict") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(20)
    val once = StreamScore.scoreGate(docs, w).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    // redeliver every doc twice (same bytes): one verdict per doc, unchanged
    val doubled = StreamScore.scoreGate(docs.unionAll(docs), w).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(doubled == once)
  }
}
