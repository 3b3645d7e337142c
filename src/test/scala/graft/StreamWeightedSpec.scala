package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling
import graft.streaming.StreamWeighted
import java.nio.file.Files

/** Ingest-time weighted (A-ES) sampling: stream replay → per-batch
  * candidate top-ks → idempotent TxTable MERGE → assembled sample ≡ the
  * batch weighted sampler over every ingested doc ROW-FOR-ROW (the rank
  * u^(1/w) is row-intrinsic, so k-largest of a union = k-largest of
  * per-batch k-largests). */
class StreamWeightedSpec extends AnyFunSuite {
  import SparkTestSession._

  private val Budget = 23

  private def docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("lang"), col("source"),
      (col("n_chars") + 1L).as("weight"))

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("streamed weighted candidates assemble to the exact batch sample; replay idempotent") {
    val root = Files.createTempDirectory("stream_weighted").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    (0 to 2).foreach { i =>
      docs.filter(col("doc_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$root/tmp_$i")
      val part = new java.io.File(s"$root/tmp_$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$root/in/drop_$i.parquet"))
    }
    val table = s"$root/sample"
    StreamWeighted.weightedStreamTx(spark, s"$root/in", table, s"$root/ckpt",
      budget = Budget)
    val streamed = ids(StreamWeighted.readSample(spark, table, Budget))
    val batch = ids(Sampling.weightedSampleOf(docs, "weight", Budget))
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed weighted sample diverged: ${streamed.size} vs ${batch.size}")
    // candidate table bounded by budget × batches
    val cands = serve.TxTable.read(spark, table)
    assert(cands.count() <= Budget * 3L)
    // replay from a fresh checkpoint: merge overwrites identical rows
    StreamWeighted.weightedStreamTx(spark, s"$root/in", table, s"$root/ckpt2",
      budget = Budget)
    assert(ids(StreamWeighted.readSample(spark, table, Budget)) == streamed)
  }

  test("read guard: seed mismatch and over-budget reads refuse loudly") {
    val root = Files.createTempDirectory("stream_weighted_guard").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    docs.limit(50).coalesce(1).write.parquet(s"$root/tmp")
    val part = new java.io.File(s"$root/tmp").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, java.nio.file.Paths.get(s"$root/in/drop.parquet"))
    val table = s"$root/sample"
    StreamWeighted.weightedStreamTx(spark, s"$root/in", table, s"$root/ckpt",
      budget = Budget, seed = 7)
    intercept[IllegalArgumentException] {
      StreamWeighted.readSample(spark, table, Budget, seed = 8).collect()
    }
    intercept[IllegalArgumentException] {
      StreamWeighted.readSample(spark, table, Budget + 1, seed = 7).collect()
    }
    assert(ids(StreamWeighted.readSample(spark, table, Budget, seed = 7)).size
      == Budget)
  }
}
