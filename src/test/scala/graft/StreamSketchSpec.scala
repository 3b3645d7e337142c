package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches
import graft.streaming.StreamSketch
import java.nio.file.Files

/** Ingest-time CMS maintenance: stream replay → per-batch partial grids →
  * idempotent TxTable MERGE → assembled sketch ≡ the one-pass batch grid
  * bit-for-bit (CMS merge is a pointwise sum, so order/grouping cannot
  * matter — the strongest streamed ≡ batch contract in the tier). */
class StreamSketchSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs = Tables.documents(spark, sf)
    .select("doc_id", "lang", "text")

  private def batchGrid: Map[String, Seq[Long]] =
    StreamSketch.sketchBatch(docs).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap

  test("streamed partials assemble to the exact batch grid; replay converges") {
    val root = Files.createTempDirectory("stream_sketch").toString
    // three drops, flattened to three files in ONE source dir (the file
    // stream lists files, not subdirectories) — maxFilesPerTrigger=1
    // forces three real micro-batches
    Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    (0 to 2).foreach { i =>
      docs.filter(col("doc_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$root/tmp_$i")
      val part = new java.io.File(s"$root/tmp_$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$root/in/drop_$i.parquet"))
    }
    val table = s"$root/sketch"
    StreamSketch.sketchStreamTx(spark, s"$root/in", table, s"$root/ckpt")
    // three batches committed one partial row set each
    val parts = serve.TxTable.read(spark, table)
    assert(parts.select("part_id").distinct().count() == 3)
    val streamed = StreamSketch.readSketch(spark, table).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val batch = batchGrid
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (lang, grid) =>
      assert(grid == batch(lang), s"grid drift for lang=$lang")
    }
    // replay from a fresh checkpoint: partials overwrite by (lang, part_id),
    // the assembled grid is unchanged — never double-counted
    StreamSketch.sketchStreamTx(spark, s"$root/in", table, s"$root/ckpt2")
    val replayed = StreamSketch.readSketch(spark, table).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(replayed == streamed)
  }

  test("estimates off the streamed grid satisfy the CMS guarantee") {
    val root = Files.createTempDirectory("stream_sketch_est").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$root/in")
    val table = s"$root/sketch"
    StreamSketch.sketchStreamTx(spark, s"$root/in", table, s"$root/ckpt")
    val grids = StreamSketch.readSketch(spark, table).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    // exact counts per (lang, term) over the same normalization
    val exact = docs
      .select(col("lang"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("lang", "term").agg(count(lit(1)).as("c"))
      .collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      val est = Sketches.cmsEstimate(grids(r.getString(0)), r.getString(1),
        Sketches.CmsDepth, Sketches.CmsWidth)
      assert(est >= r.getAs[Long]("c"),
        s"streamed CMS undercounts ${r.getString(1)}")
    }
  }
}
