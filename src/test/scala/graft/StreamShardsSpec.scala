package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout
import graft.streaming.StreamShards
import java.nio.file.Files

/** Ingest-time shard assignment: stream replay → per-batch two-phase
  * shuffle append → idempotent insert-if-absent TxTable MERGE. The
  * streamed table must equal the SEQUENTIAL batch incremental
  * composition applied in the realized drop order (each micro-batch is
  * one generation: shuffled among itself, appended at the next shard
  * boundary past the stored high-water mark), and replay must not
  * re-deal a single document. */
class StreamShardsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs = Tables.documents(spark, sf).select("doc_id", "text")

  private type RowT = (Long, Long, Long, Long, Int)
  private def rowsOf(df: org.apache.spark.sql.DataFrame): Array[RowT] =
    df.select("doc_id", "n_tokens", "shuffle_key", "cum_before", "shard")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))

  test("streamed shards equal the sequential incremental composition; replay converges") {
    val root = Files.createTempDirectory("stream_shards").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    (0 to 2).foreach { i =>
      docs.filter(col("doc_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$root/tmp_$i")
      val part = new java.io.File(s"$root/tmp_$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$root/in/drop_$i.parquet"))
    }
    val table = s"$root/shards"
    StreamShards.shardStreamTx(spark, s"$root/in", table, s"$root/ckpt")
    val stored = rowsOf(StreamShards.readShards(spark, table))
    // every ingested doc exactly once
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stored.map(_._1).toSet == allIds && stored.length == allIds.size)
    // realized drop order = ascending stored token offsets per drop set
    val order = stored.groupBy(t => (t._1 % 3).toInt).toSeq
      .map { case (d, rows) => d -> rows.map(_._4).min }
      .sortBy(_._2).map(_._1)
    assert(order.toSet == Set(0, 1, 2))
    // the sequential batch composition in that order must match BIT-FOR-BIT
    var hw = 0L
    val expected = scala.collection.mutable.ArrayBuffer.empty[RowT]
    order.foreach { d =>
      val assigned = rowsOf(StreamShards.shardBatch(spark,
        docs.filter(col("doc_id") % 3 === d), hw))
      expected ++= assigned
      hw = assigned.map(t => t._4 + t._2).max
    }
    assert(stored.toSet == expected.toSet,
      s"streamed assignment diverged from the sequential composition: " +
        s"${(stored.toSet diff expected.toSet).take(3)}")
    // generations occupy disjoint boundary-aligned shard ranges
    val byDrop = stored.groupBy(t => (t._1 % 3).toInt)
    val shardRanges = byDrop.view.mapValues(rows =>
      (rows.map(_._5).min, rows.map(_._5).max)).toMap
    shardRanges.toSeq.combinations(2).foreach {
      case Seq((_, (lo1, hi1)), (_, (lo2, hi2))) =>
        assert(hi1 < lo2 || hi2 < lo1, s"overlapping generations: $shardRanges")
      case _ =>
    }
    byDrop.foreach { case (_, rows) =>
      val first = rows.minBy(_._4)
      assert(first._4 % Layout.ShardTokens == 0,
        s"generation must start on a shard boundary: ${first._4}")
    }
    // replay from a fresh checkpoint: insert-if-absent → nothing moves
    StreamShards.shardStreamTx(spark, s"$root/in", table, s"$root/ckpt2")
    val replayed = rowsOf(StreamShards.readShards(spark, table))
    assert(replayed.toSet == stored.toSet, "replay re-dealt an exported doc")
    assert(replayed.length == stored.length, "replay duplicated rows")
  }
}
