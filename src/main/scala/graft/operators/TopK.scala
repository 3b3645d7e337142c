package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Bounded-memory top-k per group as a typed `Aggregator`.
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy(ord))
  * <= k`) shuffles EVERY row of every group and sorts whole groups — at
  * 100 TB, a group with 10⁹ rows pays a 10⁹ sort for a k=5 answer. This
  * aggregator keeps a k-bounded buffer, is partial-aggregable (map-side
  * combine), and therefore shuffles at most k rows per partition per group:
  * cost O(n log k) scan + O(parts·k) shuffle, independent of group size.
  *
  * Ordering: (ts desc, id desc) — matches `LensQueries.tailNPerKey`, so the
  * same DuckDB window oracle verifies this implementation.
  */
object TopK {

  val K = 5

  /** (sortTs, id, payload) — the id doubles as the deterministic tiebreak. */
  case class Item(ts: Long, id: Long, value: Double)

  class TopKAgg(k: Int) extends Aggregator[Item, List[Item], Seq[Item]] {
    private val ord: Ordering[Item] = Ordering.by(i => (-i.ts, -i.id))
    override def zero: List[Item] = Nil
    override def reduce(b: List[Item], a: Item): List[Item] =
      (a :: b).sorted(ord).take(k)
    override def merge(x: List[Item], y: List[Item]): List[Item] =
      (x ++ y).sorted(ord).take(k)
    override def finish(b: List[Item]): Seq[Item] = b.sorted(ord)
    override def bufferEncoder: Encoder[List[Item]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Item]]()
    override def outputEncoder: Encoder[Seq[Item]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Item]]()
  }

  /** (score DESC, id ASC) bounded top-k — the ANN tiers' re-rank order as
    * an Aggregator: map-side-combinable, shuffles at most k rows per
    * partition per query. The brute tier's old `row_number() over
    * (partition by q_id)` re-rank put ALL N scored rows of a query into
    * one partition for a full sort — at 100× scale, nQueries single-task
    * full-corpus sorts; this keeps the scan distributed and the shuffle
    * k-bounded. Field names match the ANN output schema so consumers
    * project the exploded struct directly. */
  case class Scored(vec_id: Long, cosine: Double)

  class ScoreTopKAgg(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    private val ord: Ordering[Scored] = Ordering.by(s => (-s.cosine, s.vec_id))
    override def zero: List[Scored] = Nil
    override def reduce(b: List[Scored], a: Scored): List[Scored] =
      (a :: b).sorted(ord).take(k)
    override def merge(x: List[Scored], y: List[Scored]): List[Scored] =
      (x ++ y).sorted(ord).take(k)
    override def finish(b: List[Scored]): Seq[Scored] = b.sorted(ord)
    override def bufferEncoder: Encoder[List[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Latest-K events per event_type — identical semantics (and oracle) to
    * the window-based `q_tail_n_per_key`, different physics. */
  def tailKHeap(spark: SparkSession, dir: String, k: Int = K): DataFrame = {
    val topk = udaf(new TopKAgg(k), Encoders.product[Item])
    Tables.events(spark, dir)
      .select(col("event_type"),
        struct(
          unix_micros(col("ts")).as("ts"),
          col("event_id").as("id"),
          col("value").as("value")).as("item"))
      .groupBy("event_type")
      .agg(topk(col("item.ts"), col("item.id"), col("item.value")).as("top"))
      .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "it")))
      .select(col("event_type"), col("it.id").as("event_id"),
        (col("pos") + 1).cast("int").as("rn"),
        date_format(timestamp_micros(col("it.ts")), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        col("it.value").as("value"))
  }
}
