package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Statistical-invariant queries: approx- or hash-dependent operators whose
  * raw outputs cannot be reproduced by another engine (xxhash64 splits, HLL
  * sketches, KLL percentiles, iterative float loops) REPHRASED as the bound
  * their guarantee promises, so a plain-SQL oracle can verify them. The
  * Spark side computes the bound FROM DATA; the oracle states what the
  * guarantee says it must be — a hash mismatch means a broken guarantee,
  * not a dialect difference. This converts "trust me, it's approximate"
  * into a driver-checkable gate.
  */
object Invariants {

  /** xxhash64 split proportions: each split's count must sit within 5σ of
    * its binomial expectation (p = 0.8/0.1/0.1 of N docs). The hash values
    * are engine-specific; the uniformity claim is not. */
  def splitBounds(spark: SparkSession, dir: String): DataFrame = {
    val counts = Curation.splitAssign(spark, dir)
      .groupBy("split").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("n_total"))
    counts.crossJoin(broadcast(tot))
      .withColumn("target_frac",
        when(col("split") === "train", 0.8).otherwise(0.1))
      .withColumn("within_5sigma",
        abs(col("n") - col("target_frac") * col("n_total")) <=
          lit(5.0) * sqrt(col("target_frac") * (lit(1.0) - col("target_frac"))
            * col("n_total")))
      .select(col("split"), col("target_frac"), col("within_5sigma"))
  }

  val splitBoundsSql: String =
    """SELECT * FROM (VALUES
      |  ('test',  CAST(0.1 AS DOUBLE), true),
      |  ('train', CAST(0.8 AS DOUBLE), true),
      |  ('val',   CAST(0.1 AS DOUBLE), true))
      |  AS t(split, target_frac, within_5sigma)""".stripMargin

  /** Cardinality-sketch error bounds per group: Spark's HLL++
    * (approx_count_distinct, rsd 0.01 ⇒ 3σ = 3%) and graft's own
    * TypedImperativeAggregate HLL (p=12 ⇒ σ ≈ 1.04/√4096 ≈ 1.6%, 3σ ≈ 5%)
    * against the exact distinct count, in one pass over events. The ±1
    * slack keeps tiny groups (σ < 1 count) honest. */
  def cardinalityBounds(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // two scans, joined on the 5-row result: countDistinct plans through an
    // Expand (one row per distinct-group), and dragging the imperative HLL
    // aggregate through that path degenerates to SortAggregate over the
    // expanded stream (measured 7 s vs 2 s split at sf0.1). Each aggregate
    // alone keeps its fast plan: hash agg for the distincts,
    // ObjectHashAggregate for the sketch.
    val exactApprox = ev.groupBy("event_type").agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.01).as("approx"))
    val hll = ev.groupBy("event_type").agg(
      graft.functions.HllAggregate.hll_distinct(col("user_id")).as("hll"))
    exactApprox.join(hll, "event_type")
      .select(col("event_type"),
        (abs(col("approx") - col("exact")) <=
          greatest(lit(1.0), lit(0.03) * col("exact"))).as("approx_within_3sigma"),
        (abs(col("hll") - col("exact")) <=
          greatest(lit(1.0), lit(0.05) * col("exact"))).as("hll_within_3sigma"))
  }

  val cardinalityBoundsSql: String =
    """SELECT event_type, true AS approx_within_3sigma, true AS hll_within_3sigma
      |FROM events GROUP BY event_type""".stripMargin

  /** Percentile-sketch rank-error bound, checked AS the guarantee is
    * stated: approx_percentile(value, p, accuracy) returns an actual data
    * element whose RANK is within εN of pN (ε = 1/accuracy) — so count the
    * element's rank interval [#(v < x)+1, #(v ≤ x)] and require it to
    * intersect [(p−ε)N, (p+ε)N]. Rank-space, not value-space: a
    * value-envelope check breaks when εN < 1 (small groups), the rank form
    * is exact at any N. ±1 slack absorbs floor/ceil rank conventions. */
  def percentileBounds(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("event_type", "value")
    val approx = ev.groupBy("event_type").agg(
      expr("approx_percentile(value, 0.5, 1000)").as("p50a"),
      expr("approx_percentile(value, 0.9, 1000)").as("p90a"))
    def rankOk(lo: String, hi: String, p: Double) = {
      val eps = 0.001
      (col(lo) + 1 <= (lit(p) + eps) * col("n") + 1) &&
        (col(hi) >= (lit(p) - eps) * col("n") - 1)
    }
    ev.join(broadcast(approx), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("p50a"), 1L).otherwise(0L)).as("lo50"),
        sum(when(col("value") <= col("p50a"), 1L).otherwise(0L)).as("hi50"),
        sum(when(col("value") < col("p90a"), 1L).otherwise(0L)).as("lo90"),
        sum(when(col("value") <= col("p90a"), 1L).otherwise(0L)).as("hi90"))
      .select(col("event_type"),
        rankOk("lo50", "hi50", 0.5).as("p50_within_rank_error"),
        rankOk("lo90", "hi90", 0.9).as("p90_within_rank_error"))
  }

  val percentileBoundsSql: String =
    """SELECT event_type, true AS p50_within_rank_error, true AS p90_within_rank_error
      |FROM events GROUP BY event_type""".stripMargin

  /** Lloyd's-algorithm convergence invariant: both k-means steps minimize
    * L2, so SSE is non-increasing across iterations — checked from the
    * returned stats table (the SSE floats themselves are
    * accumulation-order-specific and not portable). */
  def ivfTrainMonotone(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("iter")
    Similarity.ivfTrain(spark, dir)
      .withColumn("prev_sse", lag("sse", 1).over(w))
      .select(col("iter"),
        (col("prev_sse").isNull || col("sse") <= col("prev_sse") + 1e-6)
          .as("sse_nonincreasing"))
  }

  def ivfTrainMonotoneSql(iters: Int = 3): String =
    s"""SELECT CAST(i AS INT) AS iter, true AS sse_nonincreasing
       |FROM range(0, ${iters + 1}) t(i)""".stripMargin
}
