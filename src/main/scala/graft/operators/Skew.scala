package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot-key joins.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) splits oversized SORT-MERGE partitions at runtime and is the
  * first line of defense. Salting is the explicit fallback for the cases AQE
  * can't fix: a broadcast-ineligible build side whose single hot key
  * overwhelms one task, or aggregations (AQE never splits an agg key).
  */
object Skew {

  /** Salted equi-join: the skewed (large, hot-keyed) left side gets a
    * deterministic salt derived from a high-entropy column; the right side
    * is exploded `factor`× so every (key, salt) bucket finds its match.
    * Result rows are identical to `left.join(right, key)` — only the
    * partitioning changes: a key with f rows spreads over `factor` tasks.
    *
    * The salt is content-derived (xxhash64 of `entropyCol`), not random —
    * deterministic replays, stable tests. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      entropyCol: String, factor: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(entropyCol)), lit(factor.toLong)))
    val exploded = right.withColumn("__salt",
      explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Audit-driven salting — closes the loop between the [[Profile.keySkewOf]]
    * pre-flight check and [[saltedJoin]]: measure the left side's key skew
    * (one metadata-scale aggregate, the ANALYZE a planner runs before
    * keying a corpus-scale join), salt only when `skew_factor` — max
    * per-key volume over the mean — reaches `threshold`. Below it, the
    * plain join's plan is strictly better (salting explodes the right side
    * `factor`×); above it, one hot key would otherwise funnel its whole
    * volume through a single task. Returns the decision alongside the
    * frame so callers (and the ScaleSpec equivalence pin) can assert which
    * path ran. Result rows are identical either way — the [[saltedJoin]]
    * contract. */
  def saltIfSkewed(left: DataFrame, right: DataFrame, key: String,
      entropyCol: String, factor: Int,
      threshold: Double = 8.0): (DataFrame, Boolean) = {
    // boxed read: on an EMPTY left frame max_n/total aggregate to null, so
    // skew_factor is null — unboxing that straight to Double would NPE
    // instead of taking the plain-join arm (r13 ADVICE). Null = no rows =
    // no skew.
    val skewFactor = Profile.keySkewOf(left, key)
      .collect().headOption
      .flatMap(r => Option(r.getAs[java.lang.Double]("skew_factor")))
      .map(_.doubleValue).getOrElse(0.0)
    if (skewFactor >= threshold)
      (saltedJoin(left, right, key, entropyCol, factor), true)
    else (left.join(right, Seq(key)), false)
  }

  /** Two-phase (salted partial + final) aggregation for skewed group keys:
    * phase 1 aggregates (key, salt) — spreading a hot key across `factor`
    * tasks — phase 2 merges the partials per key. Only works for
    * decomposable aggregates; exposed for count/sum shapes. */
  def saltedCountSum(df: DataFrame, key: String, entropyCol: String,
      sumCol: String, factor: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(entropyCol)), lit(factor.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(sumCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as("total"))
}
