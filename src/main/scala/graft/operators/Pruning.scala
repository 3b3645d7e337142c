package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bloom-filter scan-side pruning for semi joins whose build side is too
  * big to broadcast as a hash table but small enough as a BITSET.
  *
  * The 100 TB problem: `fact LEFT SEMI JOIN keys` shuffles the ENTIRE fact
  * table when `keys` exceeds the broadcast threshold — even though only a
  * few percent of fact rows survive. A Bloom filter of the key set is ~100×
  * smaller than the hash relation (1.2 bytes/key at 1% FPP vs ~100 B/key),
  * so it broadcasts where the relation cannot; probing it in the scan stage
  * drops ~(1 − selectivity − fpp) of fact rows BEFORE the shuffle. The
  * exact semi join then runs on the prefiltered remainder and kills the
  * false positives, so the OUTPUT is exactly the semi join — the filter
  * only reshapes the plan. (Spark's AQE injects the same trick as "runtime
  * row-level filtering" when statistics allow; this operator is the
  * explicit form, and its output is oracle-checkable precisely because
  * correctness never depends on the filter.)
  *
  * The probe is the internal `BloomFilterMightContain` expression reached
  * through GraftBridge (r19; guide §4 — expressions over opaque closures):
  * Spark exposes no public might_contain, and the prior Scala-UDF probe
  * paid a serde boundary per fact row AND broke whole-stage codegen at the
  * scan filter. The expression deserializes the same
  * `org.apache.spark.util.sketch.BloomFilter` the builder wrote and makes
  * the same `mightContainLong` decision, inside codegen, with the filter
  * bytes riding the plan as a literal (1.2 B/key at 1% FPP — KB-scale).
  */
object Pruning {

  /** Line items of high-value orders (semi join via bloom prefilter +
    * exact verify), aggregated per order. */
  def bloomSemiJoin(spark: SparkSession, dir: String,
      minTotal: Double = 150000.0, fpp: Double = 0.01): DataFrame = {
    // cached: the key set feeds three consumers (sizing count, bloom
    // aggregation, semi-join build) — without it orders is scanned thrice
    val hot = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > minTotal)
      .select("o_orderkey")
      .cache()
    // sizing from the UNFILTERED table's footer count (a metadata-only
    // job) instead of counting the filtered key set (a full scan action
    // per call, r19) — at scale this comes from table statistics, and an
    // overestimate only widens the bitset: the exact semi join makes the
    // OUTPUT independent of the filter's sizing by construction
    val nKeys = math.max(Tables.orders(spark, dir).count(), 1L)
    val bf = hot.stat.bloomFilter("o_orderkey", nKeys, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val probe = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          bos.toByteArray, org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.GraftBridge.expression(col("l_orderkey"))))
    Tables.lineitem(spark, dir)
      .filter(probe)
      .join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
  }

  def bloomSemiJoinSql(minTotal: Double = 150000.0): String =
    s"""SELECT l_orderkey,
       |  CAST(COUNT(*) AS BIGINT) AS n_lines,
       |  ROUND(SUM(l_quantity), 2) AS sum_qty
       |FROM lineitem
       |WHERE l_orderkey IN
       |  (SELECT o_orderkey FROM orders WHERE o_totalprice > $minTotal)
       |GROUP BY 1""".stripMargin
}
