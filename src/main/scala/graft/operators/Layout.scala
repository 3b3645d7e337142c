package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.BitExpressions.interleave_bits

/** Z-order data layout: cluster a table on the Morton curve of two join/
  * filter dimensions before writing, so parquet min/max statistics prune
  * files for box predicates on EITHER dimension.
  *
  * Why a layout operator at all: partition pruning handles the partition
  * column, and a single-column sort gives tight file stats on that column
  * only — a 100 TB fact table queried by both (part, supplier) needs the
  * 2-D clustering or one of the two predicates always scans everything.
  * The curve key is computed by the codegen'd [[graft.functions.InterleaveBits]]
  * expression; the write is `repartitionByRange(z)` + in-partition sort, so
  * file k holds a contiguous z-range (range exchange samples the key — no
  * driver-side histogram needed).
  */
object Layout {

  /** 16-bit bucketized dimensions + the Morton key, per lineitem row — the
    * oracle recomputes z bit-by-bit in SQL, making the codegen'd expression
    * itself gate-checked. */
  def zorderValues(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      pmod(col("l_partkey"), lit(65536)).cast("int").as("pb"),
      pmod(col("l_suppkey"), lit(65536)).cast("int").as("sb"))
      .withColumn("z", interleave_bits(col("pb"), col("sb")))

  val zorderValuesSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(l_partkey % 65536 AS INT) AS pb,
      |  CAST(l_suppkey % 65536 AS INT) AS sb,
      |  CAST(list_sum(list_transform(range(0, 16), i ->
      |    (((CAST(l_partkey % 65536 AS BIGINT) >> i) & 1) << (2*i)) +
      |    (((CAST(l_suppkey % 65536 AS BIGINT) >> i) & 1) << (2*i + 1))))
      |    AS BIGINT) AS z
      |FROM lineitem""".stripMargin

  /** Write `df` clustered on the z-curve of (xCol, yCol) into `numFiles`
    * contiguous z-ranges.
    *
    * Each dimension is first normalized to `2^bits` equal-width buckets:
    * interleaving RAW values lets the wider-ranged column monopolize the
    * curve's high bits (a 4-bit column interleaved with a 20-bit one gets
    * no say in where files split), which is why production z-order
    * implementations bucketize per column before interleaving. Bucket
    * bounds come from one O(1) min/max scalar aggregate — the same
    * statistics a catalog would hold at 100 TB. */
  def zorderedWrite(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int, path: String, bits: Int = 8): Unit =
    zorderCluster(df, xCol, yCol, numFiles, bits)
      .write.mode("overwrite").parquet(path)

  /** The clustering transform alone: `df` redistributed into `numFiles`
    * contiguous z-ranges (range-partitioned + sorted on the Morton key,
    * key dropped). Returns `df` unchanged when empty/all-null clustering
    * columns leave nothing to cluster. Also the OPTIMIZE ZORDER path for
    * `serve/TxTable.compact`. */
  def zorderCluster(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int, bits: Int = 8): DataFrame = {
    val nb = 1 << bits
    val r = df.agg(min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).first()
    // empty input / all-null clustering column: there is nothing to
    // cluster — pass through instead of dying on a null min/max
    if (r.anyNull) return df
    def bucket(c: String, lo: Double, hi: Double) =
      least(width_bucket(col(c).cast("double"), lit(lo), lit(hi + 1.0), lit(nb)) - 1,
        lit(nb - 1)).cast("int")
    df.withColumn("__z", interleave_bits(
        bucket(xCol, r.getDouble(0), r.getDouble(1)),
        bucket(yCol, r.getDouble(2), r.getDouble(3))))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
