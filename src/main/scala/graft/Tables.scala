package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * Parquet carries its own authoritative schema in the footer, so unlike the
  * reference's JSON raw layer (schema inference + re-cast,
  * `scripts/formatting/format_to_parquet.py:65-75`) no cast step is needed
  * here. Column pruning is left to call sites + Catalyst so the parquet scan
  * only reads what each query projects.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Spread a small-file input across the cluster before per-row-expensive
    * work. The small tables here are single parquet files with ONE row
    * group, so Spark plans ONE task — every downstream lambda/UDF/kernel
    * runs single-threaded until the first shuffle (neither AQE nor
    * maxPartitionBytes can split inside a row group). One tiny round-robin
    * shuffle buys full parallelism. At lake scale inputs arrive multi-file
    * and this is a no-op decision, but the principle (right-size INPUT
    * partitions to the compute, not just shuffle partitions) stands. */
  def spread(spark: SparkSession, df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)

  def region(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "lineitem")
  /** `events.ts` is physically INT64 TIMESTAMP(NANOS) which Spark 4 refuses
    * to read as a timestamp. Read it as a raw long (legacy conf) and convert
    * ns → µs with integer division (`div`, not `/`: double division would
    * lose precision on ~1.7e18 ns epoch values) into a real TimestampType. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
