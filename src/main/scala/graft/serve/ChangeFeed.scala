package graft.serve

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.SessionMemo

/** Registered-query surface for the TxTable change feed
  * ([[TxTable.changes]]): a deterministic two-commit table built from the
  * `orders` testdata, whose (0 → 1] feed is exactly computable from the
  * source parquet — which is what upgrades a table-format feature (CDC)
  * to a fully hash-oracled query:
  *
  *  - v0 (merge): orders with `o_orderkey % 3 ≠ 0`, payload = raw
  *    `o_totalprice` (exact doubles, no rounding anywhere);
  *  - v1 (merge): every even o_orderkey, payload = `o_totalprice + 1.0`
  *    (IEEE-exact on both engines).
  *
  * Feed (0, 1] therefore contains: `insert` for even keys divisible by 3
  * (not in v0), an `update_preimage`/`update_postimage` pair for the
  * remaining even keys (payload always differs by exactly 1.0), and — the
  * suppression the operator exists for — NOTHING for the odd carried rows
  * a merge rewrites into new files unchanged. */
object ChangeFeed {

  private val cdcMemo = new SessionMemo[String, String]

  /** Build the two-commit fixture table once per (session, sf dir) —
    * rebuilt from scratch each session so the version numbers the feed
    * addresses are deterministic — and return its (0, 1] change feed. */
  def tableChangesQuery(spark: SparkSession, dir: String): DataFrame = {
    val path = cdcMemo.getOrElseUpdate(spark, dir) {
      val p = s"/tmp/graft_cdc/${new java.io.File(dir).getName}"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(p), spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(p), true)
      val orders = Tables.orders(spark, dir)
      val base = orders.filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_totalprice").as("price"))
      val upd = orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") + 1.0).as("price"))
      TxTable.merge(spark, base, p, Seq("o_orderkey"))
      TxTable.merge(spark, upd, p, Seq("o_orderkey"))
      p
    }
    TxTable.changes(spark, path, 0L, 1L, Seq("o_orderkey"))
  }

  /** DuckDB oracle: the expected feed recomputed straight from `orders`. */
  val tableChangesSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_totalprice AS price FROM orders
      |  WHERE o_orderkey % 3 <> 0),
      |upd AS (
      |  SELECT o_orderkey, o_totalprice + 1.0 AS price FROM orders
      |  WHERE o_orderkey % 2 = 0)
      |SELECT 'insert' AS change_type, CAST(1 AS INT) AS commit_version,
      |       o_orderkey, price
      |FROM upd WHERE o_orderkey % 3 = 0
      |UNION ALL
      |SELECT 'update_preimage', CAST(1 AS INT), o_orderkey, price
      |FROM base WHERE o_orderkey % 2 = 0
      |UNION ALL
      |SELECT 'update_postimage', CAST(1 AS INT), o_orderkey, price
      |FROM upd WHERE o_orderkey % 3 <> 0""".stripMargin
}
