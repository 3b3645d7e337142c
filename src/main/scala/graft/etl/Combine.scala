package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The flagship Gold-layer query — the reference's `combine_data` stage
  * re-expressed on the testdata star schema.
  *
  * Reference shape (`scripts/combination/combine_sources.py:45-131`):
  * fact table LEFT JOIN narrow dim (broadcast) LEFT JOIN per-key aggregate
  * of an event table, plus derived arithmetic columns and a final narrow
  * projection. Here: `orders` plays `stocks` (the fact), `customer` plays
  * `company_info` (the dim, `combine_sources.py:80-84`), and a
  * groupBy-aggregate of `lineitem` plays the per-symbol news aggregate
  * (`combine_sources.py:71-77,87-91`).
  *
  * Scale notes (100 TB design):
  *  - The dim side is explicitly `broadcast()` — company_info-like tables
  *    are always small relative to the fact; never shuffle the fact for it.
  *  - The fact⋈agg join keys both sides on `o_orderkey`/`l_orderkey`; at
  *    scale both tables should be bucketed/partitioned on orderkey so this
  *    becomes a co-located join. Locally AQE picks the strategy.
  *  - Derived columns are pure column arithmetic → whole-stage codegen.
  */
object Combine {

  def enrichedOrders(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)

    // P2 narrow dim select before the join (combine_sources.py:81)
    val dim = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")

    // A1: per-key multi-aggregate (combine_sources.py:71-77)
    val itemAgg = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(
        count(lit(1)).as("item_count"),
        max("l_shipdate").as("latest_ship"),
        sum("l_quantity").as("sum_qty"))

    orders
      // J1: fact ⋈ dim, left, broadcast (combine_sources.py:80-84)
      .join(broadcast(dim), orders("o_custkey") === dim("c_custkey"), "left")
      // J2: fact ⋈ agg, left (combine_sources.py:87-91)
      .join(itemAgg, orders("o_orderkey") === itemAgg("l_orderkey"), "left")
      // F8: derived arithmetic (daily_range / daily_change_pct analogues,
      // combine_sources.py:94-98); nullif-guarded division (SURVEY §7.4.5)
      .withColumn("avg_item_price",
        round(col("o_totalprice") / nullif(col("item_count").cast("double"), lit(0.0)), 6))
      .withColumn("order_date", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .withColumn("latest_ship_date", date_format(col("latest_ship"), "yyyy-MM-dd"))
      .withColumn("sum_qty", round(col("sum_qty"), 6))
      // final narrow projection (combine_sources.py:101-118)
      .select(
        col("o_orderkey"), col("o_orderstatus"), col("order_date"),
        col("o_totalprice"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal"), col("item_count"), col("latest_ship_date"),
        col("sum_qty"), col("avg_item_price"))
  }

  val enrichedOrdersSql: String =
    """SELECT o.o_orderkey AS o_orderkey,
      |       o.o_orderstatus AS o_orderstatus,
      |       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
      |       o.o_totalprice AS o_totalprice,
      |       c.c_name AS c_name,
      |       c.c_mktsegment AS c_mktsegment,
      |       c.c_acctbal AS c_acctbal,
      |       li.item_count AS item_count,
      |       strftime(li.latest_ship, '%Y-%m-%d') AS latest_ship_date,
      |       ROUND(li.sum_qty, 6) AS sum_qty,
      |       ROUND(o.o_totalprice / NULLIF(CAST(li.item_count AS DOUBLE), 0.0), 6) AS avg_item_price
      |FROM orders o
      |LEFT JOIN (SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer) c
      |       ON o.o_custkey = c.c_custkey
      |LEFT JOIN (SELECT l_orderkey,
      |                  COUNT(*) AS item_count,
      |                  MAX(l_shipdate) AS latest_ship,
      |                  SUM(l_quantity) AS sum_qty
      |           FROM lineitem GROUP BY 1) li
      |       ON o.o_orderkey = li.l_orderkey""".stripMargin
}
