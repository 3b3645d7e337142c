package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Second batch of SURVEY §2 operator shapes with DuckDB oracles. */
object MoreQueries {

  // ---------------------------------------------------------------- A-battery
  /** Multi-aggregate pricing summary (the canonical wide agg battery —
    * sum/avg/count over grouped measures; A1/A5 shape at full width). */
  def aggBattery(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val aggBatterySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  ROUND(SUM(l_quantity), 4) AS sum_qty,
      |  ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
      |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
      |  ROUND(AVG(l_quantity), 4) AS avg_qty,
      |  ROUND(AVG(l_extendedprice), 4) AS avg_price,
      |  ROUND(AVG(l_discount), 4) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- O3 nested
  /** [Lens] nested terms (the sector→symbol treemap,
    * `kibana/kibana_saved_objects.ndjson:9`): outer terms on region, inner
    * top-3 nations per region by member count. */
  def nestedTerms(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 4).as("total_bal"))
    val w = Window.partitionBy("r_name")
      .orderBy(col("n_customers").desc, col("n_name").asc)
    counts
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("r_name", "n_name", "n_customers", "total_bal", "rk")
  }

  val nestedTermsSql: String =
    """WITH counts AS (
      |  SELECT r.r_name AS r_name, n.n_name AS n_name,
      |         COUNT(*) AS n_customers, ROUND(SUM(c.c_acctbal), 4) AS total_bal
      |  FROM customer c
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  GROUP BY 1, 2)
      |SELECT r_name, n_name, n_customers, total_bal, rk
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY r_name
      |        ORDER BY n_customers DESC, n_name ASC) AS rk FROM counts)
      |WHERE rk <= 3""".stripMargin

  // ---------------------------------------------------------------- joins
  /** Semi/anti join pair (EXISTS / NOT EXISTS): per-region counts of
    * customers with vs without orders. */
  def semiAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val orderKeys = Tables.orders(spark, dir).select("o_custkey")
    val withO = cust.join(orderKeys, cust("c_custkey") === orderKeys("o_custkey"), "left_semi")
      .groupBy("c_nationkey").agg(count(lit(1)).as("with_orders"))
    val withoutO = cust.join(orderKeys, cust("c_custkey") === orderKeys("o_custkey"), "left_anti")
      .groupBy("c_nationkey").agg(count(lit(1)).as("without_orders"))
    withO.join(withoutO, Seq("c_nationkey"), "full_outer")
      .select(col("c_nationkey"),
        coalesce(col("with_orders"), lit(0L)).as("with_orders"),
        coalesce(col("without_orders"), lit(0L)).as("without_orders"))
  }

  val semiAntiJoinSql: String =
    """WITH w AS (
      |  SELECT c_nationkey, COUNT(*) AS with_orders FROM customer c
      |  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |  GROUP BY 1),
      |wo AS (
      |  SELECT c_nationkey, COUNT(*) AS without_orders FROM customer c
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |  GROUP BY 1)
      |SELECT COALESCE(w.c_nationkey, wo.c_nationkey) AS c_nationkey,
      |       COALESCE(w.with_orders, 0) AS with_orders,
      |       COALESCE(wo.without_orders, 0) AS without_orders
      |FROM w FULL OUTER JOIN wo ON w.c_nationkey = wo.c_nationkey""".stripMargin

  // ---------------------------------------------------------------- A3
  /** Scalar mean over a trailing window of the data (mean of last-30-days
    * sentiment, `scripts/prediction/arima_forecast.py:61-63`): average value
    * over the final 7 days of the event stream, per type. */
  def recentWindowAvg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cutoff = ev.agg((max("ts") - expr("interval 7 days")).as("cut"))
    ev.crossJoin(broadcast(cutoff))
      .filter(col("ts") >= col("cut"))
      .groupBy("event_type")
      .agg(round(avg("value"), 6).as("recent_avg"), count(lit(1)).as("n_recent"))
  }

  val recentWindowAvgSql: String =
    """SELECT event_type, ROUND(AVG(value), 6) AS recent_avg,
      |       COUNT(*) AS n_recent
      |FROM events
      |WHERE ts >= (SELECT MAX(ts) - INTERVAL 7 DAY FROM events)
      |GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- F6
  /** Month-range generation (the Finnhub 12-month pagination walk,
    * `scripts/ingestion/finnhub_news.py:139-158`): first-of-month anchors
    * with [start, end) day bounds for the 12 months before an anchor date. */
  def monthRanges(spark: SparkSession, dir: String): DataFrame =
    spark.range(1)
      .select(explode(sequence(lit(0), lit(11))).as("back"))
      .withColumn("month_start",
        add_months(trunc(lit("2024-04-15").cast("date"), "month"), -col("back").cast("int")))
      .withColumn("month_end", add_months(col("month_start"), 1))
      .select(
        col("back").cast("int").as("months_back"),
        date_format(col("month_start"), "yyyy-MM-dd").as("from_date"),
        date_format(date_sub(col("month_end"), 1), "yyyy-MM-dd").as("to_date"))

  val monthRangesSql: String =
    """SELECT CAST(back AS INT) AS months_back,
      |       strftime(month_start, '%Y-%m-%d') AS from_date,
      |       strftime(month_start + INTERVAL 1 MONTH - INTERVAL 1 DAY, '%Y-%m-%d') AS to_date
      |FROM (SELECT UNNEST(generate_series(0, 11)) AS back,
      |             date_trunc('month', DATE '2024-04-15')
      |               - to_months(CAST(UNNEST(generate_series(0, 11)) AS INT)) AS month_start)""".stripMargin

  // ---------------------------------------------------------------- W5 ranked
  /** Top-3 orders by totalprice within each priority (rank-within-group —
    * the Top/Flop ranking generalized past k=1). */
  def rankedWithinGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
  }

  val rankedWithinGroupSql: String =
    """SELECT o_orderpriority, rk, o_orderkey, o_totalprice
      |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
      |             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      |      FROM orders)
      |WHERE rk <= 3""".stripMargin

  // ---------------------------------------------------------------- P7+F12
  /** Exists predicate + null-fill battery: events joined to the per-user
    * value sum of a SUBSET (purchases), nulls coalesced to 0 (F12) — the
    * "symbol with zero articles" null path. */
  def existsNullFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(round(sum("value"), 6).as("purchase_total"))
    ev.select("user_id").distinct()
      .join(purchases, Seq("user_id"), "left")
      .select(col("user_id"),
        coalesce(col("purchase_total"), lit(0.0)).as("purchase_total"),
        col("purchase_total").isNotNull.as("has_purchases"))
  }

  val existsNullFillSql: String =
    """WITH p AS (
      |  SELECT user_id, ROUND(SUM(value), 6) AS purchase_total
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT u.user_id AS user_id,
      |       COALESCE(p.purchase_total, 0.0) AS purchase_total,
      |       p.purchase_total IS NOT NULL AS has_purchases
      |FROM (SELECT DISTINCT user_id FROM events) u
      |LEFT JOIN p ON u.user_id = p.user_id""".stripMargin

  // ---------------------------------------------------------------- multi-join
  /** Deep join tree: revenue per nation (lineitem⋈orders⋈customer⋈nation⋈
    * region + filtered year + grouped sum). Exercises Catalyst join
    * ordering: small dims broadcast, the two fact joins hash-partition on
    * their keys. */
  def revenuePerNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val revenuePerNationSql: String =
    """SELECT r.r_name AS r_name, n.n_name AS n_name,
      |  ROUND(SUM(l.l_extendedprice * (1.0 - l.l_discount)), 4) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- quantiles
  /** Percentile battery: exact continuous-interpolation percentiles per
    * group (Spark `percentile` ≡ DuckDB `quantile_cont`). The
    * t-digest/GK-sketch twin for the 100 TB path is
    * `percentileApproxQuery` (rows-only — approximate by design). */
  def percentilesQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))

  val percentilesQuerySql: String =
    """SELECT event_type,
      |  ROUND(quantile_cont(value, 0.5), 6) AS p50,
      |  ROUND(quantile_cont(value, 0.9), 6) AS p90,
      |  ROUND(quantile_cont(value, 0.99), 6) AS p99
      |FROM events GROUP BY event_type""".stripMargin

  /** Sketch-based percentiles (approx_percentile, fixed-size mergeable
    * state) — what actually runs at 100 TB; exactness asserted within
    * tolerance in tests instead of the oracle. */
  def percentileApproxQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        expr("approx_percentile(value, 0.5, 1000)").as("p50_approx"),
        expr("approx_percentile(value, 0.9, 1000)").as("p90_approx"))

  // ---------------------------------------------------------------- rollup
  /** Hierarchical subtotals via ROLLUP — (flag, status), (flag), and grand
    * total in one pass. Rolled-up group columns are rendered through
    * coalesce to a sentinel so the null-vs-'ALL' representation is identical
    * on both engines; grouping_id disambiguates a real NULL key from a
    * rolled-up one. */
  def rollupBattery(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("sum_qty"),
        grouping_id().cast("int").as("gid"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"), col("gid"))

  val rollupBatterySql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |       COALESCE(l_linestatus, 'ALL') AS linestatus,
      |       COUNT(*) AS n,
      |       ROUND(SUM(l_quantity), 4) AS sum_qty,
      |       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** CUBE over (returnflag, linestatus): all four grouping combinations in
    * one pass — completes the grouping-set family next to ROLLUP. */
  def cubeBattery(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("sum_qty"),
        grouping_id().cast("int").as("gid"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"), col("gid"))

  val cubeBatterySql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |       COALESCE(l_linestatus, 'ALL') AS linestatus,
      |       COUNT(*) AS n,
      |       ROUND(SUM(l_quantity), 4) AS sum_qty,
      |       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  // ---------------------------------------------------------------- pivot
  /** Pivot as conditional aggregation (event types → columns): the portable
    * formulation of `groupBy(day).pivot(event_type)` — fixed column set, so
    * the schema is static and the oracle trivial. */
  def pivotDaily(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    val aggs = types.map(t =>
      round(sum(when(col("event_type") === t, col("value")).otherwise(0.0)), 6).as(s"v_$t"))
    Tables.events(spark, dir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(aggs.head, aggs.tail: _*)
  }

  val pivotDailySql: String =
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |  ROUND(SUM(CASE WHEN event_type = 'click' THEN value ELSE 0.0 END), 6) AS v_click,
      |  ROUND(SUM(CASE WHEN event_type = 'view' THEN value ELSE 0.0 END), 6) AS v_view,
      |  ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 6) AS v_purchase,
      |  ROUND(SUM(CASE WHEN event_type = 'signup' THEN value ELSE 0.0 END), 6) AS v_signup,
      |  ROUND(SUM(CASE WHEN event_type = 'error' THEN value ELSE 0.0 END), 6) AS v_error
      |FROM events GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- SQL API
  /** The same engine through the SQL front-end: temp views + `spark.sql`,
    * including the registered native `cosine_sim` function. Demonstrates
    * that every relational operator here is reachable from plain SQL — the
    * front-end a reference user would migrate dashboards to. */
  def sqlApiQuery(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    Tables.lineitem(spark, dir).createOrReplaceTempView("v_lineitem")
    Tables.orders(spark, dir).createOrReplaceTempView("v_orders")
    // colinear_check exercises the REGISTERED native expression through the
    // SQL text itself; the oracle pins its value (colinear vectors → 1.0)
    spark.sql(
      """SELECT o.o_orderpriority AS priority,
        |       COUNT(*) AS n_orders,
        |       ROUND(AVG(o.o_totalprice), 4) AS avg_price,
        |       ROUND(SUM(li.net), 4) AS net_revenue,
        |       ROUND(cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d)), 6) AS colinear_check
        |FROM v_orders o
        |JOIN (SELECT l_orderkey,
        |             SUM(l_extendedprice * (1.0 - l_discount)) AS net
        |      FROM v_lineitem GROUP BY l_orderkey) li
        |  ON o.o_orderkey = li.l_orderkey
        |GROUP BY o.o_orderpriority""".stripMargin)
  }

  val sqlApiQuerySql: String =
    """SELECT o.o_orderpriority AS priority,
      |       COUNT(*) AS n_orders,
      |       ROUND(AVG(o.o_totalprice), 4) AS avg_price,
      |       ROUND(SUM(li.net), 4) AS net_revenue,
      |       1.0 AS colinear_check
      |FROM orders o
      |JOIN (SELECT l_orderkey,
      |             SUM(l_extendedprice * (1.0 - l_discount)) AS net
      |      FROM lineitem GROUP BY l_orderkey) li
      |  ON o.o_orderkey = li.l_orderkey
      |GROUP BY o.o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- F4
  /** Unix-seconds round-trip (F4, `finnhub_news.py:91-92`): ts → epoch
    * seconds → rebuilt timestamp string. */
  def unixRoundtrip(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        unix_timestamp(col("ts")).as("epoch_s"),
        date_format(timestamp_seconds(unix_timestamp(col("ts"))), "yyyy-MM-dd HH:mm:ss")
          .as("rebuilt_ts"))

  val unixRoundtripSql: String =
    """SELECT event_id,
      |       CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s,
      |       strftime(to_timestamp(FLOOR(epoch(ts))), '%Y-%m-%d %H:%M:%S') AS rebuilt_ts
      |FROM events""".stripMargin

  // ------------------------------------------------------- ship priority
  /** The TPC-H Q3 shape — segment-filtered customers x open orders x
    * shipped-late lineitems, top-10 orders by revenue: a selective dim
    * filter that BROADCASTS into the fact join, one grouped sum, and a
    * TakeOrderedAndProject top-k (never a global sort). The classic
    * "does the optimizer push the segment filter below the join" probe
    * next to the Q5-shaped `revenuePerNation`. */
  def shipPriority(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1997-06-01").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cut)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey").as("orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority").as("priority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 6)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("orderkey"))
      .limit(10)
      .select("orderkey", "revenue", "orderdate", "priority")
  }

  val shipPrioritySql: String =
    """SELECT l.l_orderkey AS orderkey,
      |  ROUND(SUM(l.l_extendedprice * (1.0 - l.l_discount)), 6) AS revenue,
      |  strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
      |  o.o_orderpriority AS priority
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      |  AND l.l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
      |GROUP BY 1, 3, 4
      |ORDER BY revenue DESC, orderkey LIMIT 10""".stripMargin
}
