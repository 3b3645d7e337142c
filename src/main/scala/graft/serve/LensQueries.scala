package graft.serve

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The reference's interactive query surface — the Kibana Lens aggregation
  * specs (`kibana/kibana_saved_objects.ndjson`, `kibana/export (1).ndjson`) —
  * re-expressed as parameterized DataFrame queries over the testdata tables
  * (SURVEY §2.2–§2.8, rows marked [Lens]).
  *
  * Every query here is declarative DataFrame code: Catalyst prunes columns
  * into the parquet scan, pushes filters, and picks join strategies; all
  * expressions stay inside whole-stage codegen (no UDFs on these paths).
  */
object LensQueries {

  // ---------------------------------------------------------------- A1
  /** Hash group-by with multiple aggregates (count + max + avg), the
    * news-per-symbol aggregate (`scripts/combination/combine_sources.py:71-77`).
    * Map-side partial aggregation makes this one shuffle of 5 groups. */
  def aggMulti(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("latest_ts"),
        round(avg("value"), 6).as("avg_value"))

  val aggMultiSql: String =
    """SELECT event_type,
      |       COUNT(*) AS n_events,
      |       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS latest_ts,
      |       ROUND(AVG(value), 6) AS avg_value
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- W1+A5
  /** [Lens] date_histogram with 1d buckets + average metric
    * (`kibana/export (1).ndjson:4`, panels "Tendance du cours…"). */
  def dateHistogramAvg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(round(avg("value"), 6).as("avg_value"), count(lit(1)).as("n"))

  val dateHistogramAvgSql: String =
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |       event_type,
      |       ROUND(AVG(value), 6) AS avg_value,
      |       COUNT(*) AS n
      |FROM events GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- W1 auto
  /** [Lens] `interval: auto` date_histogram (`kibana/export (1).ndjson:4`):
    * Lens sizes the bucket unit to the queried time range so the chart stays
    * near ~30–45 bars. Deterministic rule on the requested span (no
    * data-dependent driver action): ≤45 days → day, ≤315 days → week
    * (≈45 weekly bars), else month. */
  def autoInterval(from: java.time.LocalDate, to: java.time.LocalDate): String = {
    val days = java.time.temporal.ChronoUnit.DAYS.between(from, to)
    if (days <= 45) "day" else if (days <= 315) "week" else "month"
  }

  /** One auto-interval histogram regime over `orders` (timestamp fact with a
    * multi-year span — the only testdata table wide enough to exercise all
    * three units). Filter pushes to the scan; one partial+final agg. */
  def dateHistogramAutoRegime(spark: SparkSession, dir: String,
      regime: String, from: String, to: String): DataFrame = {
    val unit = autoInterval(java.time.LocalDate.parse(from), java.time.LocalDate.parse(to))
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit(from))
        && col("o_orderdate") < to_timestamp(lit(to)))
      .groupBy(date_format(date_trunc(unit, col("o_orderdate")), "yyyy-MM-dd").as("bucket"))
      .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 6).as("avg_price"))
      .select(lit(regime).as("regime"), lit(unit).as("bucket_unit"),
        col("bucket"), col("n"), col("avg_price"))
  }

  /** Fixed date ranges so the chosen unit is SF-independent. */
  val autoRegimes: Seq[(String, String, String)] = Seq(
    ("r_month_span", "1995-03-01", "1995-04-01"), // 31 d  -> day
    ("r_summer",     "1995-01-01", "1995-09-01"), // 243 d -> week
    ("r_all_years",  "1995-01-01", "2001-09-01")) // ~6.7 y -> month

  /** Registered query: all three regimes unioned, proving the picker crosses
    * every unit boundary under one oracle. */
  def dateHistogramAuto(spark: SparkSession, dir: String): DataFrame =
    autoRegimes.map { case (r, f, t) => dateHistogramAutoRegime(spark, dir, r, f, t) }
      .reduce(_ unionByName _)

  val dateHistogramAutoSql: String =
    autoRegimes.map { case (r, f, t) =>
      val unit = autoInterval(java.time.LocalDate.parse(f), java.time.LocalDate.parse(t))
      s"""SELECT '$r' AS regime, '$unit' AS bucket_unit,
         |  strftime(date_trunc('$unit', o_orderdate), '%Y-%m-%d') AS bucket,
         |  COUNT(*) AS n, ROUND(AVG(o_totalprice), 6) AS avg_price
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '$f' AND o_orderdate < TIMESTAMP '$t'
         |GROUP BY 3""".stripMargin
    }.mkString("\nUNION ALL\n")

  // ---------------------------------------------------------------- A6
  /** [Lens] count-of-records by label — the sentiment-distribution donut
    * (`kibana/kibana_saved_objects.ndjson:8`). */
  def countByLabel(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).groupBy("event_type").agg(count(lit(1)).as("n"))

  val countByLabelSql: String =
    "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type"

  // ---------------------------------------------------------------- A7
  /** [Lens] min aggregate per group (`kibana/export (1).ndjson:4`,
    * panel "Actualité du cours"). */
  def minByGroup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
        min("value").as("min_value"))

  val minByGroupSql: String =
    """SELECT event_type,
      |       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
      |       MIN(value) AS min_value
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- A8
  /** MEMOIZED per-ingest distinct-count stats over events (r16, closing
    * the r15 verdict's q_cardinality_bounds first-touch spike): the
    * 5-row-per-frame aggregates that FOUR registered consumers join
    * (q_cardinality, q_cardinality_approx, q_cardinality_hll,
    * q_cardinality_bounds) — warm-up policy (a): in production this is
    * ONE stats table materialized per ingest, not a fresh full scan per
    * dashboard panel. Two passes, not one or three: the exact side's
    * countDistinct plans through an Expand, and dragging an imperative
    * sketch through that path demotes the whole aggregate to
    * SortAggregate over the expanded stream (the r13 measurement in
    * `Invariants.cardinalityBounds` — 7 s vs 2 s at sf0.1); the two
    * sketches share ONE ObjectHashAggregate pass (no Expand there). */
  private val cardStatsMemo = new graft.operators.SessionMemo[(String, String), DataFrame]

  /** (event_type, unique_users) — the exact side, HashAggregate+Expand. */
  private[graft] def exactDistinctStats(spark: SparkSession, dir: String): DataFrame =
    cardStatsMemo.getOrElseUpdate(spark, (dir, "exact")) {
      Tables.events(spark, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("unique_users"))
        .cache()
    }

  /** (event_type, approx_unique_users, hll_unique_users) — BOTH sketches
    * in one ObjectHashAggregate pass (Spark's HLL++ and graft's own
    * TypedImperativeAggregate HLL). */
  private[graft] def sketchDistinctStats(spark: SparkSession, dir: String): DataFrame =
    cardStatsMemo.getOrElseUpdate(spark, (dir, "sketch")) {
      Tables.events(spark, dir)
        .groupBy("event_type")
        .agg(
          approx_count_distinct(col("user_id"), 0.01).as("approx_unique_users"),
          graft.functions.HllAggregate.hll_distinct(col("user_id"))
            .as("hll_unique_users"))
        .cache()
    }

  /** [Lens] unique_count (cardinality) — "Buzz médiatique" distinct titles
    * per bucket (`kibana/export (1).ndjson:4`). Exact count(distinct) so the
    * oracle matches; the HLL-approximate twin (as ES actually computes it)
    * is `cardinalityApprox` below. */
  def cardinality(spark: SparkSession, dir: String): DataFrame =
    exactDistinctStats(spark, dir)

  val cardinalitySql: String =
    "SELECT event_type, COUNT(DISTINCT user_id) AS unique_users FROM events GROUP BY event_type"

  /** HLL-approximate cardinality — the scale path (ES `cardinality` agg is
    * HLL too). No oracle (approximate by design); spec asserts error bound. */
  def cardinalityApprox(spark: SparkSession, dir: String): DataFrame =
    sketchDistinctStats(spark, dir)
      .select(col("event_type"), col("approx_unique_users"))

  /** The REGISTERED approx-cardinality form (r15): the exact distinct
    * count (SQL-re-derivable) next to the HLL++ sketch's 3σ certification
    * — the `q_cardinality_bounds` flag computed genuinely from
    * `approx_count_distinct`, upgrading q_cardinality_approx from
    * rows-only to hash-oracled with the sketch still in the loop (an
    * estimate drifting past 3σ flips the flag → hash mismatch). Two
    * single-pass aggregates joined on the 5-row result, NOT one combined
    * pass: countDistinct plans through an Expand, and the r13 measurement
    * in `Invariants.cardinalityBounds` showed dragging a second aggregate
    * through that path demotes the whole thing to SortAggregate. The raw
    * estimates stay visible via [[cardinalityApprox]] (HllSpec-pinned). */
  def cardinalityApproxVerified(spark: SparkSession, dir: String): DataFrame =
    exactDistinctStats(spark, dir).join(sketchDistinctStats(spark, dir), "event_type")
      .select(col("event_type"), col("unique_users"),
        (abs(col("approx_unique_users") - col("unique_users")) <=
          greatest(lit(1.0), lit(0.03) * col("unique_users")))
          .as("approx_within_3sigma"))

  val cardinalityApproxVerifiedSql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS unique_users,
      |  true AS approx_within_3sigma
      |FROM events GROUP BY event_type""".stripMargin

  /** Custom mergeable-HLL twin of [[cardinalityApprox]] (the §4
    * TypedImperativeAggregate): same query shape, graft's own sketch. No
    * oracle (approximate by design); HllSpec pins the error bound. */
  def cardinalityHll(spark: SparkSession, dir: String): DataFrame =
    sketchDistinctStats(spark, dir)
      .select(col("event_type"), col("hll_unique_users"))

  /** The REGISTERED graft-HLL form (r15): [[cardinalityApprox Verified]]'s
    * pattern applied to graft's OWN TypedImperativeAggregate sketch — the
    * exact distinct count next to the sketch's genuinely-computed 3σ
    * certification (p=12 ⇒ σ ≈ 1.04/√4096 ≈ 1.6%, 3σ ≈ 5%, ±1 slack for
    * tiny groups — the `Invariants.cardinalityBounds` bound). Two
    * single-pass aggregates joined on the 5-row result (the Expand
    * demotion note on [[cardinalityApproxVerified]]); raw estimates stay
    * visible via [[cardinalityHll]], HllSpec-pinned. */
  def cardinalityHllVerified(spark: SparkSession, dir: String): DataFrame =
    exactDistinctStats(spark, dir).join(sketchDistinctStats(spark, dir), "event_type")
      .select(col("event_type"), col("unique_users"),
        (abs(col("hll_unique_users") - col("unique_users")) <=
          greatest(lit(1.0), lit(0.05) * col("unique_users")))
          .as("hll_within_3sigma"))

  val cardinalityHllVerifiedSql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS unique_users,
      |  true AS hll_within_3sigma
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- J1
  /** Left equi-join chain fact⋈dim⋈dim, dims broadcast
    * (`scripts/combination/combine_sources.py:80-84`). */
  def joinDims(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    cust
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"), "left")
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name").as("nation_name"), col("r_name").as("region_name"))
  }

  val joinDimsSql: String =
    """SELECT c.c_custkey AS c_custkey, c.c_name AS c_name, c.c_acctbal AS c_acctbal,
      |       n.n_name AS nation_name, r.r_name AS region_name
      |FROM customer c
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey""".stripMargin

  // ---------------------------------------------------------------- J2
  /** Left join fact ⋈ pre-aggregated side (news_agg analogue,
    * `scripts/combination/combine_sources.py:87-91`). */
  def joinFactAgg(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_name", "s_acctbal")
    val agg = Tables.lineitem(spark, dir)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_items"), round(sum("l_quantity"), 6).as("total_qty"))
    supp.join(agg, supp("s_suppkey") === agg("l_suppkey"), "left")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_items"), col("total_qty"))
  }

  val joinFactAggSql: String =
    """SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, s.s_acctbal AS s_acctbal,
      |       a.n_items AS n_items, a.total_qty AS total_qty
      |FROM supplier s
      |LEFT JOIN (SELECT l_suppkey, COUNT(*) AS n_items,
      |                  ROUND(SUM(l_quantity), 6) AS total_qty
      |           FROM lineitem GROUP BY 1) a
      |  ON s.s_suppkey = a.l_suppkey""".stripMargin

  // ---------------------------------------------------------------- P2+P3+P6
  /** Range predicate + narrow projection — the single-day/range filter panels
    * (`kibana/export (1).ndjson:4`) and the ≥2020 news filter
    * (`scripts/formatting/format_to_parquet.py:141`). Both the filter and the
    * 4-column projection reach the parquet scan (PushedFilters/ReadSchema). */
  def filterRangeProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-07-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))

  val filterRangeProjectSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |       strftime(l_shipdate, '%Y-%m-%d') AS ship_date
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'""".stripMargin

  // ---------------------------------------------------------------- A9
  /** [Lens] last_value / top-hit-by-date per group
    * (`kibana/kibana_saved_objects.ndjson:6`): latest event per user.
    * row_number over (ts desc) with an id tiebreak — deterministic, and it
    * skips nothing silently (ES top-hit null semantics handled by the
    * isNotNull filter, SURVEY §7.4.2). */
  def lastValuePerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("value").as("last_value"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
  }

  val lastValuePerKeySql: String =
    """SELECT user_id, value AS last_value,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
      |FROM (SELECT user_id, value, ts,
      |             ROW_NUMBER() OVER (PARTITION BY user_id
      |                                ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events WHERE value IS NOT NULL)
      |WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- O3+W5
  /** [Lens] terms top-k ordered by metric — Top/Flop table
    * (`kibana/kibana_saved_objects.ndjson:6`): top 10 users by total value.
    * TakeOrderedAndProject physical op — no global sort of the full set. */
  def topKByMetric(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(round(sum("value"), 6).as("total_value"))
      .orderBy(col("total_value").desc_nulls_last, col("user_id").asc)
      .limit(10)

  val topKByMetricSql: String =
    """SELECT user_id, ROUND(SUM(value), 6) AS total_value
      |FROM events GROUP BY user_id
      |ORDER BY total_value DESC NULLS LAST, user_id ASC
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- O3
  /** [Lens] terms agg with otherBucket=true (`kibana/kibana_saved_objects
    * .ndjson:9`, sector treemap): top-3 event types + an "Other" row
    * aggregating the remainder (SURVEY §7.4.4). */
  def termsOtherBucket(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val top = counts
      .orderBy(col("n").desc_nulls_last, col("event_type").asc)
      .limit(3)
    val other = counts
      .join(broadcast(top.select(col("event_type").as("t"))),
        counts("event_type") === col("t"), "left_anti")
      .agg(sum("n").as("n"))
      .select(lit("__other__").as("event_type"), col("n"))
      .filter(col("n").isNotNull)
    top.unionByName(other)
  }

  val termsOtherBucketSql: String =
    """WITH counts AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
      |top AS (SELECT * FROM counts ORDER BY n DESC NULLS LAST, event_type ASC LIMIT 3)
      |SELECT event_type, n FROM top
      |UNION ALL
      |SELECT '__other__' AS event_type, CAST(SUM(n) AS BIGINT) AS n FROM counts
      |WHERE event_type NOT IN (SELECT event_type FROM top)
      |HAVING SUM(n) IS NOT NULL""".stripMargin

  // ---------------------------------------------------------------- W2
  /** [Lens] differences (lag delta) across day buckets — "Rendement
    * journalier" (`kibana/export (1).ndjson:4`). One shuffle for the daily
    * agg, windows evaluated per event_type partition. */
  def differencesDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(avg("value").as("v"))
    val w = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("diff", round(col("v") - lag("v", 1).over(w), 6))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        round(col("v"), 6).as("avg_value"), col("diff"))
  }

  val differencesDailySql: String =
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day, AVG(value) AS v
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
      |       ROUND(v, 6) AS avg_value,
      |       ROUND(v - LAG(v, 1) OVER (PARTITION BY event_type ORDER BY day), 6) AS diff
      |FROM daily""".stripMargin

  // ---------------------------------------------------------------- W3
  /** [Lens] time-shift formula — pct change vs previous day:
    * `(diff(last) / last(shift 1d)) * 100` (`kibana/export (1).ndjson:4`,
    * tinymath formula). */
  def pctChangeDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(avg("value").as("v"))
    val w = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("prev", lag("v", 1).over(w))
      .withColumn("pct_change",
        round((col("v") - col("prev")) / nullif(col("prev"), lit(0.0)) * 100, 6))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("pct_change"))
  }

  val pctChangeDailySql: String =
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day, AVG(value) AS v
      |  FROM events GROUP BY 1, 2),
      |lagged AS (
      |  SELECT event_type, day, v,
      |         LAG(v, 1) OVER (PARTITION BY event_type ORDER BY day) AS prev
      |  FROM daily)
      |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
      |       ROUND((v - prev) / NULLIF(prev, 0.0) * 100, 6) AS pct_change
      |FROM lagged""".stripMargin

  // ---------------------------------------------------------------- W4
  /** Ordered tail-N per key — the last-252/90/30 training windows
    * (`scripts/prediction/arima_forecast.py:44,76,61`): last 5 events per
    * event_type. */
  def tailNPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("event_type"), col("event_id"), col("rn"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"), col("value"))
  }

  val tailNPerKeySql: String =
    """SELECT event_type, event_id, rn,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value
      |FROM (SELECT event_type, event_id, ts, value,
      |             ROW_NUMBER() OVER (PARTITION BY event_type
      |                                ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn <= 5""".stripMargin

  // ---------------------------------------------------------------- O2
  /** Saved-search sort: globally latest 20 events (latest-news table,
    * `kibana/kibana_saved_objects.ndjson:5,10`). Deterministic via id
    * tiebreak; physical plan is TakeOrderedAndProject (top-k, no full sort). */
  def sortLatest(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(20)
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"), col("value"))

  val sortLatestSql: String =
    """SELECT event_id, user_id, event_type,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value
      |FROM events ORDER BY ts DESC, event_id DESC LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- U1
  /** Union with schema alignment — actual ∪ forecast rows
    * (`scripts/prediction/arima_forecast.py:99,150`). */
  def unionLabeled(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_totalprice"), lit("urgent").as("type"))
    val rest = o.filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_orderkey"), col("o_totalprice"), lit("normal").as("type"))
    urgent.unionByName(rest)
  }

  val unionLabeledSql: String =
    """SELECT o_orderkey, o_totalprice, 'urgent' AS type FROM orders
      |WHERE o_orderpriority = '1-URGENT'
      |UNION ALL
      |SELECT o_orderkey, o_totalprice, 'normal' AS type FROM orders
      |WHERE o_orderpriority <> '1-URGENT'""".stripMargin

  // ---------------------------------------------------------------- W1 padding
  /** [Lens] date_histogram with includeEmptyRows=true: dense daily spine per
    * event_type — `sequence` + `explode` + left join + coalesce(0)
    * (SURVEY §2.5 W1). At scale the spine is tiny (days × types) and the
    * daily agg is the only shuffle. */
  def dateSpinePadded(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val daily = ev
      .groupBy(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val bounds = ev.agg(
      min(date_trunc("day", col("ts")).cast("date")).as("lo"),
      max(date_trunc("day", col("ts")).cast("date")).as("hi"))
    val spineDays = bounds
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
    val types = ev.select("event_type").distinct()
    val spine = spineDays.crossJoin(broadcast(types))
    spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  val dateSpinePaddedSql: String =
    """WITH bounds AS (
      |  SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS lo,
      |         CAST(date_trunc('day', MAX(ts)) AS DATE) AS hi
      |  FROM events),
      |spine_days AS (
      |  SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM events),
      |daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT t.event_type AS event_type,
      |       strftime(s.day, '%Y-%m-%d') AS day,
      |       COALESCE(d.n, 0) AS n
      |FROM spine_days s CROSS JOIN types t
      |LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = s.day""".stripMargin

  // ---------------------------------------------------------------- F11
  /** Threshold CASE labeling — the sentiment label rule
    * (`scripts/ingestion/finnhub_news.py:41-46`) applied to a numeric column,
    * then aggregated. Thresholds hit exactly at the ±boundaries. */
  def caseThresholdLabel(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("label",
        when(col("value") >= 100.0, "high")
          .when(col("value") <= 10.0, "low")
          .otherwise("mid"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg("value"), 6).as("avg_value"))

  val caseThresholdLabelSql: String =
    """SELECT CASE WHEN value >= 100.0 THEN 'high'
      |            WHEN value <= 10.0 THEN 'low'
      |            ELSE 'mid' END AS label,
      |       COUNT(*) AS n, ROUND(AVG(value), 6) AS avg_value
      |FROM events GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- F1–F5
  /** Scalar date/time function battery: ISO formatting, day-normalize,
    * yyyy-MM-dd rendering (`scripts/indexing/to_elasticsearch.py:96-98`,
    * `scripts/prediction/arima_forecast.py:27`,
    * `scripts/ingestion/yahoo_stocks.py:32`). */
  def scalarDatetime(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("day_s"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("iso_s"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd HH:mm:ss").as("day_norm"),
        year(col("ts")).as("y"),
        month(col("ts")).as("m"))

  val scalarDatetimeSql: String =
    """SELECT event_id,
      |       strftime(ts, '%Y-%m-%d') AS day_s,
      |       strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_s,
      |       strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day_norm,
      |       CAST(year(ts) AS INT) AS y,
      |       CAST(month(ts) AS INT) AS m
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- F7
  /** Business-day sequence helper: next 30 business days from an anchor
    * (`scripts/prediction/arima_forecast.py:71-73`, pandas freq="B").
    * Pure `sequence`+`explode`+dayofweek filter — no driver-side loop. */
  def businessDays(spark: SparkSession, dir: String): DataFrame =
    spark.range(1)
      .select(explode(sequence(
        lit(java.sql.Date.valueOf("1996-01-01")),
        lit(java.sql.Date.valueOf("1996-03-15")),
        expr("interval 1 day"))).as("d"))
      // Spark dayofweek: 1=Sunday … 7=Saturday
      .filter(!dayofweek(col("d")).isin(1, 7))
      .orderBy("d")
      .limit(30)
      .select(date_format(col("d"), "yyyy-MM-dd").as("bday"))

  val businessDaysSql: String =
    """SELECT strftime(d, '%Y-%m-%d') AS bday
      |FROM (SELECT UNNEST(generate_series(DATE '1996-01-01', DATE '1996-03-15',
      |                                    INTERVAL 1 DAY))::DATE AS d)
      |WHERE isodow(d) <= 5
      |ORDER BY d LIMIT 30""".stripMargin

  // ---------------------------------------------------------------- P1
  /** Cast projection battery (`scripts/formatting/format_to_parquet.py:68-75`):
    * re-assert types + string building (concat_ws fallback, F10). */
  def projectCast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("linenumber_l"),
        // floor, not a bare double→int cast: Spark casts truncate while
        // DuckDB casts round, so the explicit floor keeps both engines equal
        floor(col("l_quantity")).cast("int").as("quantity_i"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("net_price"),
        concat_ws("|", col("l_returnflag"), col("l_linestatus")).as("flag_status"))

  val projectCastSql: String =
    """SELECT l_orderkey,
      |       CAST(l_linenumber AS BIGINT) AS linenumber_l,
      |       CAST(FLOOR(l_quantity) AS INT) AS quantity_i,
      |       ROUND(l_extendedprice * (1.0 - l_discount), 6) AS net_price,
      |       concat_ws('|', l_returnflag, l_linestatus) AS flag_status
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- U2-ish
  /** Distinct projection (`df.dropDuplicates` on projected key columns,
    * `scripts/ingestion/finnhub_news.py:176-188` analogue on a value-free
    * projection so the result is a deterministic set). */
  def distinctPairs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"))
      .distinct()

  val distinctPairsSql: String =
    "SELECT DISTINCT event_type, user_id FROM events"

  // ------------------------------------------------------- dashboard e2e
  /** The reference's `Detail_cours` dashboard read path, composed end-to-end
    * the way one dashboard view executes it (`kibana/export (1).ndjson:4`):
    * drill-down filter on ONE symbol → date_histogram (day) → per-bucket
    * last_value + avg → differences (lag delta of the closing value) →
    * time-shift pct-change formula `(diff(last) / last(shift 1d)) * 100`.
    *
    * Scale shape: the drill-down filter + projection push into the parquet
    * scan; one shuffle builds the daily buckets (per-day last_value comes
    * from the same row_number pass the A9 operator uses — deterministic via
    * the (ts, event_id) tiebreak). The day-ordered windows then run over the
    * AGGREGATED series — one row per day, bounded by the calendar (≤ a few
    * thousand rows at any corpus size) — so the unpartitioned window is a
    * deliberate driver-sized tail, not a scale risk: its input is already
    * one bucket per day regardless of raw-event volume. */
  def lensDashboard(spark: SparkSession, dir: String,
      symbol: String = "purchase"): DataFrame = {
    // the day key is materialized ONCE as a column and shared by the
    // window's partitionBy and the groupBy: keying both on the same
    // attribute lets EnsureRequirements satisfy the aggregate with the
    // window's existing hashpartitioning — ONE shuffle to the day grain
    // (two fresh `date_trunc` expressions planned as separate exchanges
    // before; ScaleSpec pins the single-exchange shape)
    val perEvent = Window.partitionBy(col("day"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val daily = Tables.events(spark, dir)
      // ts IS NOT NULL is part of the dashboard contract: streaming
      // window() silently drops null event times, so the batch side must
      // exclude them EXPLICITLY or the streamed twin diverges on data
      // with null timestamps (StreamLens mirrors this filter)
      .filter(col("event_type") === symbol && col("value").isNotNull &&
              col("ts").isNotNull)
      .withColumn("day", date_trunc("day", col("ts")))
      .withColumn("rn", row_number().over(perEvent))
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("n_events"),
        round(avg("value"), 6).as("avg_value"),
        max(when(col("rn") === 1, col("value"))).as("last_value"))
    val byDay = Window.orderBy("day")
    val prev = lag("last_value", 1).over(byDay)
    daily
      .withColumn("diff", round(col("last_value") - prev, 6))
      .withColumn("pct_change",
        round((col("last_value") - prev) / nullif(prev, lit(0.0)) * 100, 6))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_events"), col("avg_value"), col("last_value"),
        col("diff"), col("pct_change"))
  }

  val lensDashboardSql: String =
    """WITH f AS (
      |  SELECT * FROM events
      |  WHERE event_type = 'purchase' AND value IS NOT NULL
      |    AND ts IS NOT NULL),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY date_trunc('day', ts)
      |                               ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM f),
      |daily AS (
      |  SELECT date_trunc('day', ts) AS day,
      |         CAST(COUNT(*) AS BIGINT) AS n_events,
      |         ROUND(AVG(value), 6) AS avg_value,
      |         MAX(CASE WHEN rn = 1 THEN value END) AS last_value
      |  FROM ranked GROUP BY 1)
      |SELECT strftime(day, '%Y-%m-%d') AS day, n_events, avg_value, last_value,
      |       ROUND(last_value - LAG(last_value) OVER (ORDER BY day), 6) AS diff,
      |       ROUND((last_value - LAG(last_value) OVER (ORDER BY day))
      |             / NULLIF(LAG(last_value) OVER (ORDER BY day), 0.0) * 100,
      |             6) AS pct_change
      |FROM daily""".stripMargin
}
