package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** User-behavior analytics over the event stream — the cohort/funnel pair
  * every product dashboard wants next to the Lens battery. Both are pure
  * aggregate/join plans (no window over raw events anywhere) and fully
  * hash-oracled.
  *
  * Scale shapes: everything keys on user_id or (user_id, day) — per-user
  * aggregates are map-side combinable, joins are user-hash joins, and the
  * outputs are metadata-scale (cohort × offset grid; 3 funnel rows). At
  * 100 TB none of these plans materializes more than |users| rows past
  * the first aggregate. */
object CohortQueries {

  /** Cohort retention: users grouped by first-active day; for each
    * (cohort, day-offset) the surviving distinct-user count and the
    * retention rate vs the cohort's size. `activity` is distinct
    * (user, day) and each user has exactly one cohort day, so the final
    * count(*) IS the distinct-user count — no second distinct pass. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val act = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val coh = act.groupBy("user_id").agg(min("day").as("cohort_day"))
    val grid = act.join(coh, "user_id")
      .withColumn("offset", datediff(col("day"), col("cohort_day")))
      .groupBy("cohort_day", "offset")
      .agg(count(lit(1)).as("n_users"))
    val base = grid.filter(col("offset") === 0)
      .select(col("cohort_day"), col("n_users").as("cohort_size"))
    grid.join(broadcast(base), "cohort_day")
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("offset"), col("n_users"),
        round(col("n_users") / col("cohort_size"), 6).as("retention"))
  }

  val cohortRetentionSql: String =
    """WITH act AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
      |coh AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY 1),
      |grid AS (
      |  SELECT c.cohort_day,
      |         CAST(date_diff('day', c.cohort_day, a.day) AS INT) AS "offset",
      |         COUNT(*) AS n_users
      |  FROM act a JOIN coh c ON a.user_id = c.user_id
      |  GROUP BY 1, 2),
      |base AS (
      |  SELECT cohort_day, n_users AS cohort_size FROM grid WHERE "offset" = 0)
      |SELECT strftime(g.cohort_day, '%Y-%m-%d') AS cohort_day, g."offset",
      |       g.n_users, ROUND(g.n_users / b.cohort_size, 6) AS retention
      |FROM grid g JOIN base b ON g.cohort_day = b.cohort_day""".stripMargin

  /** Ordered conversion funnel: first view → first click strictly after
    * it → first purchase strictly after that. Stage counts with the
    * step-to-step conversion rate. */
  def eventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select("user_id", "event_type", "ts")
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min("ts").as("t_buy"))
    val wide = v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_buy")))
    wide.select(lit(1).as("stage_idx"), lit("view").as("stage"),
        col("n_view").as("n_users"),
        lit(null).cast("double").as("conv_rate"))
      .unionByName(wide.select(lit(2).as("stage_idx"), lit("click").as("stage"),
        col("n_click").as("n_users"),
        round(col("n_click") / col("n_view"), 6).as("conv_rate")))
      .unionByName(wide.select(lit(3).as("stage_idx"), lit("purchase").as("stage"),
        col("n_buy").as("n_users"),
        round(col("n_buy") / col("n_click"), 6).as("conv_rate")))
  }

  val eventFunnelSql: String =
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts) AS t_click
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS t_buy
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1),
      |n AS (SELECT (SELECT COUNT(*) FROM v) AS n_view,
      |             (SELECT COUNT(*) FROM c) AS n_click,
      |             (SELECT COUNT(*) FROM p) AS n_buy)
      |SELECT 1 AS stage_idx, 'view' AS stage, n_view AS n_users,
      |       CAST(NULL AS DOUBLE) AS conv_rate FROM n
      |UNION ALL
      |SELECT 2, 'click', n_click, ROUND(n_click / n_view, 6) FROM n
      |UNION ALL
      |SELECT 3, 'purchase', n_buy, ROUND(n_buy / n_click, 6) FROM n""".stripMargin
}
