package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Range (interval) join: match each point-in-time row to every interval
  * containing it, on a shared key.
  *
  * The naive plan for `L.t BETWEEN R.lo AND R.hi` is a broadcast
  * nested-loop or cartesian filter — quadratic. The scalable formulation is
  * **time-binning**: quantize both sides to fixed-width bins (intervals
  * explode into every bin they overlap), equi-join on (key, bin) — which
  * Catalyst executes as a hash join — then re-apply the exact BETWEEN as a
  * post-filter. Cost: |R| × avg_bins_per_interval + hash join, linear-ish
  * when interval lengths are bounded; the bin width is the knob (≈ median
  * interval length).
  */
object RangeJoin {

  /** Generic binned range join.
    * @param points  (key, t, ...) — t a timestamp
    * @param ranges  (key, lo, hi, ...) — inclusive interval bounds
    * @param binSeconds bin width */
  def binned(points: DataFrame, ranges: DataFrame, keyCol: String,
      tCol: String, loCol: String, hiCol: String, binSeconds: Long): DataFrame = {
    val pBinned = points.withColumn("__bin",
      floor(unix_timestamp(col(tCol)) / binSeconds))
    val rBinned = ranges.withColumn("__bin",
      explode(sequence(
        floor(unix_timestamp(col(loCol)) / binSeconds),
        floor(unix_timestamp(col(hiCol)) / binSeconds))))
    pBinned.join(rBinned, Seq(keyCol, "__bin"))
      .filter(col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Registered query: join each user's events to that user's sessions
    * (sessions built batch-side) — "which session does this event belong
    * to" as a range join, validating the binned plan against DuckDB's
    * native inequality join. 1-hour bins ≈ session length scale. */
  def eventsInSessions(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
    val sessions = Sessionize.sessions(spark, dir)
      .select(col("user_id"), col("session_idx"),
        col("session_start").cast("timestamp").as("lo"),
        col("session_end").cast("timestamp").as("hi"))
    binned(ev, sessions, "user_id", "ts", "lo", "hi", 3600L)
      .select(col("user_id"), col("event_id"), col("session_idx"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
  }

  /** The DECLARATIVE form of the same operator: the user writes the plain
    * inequality join (`ts >= lo AND ts < hi`, no equi-key — Spark would
    * plan a BroadcastNestedLoopJoin) and
    * [[graft.plans.BinnedRangeJoinRule]] rewrites it to the binned
    * equi-join automatically. Events counted into overlapping 48-hour
    * windows sliding daily — each event lands in ~2 windows, so the result
    * also exercises the one-to-many fan-out. */
  def eventsInDayWindows(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.BinnedRangeJoinRule.install(spark)
    val ev = Tables.events(spark, dir).select(col("event_id"), col("ts"), col("value"))
    val win = spark.range(0, 30).select(
      col("id").cast("int").as("window_id"),
      expr("timestampadd(DAY, CAST(id AS INT), TIMESTAMP'2024-01-01 00:00:00')").as("lo"),
      expr("timestampadd(DAY, CAST(id AS INT) + 2, TIMESTAMP'2024-01-01 00:00:00')").as("hi"))
    ev.join(win, ev("ts") >= win("lo") && ev("ts") < win("hi"))
      .groupBy("window_id")
      .agg(count(lit(1)).as("n_events"), round(avg("value"), 6).as("avg_value"))
  }

  val eventsInDayWindowsSql: String =
    """WITH win AS (
      |  SELECT CAST(d AS INT) AS window_id,
      |         TIMESTAMP '2024-01-01 00:00:00' + to_days(CAST(d AS INT)) AS lo,
      |         TIMESTAMP '2024-01-01 00:00:00' + to_days(CAST(d AS INT) + 2) AS hi
      |  FROM (SELECT UNNEST(generate_series(0, 29)) AS d))
      |SELECT w.window_id AS window_id, COUNT(*) AS n_events,
      |       ROUND(AVG(e.value), 6) AS avg_value
      |FROM events e JOIN win w ON e.ts >= w.lo AND e.ts < w.hi
      |GROUP BY 1""".stripMargin

  /** Oracle: DuckDB native inequality join over the same session
    * definition. Events sit exactly inside their own session bounds, so
    * every event matches ≥ 1 session (its own). Second-truncation of
    * session bounds (strftime round-trip) is applied on both sides. */
  val eventsInSessionsSql: String =
    s"""WITH marked AS (
       |  SELECT user_id, event_id, ts,
       |         CASE WHEN LAG(ts) OVER w IS NULL
       |                OR date_diff('second', LAG(ts) OVER w, ts) > ${Sessionize.GapMinutes * 60} THEN 1
       |              ELSE 0 END AS is_new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
       |numbered AS (
       |  SELECT user_id, ts,
       |         CAST(SUM(is_new_session) OVER (PARTITION BY user_id
       |           ORDER BY ts ASC, event_id ASC
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
       |  FROM marked),
       |sessions AS (
       |  SELECT user_id, session_idx,
       |         CAST(strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS lo,
       |         CAST(strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS hi
       |  FROM numbered GROUP BY 1, 2)
       |SELECT e.user_id AS user_id, e.event_id AS event_id, s.session_idx AS session_idx,
       |       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s
       |FROM events e JOIN sessions s
       |  ON e.user_id = s.user_id AND e.ts >= s.lo AND e.ts <= s.hi""".stripMargin
}
