package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** Sessionization of the event stream: group each user's events into
  * sessions separated by ≥ `gap` of inactivity.
  *
  * Batch form: the classic lag + cumulative-sum-of-boundaries window pair —
  * one shuffle by user, two in-partition window passes, no self-join.
  * SQL-expressible, so it carries a DuckDB oracle.
  *
  * Streaming form: `flatMapGroupsWithState` with event-time timeout — the
  * custom-state primitive the reference never needed (pure batch) but a
  * live pipeline does. Same session semantics; emits a session row when the
  * gap timeout fires.
  */
object Sessionize {

  val GapMinutes = 30

  // ---------------------------------------------------------------- batch
  /** Events with their session number attached — the shared front half of
    * [[sessions]] and [[trainingPairs]]: one shuffle by user, two
    * in-partition window passes (lag to mark gaps, running sum to number). */
  private def numbered(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("is_new_session",
        when(col("prev_ts").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > GapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum("is_new_session").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def sessions(spark: SparkSession, dir: String): DataFrame = {
    numbered(spark, dir)
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        round(sum("value"), 6).as("session_value"))
  }

  val sessionsSql: String =
    s"""WITH marked AS (
       |  SELECT user_id, event_id, ts, value,
       |         CASE WHEN LAG(ts) OVER w IS NULL
       |                OR date_diff('second', LAG(ts) OVER w, ts) > ${GapMinutes * 60} THEN 1
       |              ELSE 0 END AS is_new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
       |numbered AS (
       |  SELECT user_id, ts, value,
       |         CAST(SUM(is_new_session) OVER (PARTITION BY user_id
       |           ORDER BY ts ASC, event_id ASC
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
       |  FROM marked)
       |SELECT user_id, session_idx,
       |       COUNT(*) AS n_events,
       |       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       |       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       |       ROUND(SUM(value), 6) AS session_value
       |FROM numbered GROUP BY user_id, session_idx""".stripMargin

  // ------------------------------------------- next-event training pairs
  /** Autoregressive (input → target) pairs from sessionized behavior — the
    * step that turns raw event logs into a next-event-prediction training
    * set (the sequential-recommendation data shape: each session becomes
    * |session|−1 supervised examples of "after seeing X, the user did Y").
    *
    * Scale shape: the pair window partitions by (user_id, session_idx),
    * which the session-numbering exchange on user_id already satisfies
    * (HashPartitioning(user) co-locates every (user, session) group), so
    * Catalyst plans ONE shuffle for numbering + pairing; per-partition
    * work is two ordered window passes. Sessions are gap-bounded, so no
    * window partition can concentrate the corpus the way a mega-stratum
    * would. */
  def trainingPairs(spark: SparkSession, dir: String): DataFrame = {
    val bySession = Window.partitionBy("user_id", "session_idx")
      .orderBy(col("ts").asc, col("event_id").asc)
    numbered(spark, dir)
      .withColumn("step", row_number().over(bySession).cast("long"))
      .withColumn("target_event", lead("event_type", 1).over(bySession))
      .filter(col("target_event").isNotNull)
      .select(col("user_id"), col("session_idx"), col("step"),
        col("event_type").as("input_event"), col("target_event"))
  }

  /** DuckDB oracle for [[trainingPairs]] — same marked/numbered CTEs as
    * [[sessionsSql]] with event_type carried through, then LEAD over the
    * (user, session) window; the trailing event of each session has no
    * target and is dropped on both sides. */
  val trainingPairsSql: String =
    s"""WITH marked AS (
       |  SELECT user_id, event_id, ts, event_type,
       |         CASE WHEN LAG(ts) OVER w IS NULL
       |                OR date_diff('second', LAG(ts) OVER w, ts) > ${GapMinutes * 60} THEN 1
       |              ELSE 0 END AS is_new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
       |numbered AS (
       |  SELECT user_id, event_id, ts, event_type,
       |         CAST(SUM(is_new_session) OVER (PARTITION BY user_id
       |           ORDER BY ts ASC, event_id ASC
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
       |  FROM marked)
       |SELECT user_id, session_idx,
       |       CAST(ROW_NUMBER() OVER ws AS BIGINT) AS step,
       |       event_type AS input_event,
       |       LEAD(event_type) OVER ws AS target_event
       |FROM numbered
       |WINDOW ws AS (PARTITION BY user_id, session_idx ORDER BY ts ASC, event_id ASC)
       |QUALIFY target_event IS NOT NULL""".stripMargin

  // --------------------------------------------------- transition matrix
  /** First-order Markov transition matrix over within-session event
    * pairs: P(next | prev) row-normalized, with the support count. The
    * model the next-event training pairs ([[trainingPairs]]) fit — and
    * the baseline any sequence model must beat. Counts are one combinable
    * aggregate over the pair stream; the normalizer joins back a
    * |event-type|-row broadcast. */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val cnt = trainingPairs(spark, dir)
      .groupBy("input_event", "target_event")
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy("input_event").agg(sum("n").as("n_total"))
    cnt.join(broadcast(tot), "input_event")
      .select(col("input_event"), col("target_event"), col("n"),
        round(col("n") / col("n_total"), 6).as("p"))
  }

  val transitionMatrixSql: String =
    s"""WITH pairs AS ($trainingPairsSql),
       |cnt AS (SELECT input_event, target_event, COUNT(*) AS n
       |        FROM pairs GROUP BY 1, 2),
       |tot AS (SELECT input_event, CAST(SUM(n) AS BIGINT) AS n_total
       |        FROM cnt GROUP BY 1)
       |SELECT c.input_event, c.target_event, c.n,
       |       ROUND(c.n / t.n_total, 6) AS p
       |FROM cnt c JOIN tot t ON c.input_event = t.input_event""".stripMargin

  // ------------------------------------------------------------- streaming
  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, total: Double)
  case class SessionOut(user_id: Long, session_start: String, session_end: String,
      n_events: Long, session_value: Double)

  private def fmt(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms).atZone(java.time.ZoneOffset.UTC)
      .toLocalDateTime.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  /** Stateful session builder: closes + emits a session when the event-time
    * gap exceeds GapMinutes (or on state timeout). */
  def sessionFn(userId: Long, events: Iterator[Ev],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    // drop events already behind the watermark: folding one in could
    // resurrect (and re-emit) a session the timeout already closed —
    // duplicate session rows in append mode
    val wm = state.getCurrentWatermarkMs()
    val sorted = events.toSeq.filter(_.ts.getTime >= wm).sortBy(_.ts.getTime)
    var out = List.empty[SessionOut]
    if (state.hasTimedOut) {
      state.getOption.foreach { s =>
        out ::= SessionOut(userId, fmt(s.start), fmt(s.end), s.n, s.total)
      }
      state.remove()
      return out.iterator
    }
    var cur = state.getOption
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.end <= GapMinutes * 60000L =>
          // min() on start too: a late-but-within-watermark event earlier
          // than the stored start must extend the session backward
          cur = Some(SessionState(math.min(s.start, t), math.max(s.end, t),
            s.n + 1, s.total + e.value))
        case Some(s) =>
          out ::= SessionOut(userId, fmt(s.start), fmt(s.end), s.n, s.total)
          cur = Some(SessionState(t, t, 1, e.value))
        case None =>
          cur = Some(SessionState(t, t, 1, e.value))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // clamp: a group whose newest event lags the stream max by nearly the
      // watermark delay can compute end+gap BELOW the current watermark, and
      // Spark throws (timeout must be > watermark) killing the query
      state.setTimeoutTimestamp(math.max(s.end + GapMinutes * 60000L, wm + 1))
    }
    out.reverse.iterator
  }

  /** Streaming sessionization over a rate/file source DataFrame with columns
    * (user_id, ts, value); returns the writeStream-ready Dataset. */
  def sessionizeStream(spark: SparkSession, events: DataFrame) = {
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("ts").cast("timestamp"), col("value").cast("double"))
      .as[Ev]
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(sessionFn)
  }
}
