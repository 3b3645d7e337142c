package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The `Detail_cours` dashboard read path as a LIVE query — the streaming
  * twin of the batch `q_lens_dashboard` (`LensQueries.lensDashboard`,
  * `kibana/export (1).ndjson:4`), completing the §2.10 pattern: every
  * batch surface the reference serves has a faithful streaming form.
  *
  * Shape: drill-down filter on ONE symbol → 1-day windowed aggregate
  * maintaining (n_events, avg, last_value) per day, in COMPLETE mode to a
  * memory sink (a dashboard sink genuinely wants the whole refreshed
  * series each trigger; state is one row per calendar day — bounded by
  * time, not by event volume, so complete mode cannot blow up). The
  * differences / pct-change tail runs at READ time over the completed
  * series ([[dashboardFinish]]) — windows need the final per-day values,
  * and the series is driver-sized by the calendar.
  *
  * Determinism contract shared with the batch query: last_value =
  * max(struct(ts, event_id, value)) — struct ordering compares ts then
  * event_id, exactly the batch side's row_number over (ts DESC, event_id
  * DESC) with the same tiebreak — so streamed and batch dashboards are
  * bit-equal, which StreamLensSpec asserts.
  */
object StreamLens {

  /** Streaming scan of an events DIRECTORY (file-source streams take a
    * directory of part-files — the live-ingest layout — not a single
    * file). Explicit schema is mandatory for file streams; it is the ONE
    * shared `Tables.EventsSchemaDdl` (pinned against the batch reader by
    * SchemaDriftSpec) because a file stream fills columns missing from
    * the physical files with silent NULLs rather than failing — a private
    * schema copy here would bypass the drift detection. */
  def eventsStream(spark: SparkSession, eventsDir: String): DataFrame =
    spark.readStream
      .schema(graft.Tables.EventsSchemaDdl)
      .parquet(eventsDir)

  /** The live per-day aggregate behind the dashboard: one row per day,
    * refreshed each trigger. */
  def dashboardToMemory(spark: SparkSession, eventsDir: String,
      symbol: String, queryName: String): StreamingQuery =
    eventsStream(spark, eventsDir)
      // ts IS NOT NULL mirrors the batch dashboard's explicit contract —
      // window() would drop null event times silently anyway, and an
      // implicit drop is exactly how streamed and batch results diverge
      .filter(col("event_type") === symbol && col("value").isNotNull &&
              col("ts").isNotNull)
      .groupBy(window(col("ts"), "1 day"))
      .agg(
        count(lit(1)).as("n_events"),
        avg("value").as("avg_raw"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("last"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The dashboard's finishing pass over the completed day series:
    * rendering, differences, pct-change — identical output contract to
    * `LensQueries.lensDashboard`. The unpartitioned window is the same
    * deliberate driver-sized tail as the batch query's (input is one row
    * per day regardless of event volume). */
  def dashboardFinish(series: DataFrame): DataFrame = {
    val byDay = Window.orderBy("day")
    val prev = lag("last_value", 1).over(byDay)
    series
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("n_events"),
        round(col("avg_raw"), 6).as("avg_value"),
        col("last.value").as("last_value"))
      .withColumn("diff", round(col("last_value") - prev, 6))
      .withColumn("pct_change",
        round((col("last_value") - prev) / nullif(prev, lit(0.0)) * 100, 6))
  }
}
