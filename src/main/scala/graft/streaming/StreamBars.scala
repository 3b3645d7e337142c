package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Live OHLC bar maintenance — the streaming twin of the batch
  * `q_ohlc_bars` ([[graft.serve.FinanceQueries.ohlcBars]]). Each trigger
  * folds the new ticks into per-(symbol, day) bars; state is one row per
  * instrument-day (calendar-bounded, not volume-bounded), so complete
  * mode cannot blow up and the sink always holds the whole refreshed bar
  * table — exactly what a live price chart reads.
  *
  * The open/close contract is the associative form of the batch side's
  * `min_by`/`max_by` over the (ts, event_id) total order:
  * min/max(struct(ts, event_id, value)) compares ts, then event_id — the
  * same decision — and a struct min/max is a mergeable aggregate, so the
  * incremental fold across triggers reaches the identical bar the batch
  * aggregate computes in one pass. StreamBarsSpec pins streamed ≡ batch
  * bit-for-bit and the idempotent-refresh contract. */
object StreamBars {

  /** Per-(symbol, day) live bars to a memory sink, refreshed per trigger. */
  def barsToMemory(spark: SparkSession, eventsDir: String,
      queryName: String): StreamingQuery =
    StreamLens.eventsStream(spark, eventsDir)
      // window() drops null event-times silently; the explicit filter
      // keeps the streamed/batch row sets provably identical
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .groupBy(col("event_type"), window(col("ts"), "1 day"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value"))).as("first"),
        max("value").as("high"),
        min("value").as("low"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("last"),
        count(lit(1)).as("n_events"),
        sum("value").as("turnover_raw"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Append-mode twin with a 1-day watermark: a bar is emitted exactly
    * ONCE, when the event-time watermark passes its window end — the
    * finalized-bar contract a downstream TxTable/archive sink wants
    * (append never retracts, so only closed bars may flow). The cost of
    * finality is the tail: bars whose window end the watermark never
    * passes (the last day of a drained static source) stay in state,
    * unemitted — StreamBarsSpec pins emitted ≡ batch EXACTLY on the
    * watermark-closed prefix and names the open tail. State is again one
    * row per instrument-day, and the watermark lets Spark EVICT closed
    * windows instead of keeping the whole history (the complete-mode
    * twin's trade in reverse). */
  def barsAppend(spark: SparkSession, eventsDir: String,
      queryName: String): StreamingQuery =
    StreamLens.eventsStream(spark, eventsDir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .withWatermark("ts", "1 day")
      .groupBy(col("event_type"), window(col("ts"), "1 day"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value"))).as("first"),
        max("value").as("high"),
        min("value").as("low"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("last"),
        count(lit(1)).as("n_events"),
        sum("value").as("turnover_raw"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Read-time rendering to the exact batch output contract
    * (column names, rounding, day format). */
  def barsFinish(series: DataFrame): DataFrame =
    series.select(
      col("event_type"),
      date_format(col("window.start"), "yyyy-MM-dd").as("day"),
      round(col("first.value"), 6).as("open"),
      round(col("high"), 6).as("high"),
      round(col("low"), 6).as("low"),
      round(col("last.value"), 6).as("close"),
      col("n_events"),
      round(col("turnover_raw"), 6).as("turnover"))
}
