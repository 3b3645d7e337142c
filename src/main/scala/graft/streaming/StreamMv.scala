package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming maintenance of the finance day-grain materialized view — the
  * live form of [[graft.serve.FinanceMv]]: every micro-batch of ticks is
  * folded into the TxTable-persisted (event_type, day, n, s) state as ONE
  * atomic merge commit, so the dashboard battery reads a view that is
  * always a consistent prefix of the stream, versioned per batch (time
  * travel over MV refreshes for free).
  *
  * Exactly-once story: the additive fold is NOT replay-idempotent (the
  * [[graft.serve.FinanceMv.maintainDailyCloseMv]] contract), so batch
  * delivery relies on the streaming checkpoint — Structured Streaming
  * replays a failed batch only before its commit, and the TxTable merge
  * is the batch's single externally-visible effect. A crash BETWEEN the
  * TxTable commit and the checkpoint commit double-applies one batch —
  * closing that window needs the batchId recorded in the table commit
  * (the Delta txnAppId recipe); documented, not hidden. StreamMvSpec pins
  * the in-order case: stream-maintained state ≡ the one-shot batch build
  * bit-for-bit, decimal-exact.
  *
  * At 100 TB: per trigger the delta aggregate is map-side-combined on
  * (event_type, day) — shuffle volume is day-partials, never raw ticks —
  * and the merge rewrite is file-pruned to the touched day range. */
object StreamMv {

  /** Drain `eventsDir` as a stream, folding each micro-batch into the MV
    * table at `tablePath`. The table must exist (seed with an empty or
    * initial [[graft.serve.FinanceMv.writeDailyCloseMv]] commit).
    * `maxFilesPerTrigger` bounds each micro-batch (tests use it to force a
    * genuinely multi-batch fold; production AvailableNow batches by source
    * defaults). */
  def maintainToTx(spark: SparkSession, eventsDir: String,
      tablePath: String, checkpoint: String,
      maxFilesPerTrigger: Int = 1): Unit = {
    val q = spark.readStream
      .schema(graft.Tables.EventsSchemaDdl)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(eventsDir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.serve.FinanceMv.maintainDailyCloseMv(batch.sparkSession,
          batch, tablePath)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
