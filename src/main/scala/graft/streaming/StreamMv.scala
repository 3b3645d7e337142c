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
  * Exactly-once story: the additive fold is NOT replay-idempotent by
  * itself, so every micro-batch merge is stamped with
  * `txn = (appId, batchId)` — the Delta txnAppId recipe — where appId is
  * derived from the checkpoint location (one writer per checkpoint is the
  * Structured Streaming contract). A crash BETWEEN the TxTable commit and
  * the checkpoint commit replays the batch, and [[graft.serve.TxTable
  * .merge]]'s idempotent-writer guard turns the replay into a no-op
  * instead of a double apply. StreamMvSpec pins both halves:
  * stream-maintained state ≡ the one-shot batch build bit-for-bit, and a
  * replayed batch leaves the state (and the version counter) untouched.
  *
  * At 100 TB: per trigger the delta aggregate is map-side-combined on
  * (event_type, day) — shuffle volume is day-partials, never raw ticks —
  * and the merge rewrite is file-pruned to the touched day range. */
object StreamMv {

  /** Stable writer id for the txn stamp: the checkpoint location IS the
    * stream's identity (one writer per checkpoint), hashed so path
    * separators never leak into the commit header's token syntax.
    *
    * PERSISTED in the checkpoint directory on first use (r15, closing the
    * r14 fix's own residual): deriving the id from any SPELLING of the
    * path — absolute (pre-r14) or canonical (r14) — re-keys the id
    * whenever the derivation changes or the filesystem view does (a
    * checkpoint reached through a symlink that is later re-pointed, a
    * mount moved between runs), and a re-keyed id disarms the replay
    * guard exactly across a crash-restart. The identity therefore lives
    * WITH the checkpoint state it guards: minted once from the canonical
    * path (resolving `.`/`..`/symlink spellings), written atomically
    * beside the checkpoint, and READ BACK on every later call — any
    * spelling of the same directory sees the same file, and no future
    * derivation change can ever re-key an existing stream. Checkpoints
    * created before this file existed mint it on their next start from
    * the same canonical-path recipe r14 used, so the common
    * (symlink-free) upgrade is stamp-continuous. */
  private[graft] def txnAppId(checkpoint: String): String = {
    val dir = new java.io.File(checkpoint).getCanonicalFile
    val f = new java.io.File(dir, "_graft_app_id")
    if (f.isFile)
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim
    else {
      val minted = "stream_mv_" + java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(dir.getPath) & 0xffffffffL)
      dir.mkdirs()
      val tmp = java.io.File.createTempFile("_graft_app_id", ".tmp", dir)
      java.nio.file.Files.write(tmp.toPath, (minted + "\n").getBytes("UTF-8"))
      // atomic publish; if a concurrent first-start won, adopt its id
      try java.nio.file.Files.move(tmp.toPath, f.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException
                 | _: java.nio.file.FileSystemException =>
        tmp.delete() }
      if (f.isFile)
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim
      else minted
    }
  }

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
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.serve.FinanceMv.maintainDailyCloseMv(batch.sparkSession,
          batch, tablePath, txn = Some((txnAppId(checkpoint), batchId)))
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
