package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Sampling

/** Ingest-time budget sampling — the streaming twin of the batch
  * `Sampling.budgetSample`: each language's budget-capped sample is kept
  * current as documents land, so an eval-set draw or mixture cap never
  * waits for a full-corpus pass.
  *
  * Why this sampler streams EXACTLY: selection is "the `budget` smallest
  * (xxhash64(doc_id, seed), doc_id) per language" — a pure function of
  * the document SET. k-smallest-of-a-union = k-smallest of per-batch
  * k-smallests, so maintaining per-batch candidate top-ks and reducing at
  * read time reproduces the batch answer on the ingested prefix
  * ROW-FOR-ROW (the CMS-grade streamed ≡ batch contract — most stream
  * twins settle for same-decisions; StreamSampleSpec asserts exact set
  * equality). Re-delivery is harmless by construction: a replayed doc
  * contributes the identical (hash, doc_id), and the idempotent TxTable
  * MERGE keyed (lang, doc_id) overwrites rather than duplicates.
  *
  * At 100 TB: each micro-batch ships ≤ budget rows per language present
  * in the batch (the bounded-heap partial aggregation), and the stored
  * candidate table is ≤ budget × #batches rows per language — metadata
  * scale; a compaction that re-tops the candidates into one batch's worth
  * is the same MERGE one step further. The selection kernel is
  * [[Sampling.budgetSampleOf]] — shared with the batch query, so the two
  * sides cannot hash or tie-break differently. */
object StreamSample {

  /** (doc_id, lang, text) drop-stream contract (`StreamSketch` schema —
    * the sampler keys by language, so drops carry it). */
  val DocLangTextSchemaDdl: String = StreamSketch.DocLangTextSchemaDdl

  /** One micro-batch's candidate rows: the batch-local budget-capped
    * sample, ≤ budget rows per language per batch. Only (lang, doc_id)
    * is stored — the read side recomputes the rank hash from
    * (doc_id, seed), which is both cheap (codegen'd xxhash64 over a
    * metadata-scale table) and safe: persisting the hash would invite a
    * read with a different seed to trust stored ranks that no longer
    * match the recomputed ones. */
  def sampleBatch(docs: DataFrame, budget: Int, seed: Int = 42): DataFrame =
    Sampling.budgetSampleOf(docs.select(col("doc_id"), col("lang")),
        "lang", budget, seed)
      .select(col("lang"), col("doc_id"))

  /** Streaming deployment: replay (doc_id, lang, text) parquet drops from
    * `inDir`, MERGE each micro-batch's candidate top-k into the TxTable
    * at `tablePath` keyed (lang, doc_id) — one atomic log commit per
    * batch, idempotent under replay (a redelivered doc overwrites its own
    * row with identical content). */
  def sampleStreamTx(spark: SparkSession, inDir: String, tablePath: String,
      checkpoint: String, budget: Int = 50, seed: Int = 42,
      maxFilesPerTrigger: Int = 1): Unit = {
    val stream = spark.readStream.schema(DocLangTextSchemaDdl)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.serve.TxTable.merge(batch.sparkSession,
          sampleBatch(batch, budget, seed), tablePath, Seq("lang", "doc_id"))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The assembled sample: re-top the stored candidates — the same
    * bounded-heap kernel over ≤ budget × #batches rows per language, so
    * the result equals the batch sampler run over every ingested doc. */
  def readSample(spark: SparkSession, tablePath: String,
      budget: Int = 50, seed: Int = 42): DataFrame =
    Sampling.budgetSampleOf(
      graft.serve.TxTable.read(spark, tablePath).select("doc_id", "lang"),
      "lang", budget, seed)
}
