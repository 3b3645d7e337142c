package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.serve.{FinanceMv, TxTable}
import graft.streaming.{StreamCurate, StreamIndex, StreamMv}
import java.nio.file.Files

/** Right-to-be-forgotten WHILE INGESTION RUNS — the streamed half of the
  * PurgeSpec contract (r13 verdict task 6). At production scale deletion
  * requests arrive between a live stream's micro-batches, not in a quiet
  * maintenance window; the purge fold and the stream's merges must
  * commute, so that
  *
  *   drain(A) → purge(victims) → drain(B)  ≡  fresh stream over (A∖victims) ∪ B
  *
  * holds bit-for-bit on the persisted state. Both streamed surfaces with
  * TxTable state are pinned: the additive finance MV (negated-bump purge)
  * and the curation decision table (predicate DELETE purge). "Live" here
  * means the checkpoint persists across the purge and the second drain
  * RESUMES the same stream — AvailableNow is how a local[32] test holds a
  * multi-batch stream open deterministically. */
class StreamPurgeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("MV purge mid-stream: negated bump between drains == fresh stream over the purged ticks") {
    val root = Files.createTempDirectory("stream_purge_mv").toString
    val events = Tables.events(spark, sf)
    val inA = events.filter(pmod(xxhash64(col("event_id")), lit(3)) =!= 0)
    val inB = events.filter(pmod(xxhash64(col("event_id")), lit(3)) === 0)
    // victims arrive as a deletion request AFTER drain(A) ingested them
    val victims = inA.filter(pmod(xxhash64(col("event_id")), lit(7)) === 0)
    val eventsDir = s"$root/events"
    inA.repartition(2).write.parquet(eventsDir)
    val tablePath = s"$root/mv"
    TxTable.write(spark,
      FinanceMv.viewOf(events.limit(0))
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd")),
      tablePath)
    val ckpt = s"$root/ckpt"
    StreamMv.maintainToTx(spark, eventsDir, tablePath, ckpt)
    // the deletion request lands while the stream is live (checkpoint
    // open, more files coming): negated bump + zero-key delete
    FinanceMv.removeFromDailyCloseMv(spark, victims, tablePath)
    // ingestion continues — the SAME stream resumes from its checkpoint
    inB.repartition(2).write.mode("append").parquet(eventsDir)
    StreamMv.maintainToTx(spark, eventsDir, tablePath, ckpt)
    val streamed = TxTable.read(spark, tablePath)
      .select("event_type", "day", "n_events", "s")
      .collect().map(_.toString).sorted.toSeq
    // truth: one-shot build over everything that was ingested minus the
    // forgotten ticks — decimal-exact, so equality is bit-for-bit
    val purgedCorpus = events
      .filter(!(pmod(xxhash64(col("event_id")), lit(3)) =!= 0 &&
        pmod(xxhash64(col("event_id")), lit(7)) === 0))
    val fresh = FinanceMv.viewOf(purgedCorpus)
      .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      .select("event_type", "day", "n_events", "s")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty && streamed == fresh,
      s"purged streamed MV drifted from the rebuild: ${streamed.length} vs ${fresh.length}")
    // and the victims really are forgotten: no key holds counts only they
    // could explain (spot-check one victim-only day if the split made one)
    assert(victims.count() > 0, "fixture must actually purge something")
  }

  test("stream-driven purge is txn-stamped: crash-replay of the purge fold is a no-op") {
    // r14 verdict task 3: the negated bump is NOT replay-idempotent by
    // itself — a purge driven from a stream/queue that crashes BETWEEN its
    // table commit and its checkpoint commit replays the batch, and
    // without a stamp the replay double-subtracts (dropping still-live
    // state to zero and deleting it: data loss, not privacy). The fold now
    // threads the same txnAppId:batchId stamp as the ingest fold;
    // TxTable.merge's idempotent-writer guard turns the replay into a
    // bit-for-bit no-op — state AND version untouched.
    val root = Files.createTempDirectory("stream_purge_replay").toString
    val events = Tables.events(spark, sf)
    val victims = events.filter(pmod(xxhash64(col("event_id")), lit(11)) === 0)
    val tablePath = s"$root/mv"
    TxTable.write(spark,
      FinanceMv.viewOf(events)
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd")), tablePath)
    assert(victims.count() > 0)
    val txn = Some(("purge_stream_ckpt_7", 3L))
    FinanceMv.removeFromDailyCloseMv(spark, victims, tablePath, txn = txn)
    val v = TxTable.latestVersion(spark, tablePath)
    val state = TxTable.read(spark, tablePath)
      .select("event_type", "day", "n_events", "s")
      .collect().map(_.toString).sorted.toSeq
    // the crash window: the checkpoint never committed, the SAME stamped
    // batch is delivered again on restart
    FinanceMv.removeFromDailyCloseMv(spark, victims, tablePath, txn = txn)
    assert(TxTable.latestVersion(spark, tablePath) == v,
      "a replayed stamped purge must not burn a version")
    val replayed = TxTable.read(spark, tablePath)
      .select("event_type", "day", "n_events", "s")
      .collect().map(_.toString).sorted.toSeq
    assert(replayed == state, "a replayed stamped purge must be a no-op, bit-for-bit")
    // and the purge itself really subtracted (sanity: some key changed
    // versus the pre-purge build)
    val prePurge = FinanceMv.viewOf(events)
      .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      .select("event_type", "day", "n_events", "s")
      .collect().map(_.toString).sorted.toSeq
    assert(state != prePurge, "fixture must actually purge something")
  }

  test("PQ code table purge mid-stream: DELETE between drains == one-shot encode of the purged corpus") {
    import graft.operators.Similarity
    import java.nio.file.{Files => JFiles, Paths}
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"), col("label"))
    val evens = vecs.filter(col("vec_id") % 2 === 0)
    val root = Files.createTempDirectory("stream_purge_index").toString
    val index = s"$root/index"
    Similarity.writePqIndexOf(spark, evens, index)
    JFiles.createDirectories(Paths.get(s"$root/in"))
    def drop(i: Int): Unit = {
      Tables.embeddings(spark, sf)
        .filter(col("vec_id") % 2 === 1 && col("vec_id") % 3 === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$root/tmp_$i")
      val part = new java.io.File(s"$root/tmp_$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      JFiles.move(part.toPath, Paths.get(s"$root/in/drop_$i.parquet"))
      ()
    }
    drop(0); drop(1)
    StreamIndex.indexStreamTx(spark, s"$root/in", index, s"$root/ckpt")
    // deletion request lands mid-stream: victims span BOTH the batch-built
    // half and the stream-ingested half of the code table
    val victims = Seq(0L, 2L, 1L, 7L)
    TxTable.delete(spark, s"$index/codes",
      col("vec_id").isin(victims: _*))
    drop(2)
    StreamIndex.indexStreamTx(spark, s"$root/in", index, s"$root/ckpt")
    val streamed = TxTable.read(spark, s"$index/codes")
      .collect().map(_.toString).sorted.toSeq
    // codes are a pure per-row function of (embedding, frozen codebooks):
    // the purged streamed table must equal the one-shot encode of the
    // corpus with the victims already forgotten, bit for bit
    val cb = Similarity.seededCodebooks(evens, 16)
    val oneShot = Similarity.pqCodes(
        vecs.filter(!col("vec_id").isin(victims: _*)), cb)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty && streamed == oneShot,
      s"purged streamed codes drifted: ${streamed.length} vs ${oneShot.length}")
  }

  test("curation decisions purge mid-stream: DELETE between drains == fresh stream over the purged corpus") {
    val root = Files.createTempDirectory("stream_purge_curate").toString
    val index = Dedup.bandSignatureRows(
      Tables.spread(spark, Tables.documents(spark, sf))
        .filter(col("doc_id") % 2 === 0), "doc_id", "text")
    val odd = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 1).select("doc_id", "text")
    val inA = odd.filter(col("doc_id") % 4 === 1)
    val inB = odd.filter(col("doc_id") % 4 === 3)
    val victims = inA.select("doc_id").limit(3)
      .collect().map(_.getLong(0)).toSeq
    assert(victims.nonEmpty)
    val inDir = s"$root/in"
    inA.write.parquet(inDir)
    val table = s"$root/decisions"
    val ckpt = s"$root/ckpt"
    StreamCurate.curateStreamTx(spark, inDir, index, table, ckpt)
    // deletion request between micro-batches: the decision rows ARE
    // derived personal data — purge them with the table-format verb
    TxTable.delete(spark, table, col("doc_id").isin(victims: _*))
    inB.write.mode("append").parquet(inDir)
    StreamCurate.curateStreamTx(spark, inDir, index, table, ckpt)
    val streamed = TxTable.read(spark, table).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("keep"),
        r.getAs[String]("drop_reason"))).toSet
    // truth: a FRESH stream (new checkpoint, new table) over the corpus
    // with the victims already forgotten
    val purgedDir = s"$root/in_purged"
    inA.filter(!col("doc_id").isin(victims: _*)).unionByName(inB)
      .write.parquet(purgedDir)
    val freshTable = s"$root/decisions_fresh"
    StreamCurate.curateStreamTx(spark, purgedDir, index, freshTable,
      s"$root/ckpt_fresh")
    val fresh = TxTable.read(spark, freshTable).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("keep"),
        r.getAs[String]("drop_reason"))).toSet
    assert(streamed == fresh,
      s"purged streamed decisions drifted: ${streamed.size} vs ${fresh.size}")
    assert(victims.forall(v => !streamed.exists(_._1 == v)),
      "a forgotten doc must not survive in the decision table")
  }
}
