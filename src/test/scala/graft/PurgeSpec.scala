package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{NgramLm, Rag}
import graft.serve.TxTable

/** Right-to-be-forgotten across the stored artifacts: purging documents
  * from the LM count tables (negated bump + zero-row delete) and from the
  * chunk-embedding index (range delete) must leave EXACTLY the artifacts a
  * from-scratch rebuild on the remaining corpus produces. */
class PurgeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fresh(name: String): String = {
    val p = s"/tmp/graft_purge/$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(p), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  private def docs = Tables.spread(spark, Tables.documents(spark, sf))
    .select("doc_id", "lang", "source", "text")

  test("LM count purge == rebuild on the remaining corpus, all three tables") {
    val path = fresh("lm")
    NgramLm.writeLmModel(spark, docs, path)
    val purged = docs.filter(col("doc_id") % 7 === 0)
    NgramLm.removeLmCounts(spark, purged, path)
    val rebuilt = fresh("lm_rebuild")
    NgramLm.writeLmModel(spark, docs.filter(col("doc_id") % 7 =!= 0), rebuilt)
    for (t <- Seq("uni", "big", "tri")) {
      val a = TxTable.read(spark, s"$path/$t").collect().map(_.toString).sorted.toSeq
      val b = TxTable.read(spark, s"$rebuilt/$t").collect().map(_.toString).sorted.toSeq
      assert(a.nonEmpty && a == b, s"$t diverged after purge: ${a.length} vs ${b.length}")
    }
  }

  test("chunk-index purge == rebuild on the remaining docs; re-purge is a no-op") {
    val path = fresh("chunks")
    Rag.writeChunkIndex(spark, sf, path)
    val victims = Seq(0L, 3L, 8L)
    Rag.purgeChunkIndex(spark, victims, path)
    val after = TxTable.read(spark, path).select("vec_id", "emb").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // no chunk of a purged doc survives
    assert(after.keys.forall(id => !victims.contains(id / Rag.ChunkShift)))
    // equality against a fresh build on the remaining docs
    val remaining = docs.filter(!col("doc_id").isin(victims: _*))
    val rebuilt = fresh("chunks_rebuild")
    TxTable.write(spark,
      graft.operators.TextEmbed.embedDocs(
          graft.operators.Packing.chunkRows(
              remaining.select(col("doc_id"),
                graft.functions.TextFunctions.tokens(col("text")).as("t")), 32, 16)
            .select((col("doc_id") * Rag.ChunkShift + col("chunk_pos")).as("doc_id"),
              concat_ws(" ", col("chunk")).as("text")))
        .select(col("doc_id").as("vec_id"), col("emb")),
      rebuilt)
    val fullRebuild = TxTable.read(spark, rebuilt).select("vec_id", "emb")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(after == fullRebuild)
    // idempotent: nothing left to delete, no commit burned
    val v = TxTable.latestVersion(spark, path)
    Rag.purgeChunkIndex(spark, victims, path)
    assert(TxTable.latestVersion(spark, path) == v)
  }
}
