package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.streaming.StreamIndex
import java.nio.file.{Files, Paths}

/** Ingest-time PQ index maintenance: stream replay → per-batch encode
  * under the FROZEN persisted codebooks → idempotent MERGE keyed vec_id
  * → search over the assembled index ≡ the one-shot encode under the
  * same codebooks (codes are a pure per-row function of the embedding,
  * so batching/order cannot matter — the StreamSample exactness
  * argument, applied to the index build). */
class StreamIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"), col("label"))

  private def key(r: org.apache.spark.sql.Row) =
    (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
      r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))

  test("streamed ingest maintains the stored index: search ≡ one-shot encode, replay converges") {
    // index built over the even half (codebooks frozen from its labels);
    // the odd half lands later as three drops → three real micro-batches
    val evens = vecs.filter(col("vec_id") % 2 === 0)
    val root = Files.createTempDirectory("stream_index").toString
    val index = s"$root/index"
    Similarity.writePqIndexOf(spark, evens, index)
    Files.createDirectories(Paths.get(s"$root/in"))
    (0 to 2).foreach { i =>
      Tables.embeddings(spark, sf)
        .filter(col("vec_id") % 2 === 1 && col("vec_id") % 3 === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$root/tmp_$i")
      val part = new java.io.File(s"$root/tmp_$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(s"$root/in/drop_$i.parquet"))
    }
    StreamIndex.indexStreamTx(spark, s"$root/in", index, s"$root/ckpt")
    val streamed = Similarity.pqTopKStored(spark, sf, index)
      .collect().map(key).sorted
    // one-shot reference: same even-seeded codebooks, every code at once
    val cbEven = Similarity.seededCodebooks(evens, 16)
    val oneShot = Similarity.pqSearch(vecs, cbEven, 20, 5, 50)
      .collect().map(key).sorted
    assert(streamed.nonEmpty && streamed.toSeq == oneShot.toSeq,
      "streamed index search diverged from the one-shot encode")
    // replay from a fresh checkpoint: every code row overwrites itself
    StreamIndex.indexStreamTx(spark, s"$root/in", index, s"$root/ckpt2")
    val replayed = Similarity.pqTopKStored(spark, sf, index)
      .collect().map(key).sorted
    assert(replayed.toSeq == streamed.toSeq)
    val codes = serve.TxTable.read(spark, s"$index/codes")
    assert(codes.count() == vecs.count(),
      "assembled code table must cover the whole corpus exactly once")
    assert(codes.count() == codes.select("vec_id").distinct().count(),
      "replay must not duplicate code rows")
  }
}
