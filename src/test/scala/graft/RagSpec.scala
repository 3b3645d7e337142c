package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Rag

class RagSpec extends AnyFunSuite {
  import SparkTestSession._

  test("rag retrieve: contiguous ranks, monotone scores, never the query's own doc") {
    val rows = Rag.ragRetrieve(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("q_doc"))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length),
        s"q$q ranks not contiguous")
      val cosines = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cosines == cosines.sorted.reverse, s"q$q scores not monotone")
      rs.foreach(r => assert(r.getAs[Long]("src_doc") != q,
        s"q$q retrieved its own passage"))
    }
  }

  test("mmr: rank-1 is the relevance winner; later picks trade relevance for diversity") {
    val mmr = Rag.mmrRetrieve(spark, sf).collect()
    val ret = Rag.ragRetrieve(spark, sf, k = 1).collect()
      .map(r => r.getAs[Long]("q_doc") ->
        (r.getAs[Long]("src_doc"), r.getAs[Int]("chunk_pos"))).toMap
    assert(mmr.nonEmpty)
    val byQ = mmr.groupBy(_.getAs[Long]("q_doc"))
    assert(byQ.keySet == ret.keySet)
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length))
      // rank 1 ≡ the plain retrieval's top passage (MMR starts greedy)
      val r1 = sorted.head
      assert((r1.getAs[Long]("src_doc"), r1.getAs[Int]("chunk_pos")) == ret(q))
      // mmr score of every later pick can't exceed λ·its relevance
      sorted.tail.foreach { r =>
        assert(r.getAs[Double]("mmr") <=
          Rag.Lambda * r.getAs[Double]("rel") + 1e-9)
      }
      // the selected set is duplicate-free
      val ids = rs.map(r => (r.getAs[Long]("src_doc"), r.getAs[Int]("chunk_pos")))
      assert(ids.distinct.length == ids.length)
    }
  }

  test("pool exposure audit: gap is exactly min_sel − ceiling; every query reported") {
    val rows = Rag.mmrPoolExposure(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (minSel, ceil, gap) = (r.getDouble(1), r.getDouble(3), r.getDouble(4))
      assert(math.abs(gap - (minSel - ceil)) < 2e-6, r.toString)
      // ceiling must dominate every selected-but-not-first score's rel share
      assert(ceil > 0.0)
    }
  }

  test("stored chunk index: retrieval over the TxTable == inline, bit for bit") {
    val inline = Rag.ragRetrieve(spark, sf).collect().map(_.toString).sorted
    val stored = Rag.ragRetrieveStored(spark, sf).collect().map(_.toString).sorted
    assert(stored.nonEmpty && stored.sameElements(inline),
      s"stored path diverged: ${stored.length} vs ${inline.length} rows")
  }

  test("stored index memo keys by chunking params: new params rebuild, never reuse") {
    // warm the DEFAULT-params memo entry first, then ask for a different
    // chunking — the memo must not serve the default index against the
    // differently-chunked probe side (r13 ADVICE: key by (dir, window,
    // stride) like vecsMemo). Equivalence to the inline path with the SAME
    // params is the proof the right index answered.
    Rag.ragRetrieveStored(spark, sf).collect()
    val inline16 = Rag.ragRetrieve(spark, sf, window = 16, stride = 8)
      .collect().map(_.toString).sorted
    val stored16 = Rag.ragRetrieveStored(spark, sf, window = 16, stride = 8)
      .collect().map(_.toString).sorted
    assert(stored16.nonEmpty && stored16.sameElements(inline16),
      "stored retrieval with non-default chunking must match its inline twin")
  }

  test("incremental chunk-index append: base + batch == full index") {
    import org.apache.spark.sql.functions._
    val path = s"/tmp/graft_chunk_append/${new java.io.File(sf).getName}"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val docs = Tables.spread(spark, Tables.documents(spark, sf))
      .select("doc_id", "text")
    // base ingest = even docs, later batch = odd docs
    graft.serve.TxTable.write(spark,
      graft.operators.TextEmbed.embedDocs(
          graft.operators.Packing.chunkRows(
              docs.filter(col("doc_id") % 2 === 0)
                .select(col("doc_id"),
                  graft.functions.TextFunctions.tokens(col("text")).as("t")), 32, 16)
            .select((col("doc_id") * Rag.ChunkShift + col("chunk_pos")).as("doc_id"),
              concat_ws(" ", col("chunk")).as("text")))
        .select(col("doc_id").as("vec_id"), col("emb")),
      path)
    Rag.appendChunkIndex(spark, docs.filter(col("doc_id") % 2 === 1), path)
    // replay the same batch: idempotent (pure function of content)
    Rag.appendChunkIndex(spark, docs.filter(col("doc_id") % 2 === 1), path)
    val merged = graft.serve.TxTable.read(spark, path)
      .select("vec_id", "emb").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val full = graft.operators.TextEmbed.embedDocs(
        graft.operators.Packing.chunkRows(
            docs.select(col("doc_id"),
              graft.functions.TextFunctions.tokens(col("text")).as("t")), 32, 16)
          .select((col("doc_id") * Rag.ChunkShift + col("chunk_pos")).as("doc_id"),
            concat_ws(" ", col("chunk")).as("text")))
      .select(col("doc_id").as("vec_id"), col("emb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(merged == full,
      s"append diverged from rebuild: ${merged.size} vs ${full.size} chunk vectors")
  }

  test("rag plan: broadcast queries + bounded-heap top-k, no per-query window sort") {
    val plan = Rag.ragRetrieve(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "queries must broadcast against the chunk vectors")
    assert(!plan.contains("WindowExec") && !plan.contains("window"),
      s"per-query window sort crept into the scoring path:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      "top-k must run through the map-side-combinable heap aggregator")
  }
}
