package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("contiguous packing: every doc assigned, packs contiguous per lang") {
    val p = Packing.packContiguous(spark, sf)
    assert(p.count() == Tables.documents(spark, sf).count())
    // within a lang, pack_id is non-decreasing in doc_id order and each
    // pack's preceding cumulative tokens lie in [pack_id*B, (pack_id+1)*B)
    p.collect().groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      ordered.foreach { r =>
        val expected = cum / Packing.DefaultBudget
        assert(r.getAs[Long]("pack_id") == expected)
        cum += r.getAs[Int]("n_tokens")
      }
    }
  }

  test("length buckets: quartile partition covers the corpus, waste arithmetic holds") {
    val b = Packing.lengthBuckets(spark, sf).collect()
      .sortBy(_.getAs[Int]("bucket"))
    assert(b.map(_.getAs[Int]("bucket")).toSeq == (0 until b.length))
    assert(b.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf).count())
    // quartile cuts: no bucket hoards the corpus (each ≤ just over 1/4 + ties)
    val total = b.map(_.getAs[Long]("n_docs")).sum.toDouble
    b.foreach(r => assert(r.getAs[Long]("n_docs") <= total * 0.5))
    // buckets are ordered, non-overlapping token ranges
    b.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Long]("max_tokens") <= hi.getAs[Long]("min_tokens"))
      case _ =>
    }
    // waste identity per bucket, and bucketing beats one global bucket
    var globalMax = b.map(_.getAs[Long]("max_tokens")).max
    val sumAll = b.map(_.getAs[Long]("sum_tokens")).sum
    val bucketedPadded = b.map(r =>
      r.getAs[Long]("max_tokens") * r.getAs[Long]("n_docs")).sum
    b.foreach { r =>
      assert(r.getAs[Long]("padding_waste") ==
        r.getAs[Long]("max_tokens") * r.getAs[Long]("n_docs") -
          r.getAs[Long]("sum_tokens"))
    }
    assert(bucketedPadded - sumAll < globalMax * total - sumAll,
      "4-bucket padding must waste less than pad-to-global-max")
  }

  test("next-fit packing respects the budget (single-oversize-doc exception)") {
    val p = Packing.packNextFit(spark, sf).collect()
    assert(p.length == Tables.documents(spark, sf).count())
    val byPack = p.groupBy(_.getAs[String]("pack_key"))
    byPack.foreach { case (key, rows) =>
      val total = rows.map(_.getAs[Int]("n_tokens").toLong).sum
      assert(total <= Packing.DefaultBudget || rows.length == 1,
        s"pack $key holds $total tokens in ${rows.length} docs")
      // packs never mix languages
      assert(rows.map(_.getAs[String]("lang")).distinct.length == 1)
    }
    // determinism: rerun yields identical assignment
    val again = Packing.packNextFit(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pack_key")).toMap
    p.foreach(r => assert(again(r.getAs[Long]("doc_id")) == r.getAs[String]("pack_key")))
  }

  test("next-fit kernel: null-lang first doc still opens bin 0; counter resets per lang") {
    import graft.operators.Packing.DocTok
    val out = Packing.nextFitAssign(Iterator(
      DocTok(1L, null, 10), DocTok(2L, null, 10), DocTok(3L, "en", 10)), 16).toList
    assert(out.map(_._4) == List("null_0", "null_1", "en_0"))
  }

  test("chunking: every token covered, windows bounded, tail anchored") {
    import org.apache.spark.sql.functions._
    val w = 64; val stride = 32
    val chunks = graft.operators.Packing.chunkDocuments(spark, sf, w, stride)
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(graft.functions.TextFunctions.tokens(col("text"))).as("n"))
    val per = chunks.groupBy("doc_id").agg(
        min("start_idx").as("first_s"),
        max(col("start_idx") + col("n_chunk_tokens") - 1).as("last_end"),
        max("n_chunk_tokens").as("max_w"),
        count(lit(1)).as("n_chunks"))
      .join(toks, "doc_id").cache()
    assert(per.count() == toks.count(), "every doc chunks (even empty ones)")
    // windows start at 1 and never exceed the window size
    assert(per.filter(col("first_s") =!= 1).count() == 0)
    assert(per.filter(col("max_w") > w).count() == 0)
    // tail anchoring: the last window ends exactly at the doc's last token
    // (for non-empty docs), so no token is stranded; with stride <= window
    // consecutive starts overlap, so coverage is total
    assert(per.filter(col("n") > 0 && col("last_end") =!= col("n")).count() == 0,
      "anchored final window must end at token n")
    // a doc with n <= window has exactly one chunk
    assert(per.filter(col("n") <= w && col("n_chunks") =!= 1).count() == 0)
  }

  test("bpe chunking: same kernel contract on the real token stream") {
    import org.apache.spark.sql.functions._
    val w = 64; val stride = 32
    val chunks = Packing.chunkDocumentsBpe(spark, sf, w, stride)
    // the denominator is the BPE token count, not the word count
    val toks = graft.operators.BpeEncode.encodeQuery(spark, sf)
      .select(col("doc_id"), col("n_tokens").as("n"))
    val per = chunks.groupBy("doc_id").agg(
        min("start_idx").as("first_s"),
        max(col("start_idx") + col("n_chunk_tokens") - 1).as("last_end"),
        max("n_chunk_tokens").as("max_w"),
        count(lit(1)).as("n_chunks"))
      .join(toks, "doc_id").cache()
    assert(per.count() == toks.count(), "every doc chunks")
    assert(per.filter(col("first_s") =!= 1).count() == 0)
    assert(per.filter(col("max_w") > w).count() == 0)
    assert(per.filter(col("n") > 0 && col("last_end") =!= col("n")).count() == 0,
      "anchored final window must end at the last BPE token")
    assert(per.filter(col("n") <= w && col("n_chunks") =!= 1).count() == 0)
    // BPE tokens outnumber words (merges start from characters), so the
    // real bill produces at least as many chunks in total as the word proxy
    val bpeChunks = chunks.count()
    val wordChunks = Packing.chunkDocuments(spark, sf, w, stride).count()
    assert(bpeChunks >= wordChunks,
      s"real token bill must not under-chunk: $bpeChunks vs $wordChunks")
  }

  test("next-fit wastes less budget than pathological and beats doc-per-pack") {
    val p = Packing.packNextFit(spark, sf).collect()
    val nPacks = p.map(_.getAs[String]("pack_key")).distinct.length
    val nDocs = p.length
    assert(nPacks < nDocs, "packing must actually combine documents")
  }
}
