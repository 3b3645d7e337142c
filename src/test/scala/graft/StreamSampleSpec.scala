package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling
import graft.streaming.StreamSample
import java.nio.file.Files

/** Ingest-time budget sampling: stream replay → per-batch candidate
  * top-ks → idempotent TxTable MERGE → assembled sample ≡ the batch
  * sampler over every ingested doc ROW-FOR-ROW (k-smallest of a union =
  * k-smallest of per-batch k-smallests — selection is a pure function of
  * the doc set, so order/batching cannot matter). */
class StreamSampleSpec extends AnyFunSuite {
  import SparkTestSession._

  private val Budget = 37 // not a divisor of anything meaningful — an
                          // arbitrary budget exercises both capped and
                          // uncapped languages

  private def docs = Tables.documents(spark, sf)
    .select("doc_id", "lang", "text")

  private def sampleSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
    df.select(col("lang"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

  test("streamed candidates assemble to the exact batch sample; replay converges") {
    val root = Files.createTempDirectory("stream_sample").toString
    // three drops as three files in ONE source dir; maxFilesPerTrigger=1
    // forces three real micro-batches (the StreamSketchSpec harness)
    Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    (0 to 2).foreach { i =>
      docs.filter(col("doc_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$root/tmp_$i")
      val part = new java.io.File(s"$root/tmp_$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$root/in/drop_$i.parquet"))
    }
    val table = s"$root/sample"
    StreamSample.sampleStreamTx(spark, s"$root/in", table, s"$root/ckpt",
      budget = Budget)
    val streamed = sampleSet(StreamSample.readSample(spark, table, Budget))
    val batch = sampleSet(Sampling.budgetSample(spark, sf, Budget))
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed sample diverged: ${streamed.size} vs ${batch.size}")
    // the candidate table is bounded: ≤ budget per language PER BATCH
    val cands = serve.TxTable.read(spark, table)
    val maxPerLang = cands.groupBy("lang").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxPerLang <= Budget * 3L,
      s"candidate table grew past budget × batches: $maxPerLang")
    // replay from a fresh checkpoint: candidates overwrite by
    // (lang, doc_id) with identical content — the sample is unchanged
    StreamSample.sampleStreamTx(spark, s"$root/in", table, s"$root/ckpt2",
      budget = Budget)
    val replayed = sampleSet(StreamSample.readSample(spark, table, Budget))
    assert(replayed == streamed)
    assert(cands.count() ==
      cands.select("lang", "doc_id").distinct().count(),
      "replay must not duplicate candidate rows")
  }

  test("per-language allocation of the assembled sample is least(budget, n)") {
    val root = Files.createTempDirectory("stream_sample_alloc").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$root/in")
    val table = s"$root/sample"
    StreamSample.sampleStreamTx(spark, s"$root/in", table, s"$root/ckpt",
      budget = Budget)
    val got = StreamSample.readSample(spark, table, Budget)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> math.min(Budget.toLong, r.getLong(1))).toMap
    assert(got == want, s"allocation drift: $got vs $want")
  }

  test("the (budget, seed) sidecar guards the streamed ≡ batch contract") {
    val root = Files.createTempDirectory("stream_sample_guard").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$root/in")
    val table = s"$root/sample"
    StreamSample.sampleStreamTx(spark, s"$root/in", table, s"$root/ckpt",
      budget = Budget)
    assert(StreamSample.storedParams(spark, table).contains((Budget, 42)))
    // a SMALLER read budget under the streamed seed stays exact (the
    // budget'-smallest of the union is inside each batch's budget-smallest)
    val smaller = sampleSet(StreamSample.readSample(spark, table, Budget - 5))
    val batchSmaller = sampleSet(Sampling.budgetSample(spark, sf, Budget - 5))
    assert(smaller == batchSmaller)
    // a larger budget needs candidates the stream already discarded
    intercept[IllegalArgumentException] {
      StreamSample.readSample(spark, table, Budget + 1)
    }
    // a different seed would re-rank candidates selected under the old order
    intercept[IllegalArgumentException] {
      StreamSample.readSample(spark, table, Budget, seed = 7)
    }
    // a re-stream into the same table with different params refuses before
    // any commit could mix two selection orders
    intercept[IllegalArgumentException] {
      StreamSample.sampleStreamTx(spark, s"$root/in", table, s"$root/ckpt3",
        budget = Budget + 1)
    }
  }

  test("losing the sidecar publish race re-checks the winner's params immediately") {
    import org.apache.hadoop.fs.{FileSystem, Path}
    def planting(budget: Int, seed: Int,
        hash: String = StreamSample.RankHashId): (FileSystem, Path, Path) => Boolean =
      (fs, _, p) => {
        // simulate the exact race interleaving: a concurrent first-stream
        // published its sidecar between our existence check and our rename
        val out = fs.create(p, true)
        try out.write(s"budget=$budget\nseed=$seed\nhash=$hash\n".getBytes("UTF-8"))
        finally out.close()
        false
      }
    // conflicting winner: the loser must refuse NOW, not on the next call
    val dir1 = Files.createTempDirectory("sample_race1").toString
    val e = intercept[IllegalArgumentException] {
      StreamSample.recordParams(spark, dir1, 50, 42, planting(7, 9))
    }
    assert(e.getMessage.contains("budget=7"))
    // identical winner: the lost race is benign — proceed without error
    val dir2 = Files.createTempDirectory("sample_race2").toString
    StreamSample.recordParams(spark, dir2, 50, 42, planting(50, 42))
    assert(StreamSample.storedParams(spark, dir2).contains((50, 42)))
    // publish that keeps failing with nothing readable: bounded loud refusal
    val dir3 = Files.createTempDirectory("sample_race3").toString
    val e3 = intercept[IllegalArgumentException] {
      StreamSample.recordParams(spark, dir3, 50, 42, (_, _, _) => false)
    }
    assert(e3.getMessage.contains("unpinned"))
  }

  test("a pre-r15 sidecar (xxhash64 rank order) is refused, not re-ranked") {
    import org.apache.hadoop.fs.{FileSystem, Path}
    // same (budget, seed) but the OLD hash id — the r15 rank-hash switch
    // means those candidates were selected under a different total order;
    // both the appender and the reader must refuse loudly
    def plantingOld: (FileSystem, Path, Path) => Boolean =
      (fs, _, p) => {
        val out = fs.create(p, true)
        try out.write("budget=50\nseed=42\nhash=xxhash64\n".getBytes("UTF-8"))
        finally out.close()
        false
      }
    val dir = Files.createTempDirectory("sample_oldhash").toString
    val e = intercept[IllegalArgumentException] {
      StreamSample.recordParams(spark, dir, 50, 42, plantingOld)
    }
    assert(e.getMessage.contains("xxhash64"))
    val e2 = intercept[IllegalArgumentException] {
      StreamSample.readSample(spark, dir, 50)
    }
    assert(e2.getMessage.contains("sample of a sample"))
    // a field-less sidecar (earliest generation) reads as xxhash64 too
    def plantingNoField: (FileSystem, Path, Path) => Boolean =
      (fs, _, p) => {
        val out = fs.create(p, true)
        try out.write("budget=50\nseed=42\n".getBytes("UTF-8"))
        finally out.close()
        false
      }
    val dir2 = Files.createTempDirectory("sample_nofield").toString
    val eN = intercept[IllegalArgumentException] {
      StreamSample.recordParams(spark, dir2, 50, 42, plantingNoField)
    }
    assert(eN.getMessage.contains("xxhash64"))
  }

  test("a candidate table with NO sidecar at all is refused, never re-ranked") {
    // pre-sidecar streams left candidates with nothing to verify against —
    // r14 read them unguarded; r15 refuses (the rows were top-k'd under the
    // old rank order, so a re-read is a sample of a sample by construction)
    val root = Files.createTempDirectory("sample_nosidecar").toString
    val table = s"$root/sample"
    graft.serve.TxTable.write(spark,
      spark.createDataFrame(Seq((1L, "en"), (2L, "fr")))
        .toDF("doc_id", "lang"), table)
    val e = intercept[IllegalArgumentException] {
      StreamSample.readSample(spark, table, 50)
    }
    assert(e.getMessage.contains("no _sample_params sidecar"))
    // and stamping FRESH params over the old-order rows is refused too
    val e2 = intercept[IllegalArgumentException] {
      StreamSample.recordParams(spark, table, 50, 42)
    }
    assert(e2.getMessage.contains("refusing to stamp fresh params"))
    // an empty/nonexistent table path stays unguarded (fresh first stream)
    StreamSample.recordParams(spark, s"$root/fresh", 50, 42)
    assert(StreamSample.storedParams(spark, s"$root/fresh").contains((50, 42)))
  }

  test("a pre-seeded EMPTY table is fresh, not a refused pre-sidecar stream") {
    // the StreamMv idiom: seed a zero-row commit to fix the schema before
    // streaming. Zero rows were selected under any rank order, so there is
    // nothing a re-rank could corrupt — refusing with "re-stream the
    // source" would be a misleading dead end (r16, ADVICE)
    val root = Files.createTempDirectory("sample_emptyseed").toString
    val table = s"$root/sample"
    graft.serve.TxTable.write(spark,
      spark.createDataFrame(Seq.empty[(Long, String)]).toDF("doc_id", "lang"),
      table)
    // readSample on the empty seed is unguarded and returns nothing
    assert(StreamSample.readSample(spark, table, 50).isEmpty)
    // and stamping fresh params over it succeeds — it IS a fresh table
    StreamSample.recordParams(spark, table, 50, 42)
    assert(StreamSample.storedParams(spark, table).contains((50, 42)))
  }
}
