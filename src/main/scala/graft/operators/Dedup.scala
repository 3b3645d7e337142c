package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoders
import graft.Tables
import graft.functions.TextFunctions.{normText, tokens}

/** Document deduplication for a training-data pipeline, at the scales an LLM
  * corpus needs: exact (hash group-by), MinHash+LSH (shingle → minhash →
  * band → bucket join → verify), SimHash (64-bit + chunk-banded hamming
  * search), and n-gram Jaccard.
  *
  * Scale design (100 TB): every stage is a hash shuffle on a key with
  * near-uniform distribution (hashed shingles / band signatures), so no
  * skew; candidate generation only ever self-joins *bucketed* rows, never
  * all-pairs; verification runs only on LSH survivors. All hashing is the
  * codegen'd PORTABLE polynomial family (`HashExpressions` — native
  * expressions, no UDF in the hot path; since r16 MinHash shares it with
  * SimHash, so the whole LSH pipeline is recomputable by the DuckDB
  * oracle in HUGEINT mod-2^64 arithmetic). The only non-SQL kernel is the
  * SimHash bit-vote, a typed `Aggregator` (partial-aggregable, map-side
  * combinable).
  */
object Dedup {

  // ------------------------------------------------------------ exact
  /** Exact dedup via hash group-by on normalized text: one shuffle keyed by
    * md5; keeps the smallest doc_id per group (deterministic winner). */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(normText(col("text"))).as("text_md5"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))

  val exactSql: String =
    """SELECT md5(LOWER(TRIM(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')))) AS text_md5,
      |       MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY 1""".stripMargin

  // ------------------------------------------------------------ shingling
  /** Word n-gram shingles as an array column; docs shorter than n shingle to
    * the whole text. Guarded so `sequence` never sees a negative bound. */
  def shingleArr(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Hashed token-n-gram array for one text column — a pure expression
    * (row-local, streaming-safe), shared by the batch inverted index and
    * the ingest-time signature probe. Hashes the n token columns DIRECTLY
    * (per-token hash + windowed long-fold) instead of materializing
    * shingle strings first — skipping the concat_ws string build halved
    * the dominant pipeline stage (8.1 s → ~4 s at sf0.1,
    * tools/ProfileDedup). Since r16 the hash family is the PORTABLE
    * polynomial combiner (`HashExpressions.poly_combine` over
    * `poly_token_hash` values — the SimHash precedent) instead of
    * xxhash64: exact HUGEINT mod-2^64 arithmetic in DuckDB, which is what
    * upgrades the whole MinHash-LSH family from precision/recall brackets
    * to full hash oracles. `shingleArr` remains the string-shingle API. */
  def shingleHashArr(c: Column, n: Int = 3): Column =
    shingleHashArrOfToks(tokens(c), n)

  /** The same windowed hash over an ALREADY-ALIASED token-array column.
    * Interpreted lambdas get no subexpression elimination, so every
    * `element_at(…)` inside the window transform re-evaluates its
    * argument subtree — passing `tokens(text)` inline re-tokenizes
    * O(n·windows) times per row, and an inline per-token-hash transform
    * would re-hash O(n·windows) too. Hot paths stage the tokenizer
    * through its own aliased projection and pass that column here (the
    * multiply-referenced-alias rule, cf. `bandSignatureRows`); the
    * per-token hash is then applied inside the window (each token hashed
    * ≤ n times — the char-fold is the cheap part; the staging that
    * mattered was the tokenizer's regex normalization). */
  def shingleHashArrOfToks(toks: Column, n: Int = 3): Column = {
    import graft.functions.HashExpressions.{poly_combine, poly_token_hash}
    when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => poly_combine(
            (0 until n).map(j => poly_token_hash(element_at(toks, i + j))): _*)))
      .otherwise(array(poly_token_hash(concat_ws(" ", toks))))
  }

  /** (doc_id, shingle_hash) — exploded, distinct per doc. */
  private def docShingles(spark: SparkSession, dir: String, n: Int = 3): DataFrame =
    Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("__toks"))
      .select(col("doc_id"), explode(shingleHashArrOfToks(col("__toks"), n)).as("sh"))
      .distinct()

  /** Per-slot XOR masks: (slot+1)·φ₆₄ (golden-ratio constant), natural
    * Long wraparound — odd, well-spread, derivable in DuckDB HUGEINT
    * arithmetic. `lazy`: NumHashes is declared further down this object
    * (init order). */
  private[operators] lazy val SlotMasks: IndexedSeq[Long] =
    (0 until NumHashes).map(i => (i + 1) * 0x9E3779B97F4A7C15L)

  /** THE per-slot MinHash scheme — single definition so the batch
    * aggregation path and the row-local probe path can never diverge
    * (dedupProbe recall against stored indexes depends on equality).
    * Portable since r16: h_i(sh) = (sh ⊕ mask_i)·MIX mod 2^64 — the
    * multiply-xor family. The XOR must precede the odd multiply: an
    * ADDITIVE slot term ((sh·B + slot)·MIX, the first r16 cut) is affine
    * in sh with a multiplier SHARED across slots, making the 16 slots
    * mere rotations of one circular order (correlated agreement on
    * adversarial corpora); XOR perturbs the multiplicand's bits, so each
    * mask yields a genuinely different post-multiply order. The exact
    * verify downstream never trusts the estimate, but est_jaccard and
    * banding recall deserve a real hash family. */
  private def slotHash(sh: Column, slot: Int): Column =
    graft.functions.HashExpressions.poly_finish(
      sh.bitwiseXOR(lit(SlotMasks(slot))))

  // ------------------------------------------------------------ MinHash/LSH
  val NumHashes = 16
  val NumBands = 4 // 4 rows per band ⇒ s-curve threshold ≈ (1/4)^(1/4) ≈ 0.71

  /** Per-doc MinHash signature: k independent hash slots, each the min of
    * xxhash64(shingle_hash, slot) over the doc's shingles. One hash shuffle
    * keyed by doc_id; k mins computed map-side (partial agg). */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    signaturesFromShingles(docShingles(spark, dir))

  def signaturesFromShingles(sh: DataFrame): DataFrame = {
    val aggs = (0 until NumHashes).map(i =>
      min(slotHash(col("sh"), i)).as(s"h$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Band signatures per doc: one (doc_id, band, sig) row per band — the
    * LSH bucket key. Shared by the self-join candidate search and the
    * incremental index-probe search. */
  def bandedSignatures(sigs: DataFrame): DataFrame = {
    val bands = (0 until NumBands).map { b =>
      val cols = (0 until NumHashes / NumBands).map(r => col(s"h${b * (NumHashes / NumBands) + r}"))
      struct(lit(b).as("band"),
        graft.functions.HashExpressions.poly_combine(cols: _*).as("sig"))
    }
    sigs
      .select(col("doc_id"), explode(array(bands: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** LSH candidate pairs: docs sharing any band signature. Bucket join on
    * (band, band_sig) — never all-pairs. */
  def minhashCandidates(sigs: DataFrame): DataFrame = {
    val banded = bandedSignatures(sigs)
    val l = banded.alias("l")
    val r = banded.alias("r")
    l.join(r,
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** Estimated Jaccard from signature agreement (the cheap LSH-side check). */
  def estimateJaccard(sigs: DataFrame, cands: DataFrame): DataFrame = {
    val sigArr = sigs.select(col("doc_id"),
      array((0 until NumHashes).map(i => col(s"h$i")): _*).as("sig"))
    cands
      .join(sigArr.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sig", "sig_a"), "doc_a")
      .join(sigArr.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sig", "sig_b"), "doc_b")
      .withColumn("est_jaccard",
        round(aggregate(zip_with(col("sig_a"), col("sig_b"),
          (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / NumHashes, 6))
      .select("doc_a", "doc_b", "est_jaccard")
  }

  /** Exact n-gram Jaccard on candidate pairs only (the expensive verify,
    * gated behind LSH): join each side's shingle set, intersection/union by
    * counting. */
  def exactJaccard(spark: SparkSession, dir: String, cands: DataFrame,
      n: Int = 3): DataFrame =
    exactJaccardFromShingles(docShingles(spark, dir, n).cache(), cands)

  def exactJaccardFromShingles(sh: DataFrame, cands: DataFrame): DataFrame = {
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val sa = sh.toDF("da", "sha")
    val sb = sh.toDF("db", "shb")
    val inter = cands
      .join(sa, col("doc_a") === col("da"))
      .join(sb, col("doc_b") === col("db") && col("sha") === col("shb"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    cands
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        round(col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")).cast("double"), 6))
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Full MinHash-LSH near-dup pipeline: signature → band-bucket candidates
    * → estimate → exact verify. Emits verified pairs with jaccard ≥ 0.7.
    * Signatures and candidates feed three downstream joins, so they are
    * cached — without it the whole shingle pipeline re-executes per use.
    * Deliberately NOT unpersisted: CacheManager keys entries by analyzed
    * plan, so the dedup/cluster/curation queries of one session all share
    * these entries; an eager unpersist would force each query to recompute
    * the pipeline. Bounded by session lifetime (Verify/Bench runs). */
  def minhashNearDups(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingles(spark, dir).cache()
    val sigs = signaturesFromShingles(sh).cache()
    val cands = minhashCandidates(sigs).cache()
    val est = estimateJaccard(sigs, cands)
    val exact = exactJaccardFromShingles(sh, cands)
    // cache the verified pair set too (few hundred rows): it feeds six
    // consumers (the two dedup queries, clustering, curation, split
    // contamination, the recall and cluster invariants), each of which
    // would otherwise redo the est+verify joins — the in-session analogue
    // of the stored near-dup pair table an ingest pipeline keeps at scale
    // (same policy as ngramJaccardPairs' cached output below)
    est.join(exact, Seq("doc_a", "doc_b"))
      .filter(col("jaccard") >= 0.7)
      .select("doc_a", "doc_b", "est_jaccard", "jaccard")
      .cache()
  }

  /** Row-local MinHash band signatures — NO shuffle: each min-hash slot is
    * `array_min` over the row's shingle-hash array, so signatures compute
    * inside a projection. Values are IDENTICAL to the batch
    * `signaturesFromShingles` path (min over duplicates == min over
    * distinct). Because it is stateless and shuffle-free it is
    * streaming-safe: the ingest path computes signatures as events arrive. */
  def bandSignatureRows(df: DataFrame, docIdCol: String, textCol: String): DataFrame = {
    // materialize the shingle array in its OWN projection: lambda-bearing
    // expressions are excluded from Spark's subexpression elimination, so
    // inlining shingleHashArr into all 16 slots would tokenize+hash each
    // row 16×; a multiply-referenced non-cheap alias survives
    // CollapseProject and is computed once
    val withArr = df.select(col(docIdCol).as("doc_id"),
        tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), shingleHashArrOfToks(col("__toks")).as("__sh_arr"))
    val slots = (0 until NumHashes).map(i =>
      array_min(transform(col("__sh_arr"), s => slotHash(s, i))).as(s"h$i"))
    bandedSignatures(withArr.select((col("doc_id") +: slots): _*))
  }

  /** Ingest-time dedup probe: band signatures of incoming documents
    * (row-local) joined against a STATIC stored LSH index — a stateless
    * stream-static join, so it runs unchanged on a batch DataFrame or a
    * readStream. Emits one row per (new doc, index doc, band) bucket
    * collision; exact verification happens downstream on the candidates. */
  def dedupProbe(newDocs: DataFrame, staticIndex: DataFrame): DataFrame =
    bandSignatureRows(newDocs, "doc_id", "text")
      .withColumnRenamed("doc_id", "new_id")
      .join(staticIndex, Seq("band", "sig"))
      .select(col("new_id"), col("doc_id").as("index_id"), col("band"))

  /** Incremental near-dup detection — a NEW batch probed against an
    * EXISTING corpus index, skipping the batch×batch and index×index work a
    * self-join would redo. This is the daily-ingest form of LSH dedup: at
    * scale the index side's band signatures are precomputed and stored
    * (partitioned by (band, sig) — the LSH index table); an ingest bands
    * only the new documents and bucket-joins into the stored index, then
    * exact-verifies the survivors. Here the split is simulated
    * deterministically (even doc_id = index, odd = new batch) on the same
    * cached shingle/signature pipeline the batch path uses.
    *
    * Output: (index_id, new_id, jaccard) for verified pairs ≥ 0.7. */
  def minhashNearDupsIncremental(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingles(spark, dir).cache()
    val sigs = signaturesFromShingles(sh).cache()
    val banded = bandedSignatures(sigs)
    val idx = banded.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(col("doc_id").as("doc_a"), col("band"), col("sig"))
    val fresh = banded.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id").as("doc_b"), col("band"), col("sig"))
    val cands = idx.join(fresh, Seq("band", "sig"))
      .select("doc_a", "doc_b").distinct()
    // cache the verified incremental pair set (dozens of rows): like the
    // batch pair table above it is what an ingest MATERIALIZES (the new
    // batch's near-dup links), and it has two registered consumers —
    // q_dedup_incremental and the q_incremental_consistency audit, which
    // would otherwise each redo the probe's bucket join + exact verify
    // (policy (a): warm-touched by the bench in the same commit)
    exactJaccardFromShingles(sh, cands)
      .filter(col("jaccard") >= 0.7)
      .select(col("doc_a").as("index_id"), col("doc_b").as("new_id"), col("jaccard"))
      .cache()
  }

  // --------------------------------------------- stored-index hash stamp
  /** Identifier of the LSH hash family THIS build signs and probes with:
    * portable polynomial shingles + xor-mask slot hashes (r16). A stored
    * index's signatures are meaningless to a probe built under a
    * different family — the bucket join simply never collides, which
    * reads as "0 near-dups" (silent false-clean dedup), not as an error.
    * Every path-based producer stamps `_lsh_hash` beside the index and
    * every path-based probe refuses a missing/mismatched stamp (the
    * StreamSample `_sample_params` precedent from the r15 rank-hash
    * switch). Frame-based probes ([[dedupProbe]],
    * `StreamCurate.curateGate`) take the index as a DataFrame and cannot
    * check a sidecar — their contract is that the caller materialized the
    * frame through this build's [[bandSignatureRows]], or read it from a
    * path the stamped entry points vetted. */
  private[graft] val LshHashId: String = "poly-xs"

  private def lshStampPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_lsh_hash")

  private def lshFs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  private def readLshStamp(spark: SparkSession, path: String): Option[String] = {
    val fs = lshFs(spark, path)
    val p = lshStampPath(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      Some((try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()).trim)
    }
  }

  private def stampLshIndex(spark: SparkSession, path: String): Unit = {
    val fs = lshFs(spark, path)
    val out = fs.create(lshStampPath(path), true)
    try out.write((LshHashId + "\n").getBytes("UTF-8")) finally out.close()
  }

  private def requireLshStamp(spark: SparkSession, path: String): Unit = {
    val got = readLshStamp(spark, path)
    require(got.contains(LshHashId),
      s"LSH index at $path was built under hash family " +
      s"'${got.getOrElse("pre-r16 xxhash64 (no _lsh_hash stamp)")}' but this " +
      s"build probes with '$LshHashId': the bucket join would silently " +
      "return zero candidates (false-clean dedup) — rebuild the index with " +
      "writeLshIndex/appendLshIndexTx")
  }

  /** Materialize the corpus' LSH index as a parquet table (band, sig,
    * doc_id) partitioned by band — the STORED form of the index that
    * `minhashNearDupsIncremental` simulates in-memory. At 100 TB this table
    * is ~NumBands rows per document (tiny next to the corpus), is appended
    * per ingest, and partition-prunes on band at probe time. Overwrite
    * semantics ⇒ the hash stamp is (re)written unconditionally. */
  def writeLshIndex(spark: SparkSession, dir: String, path: String,
      docFilter: Column = lit(true)): Unit = {
    bandSignatureRows(
      Tables.spread(spark, Tables.documents(spark, dir)).filter(docFilter),
      "doc_id", "text")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("band").parquet(path)
    stampLshIndex(spark, path)
  }

  /** The TRANSACTIONAL form of the stored index: the same (band, sig,
    * doc_id) rows MERGE-committed into a TxTable keyed by (doc_id, band).
    * This is what "appended per ingest" (the claim the plain-parquet
    * `writeLshIndex` docs make) actually looks like in production:
    *  - each ingest batch is ONE atomic commit — readers/probes always see
    *    a consistent snapshot, never a half-written batch;
    *  - keyed by (doc_id, band), re-ingesting a document is an idempotent
    *    upsert of its NumBands rows (a re-crawled page replaces its old
    *    signatures instead of duplicating buckets);
    *  - the merge's stats pre-filter prunes untouched index files, so an
    *    append costs O(batch), not O(index);
    *  - vacuum / compaction / the change feed come with the format.
    * Probe-side, [[nearDupsFromTxIndex]] reads a snapshot of this table —
    * same candidates, same verify as the parquet path. */
  def appendLshIndexTx(spark: SparkSession, dir: String, path: String,
      docFilter: Column = lit(true)): Long = {
    // appending into rows signed under another hash family would mix two
    // incompatible signature spaces in one table — refuse like a probe
    // would (a FRESH/empty table is stamped and written)
    val hadRows = graft.serve.TxTable.latestVersion(spark, path).isDefined &&
      !graft.serve.TxTable.read(spark, path).isEmpty
    if (hadRows) requireLshStamp(spark, path)
    val v = graft.serve.TxTable.merge(spark,
      bandSignatureRows(
        Tables.spread(spark, Tables.documents(spark, dir)).filter(docFilter),
        "doc_id", "text"),
      path, Seq("doc_id", "band"))
    // a table with NO prior rows may still carry a STALE foreign-family
    // stamp (e.g. a truncated legacy index): with no rows to protect, the
    // batch just written defines the family — overwrite unconditionally,
    // else a valid index would dead-end every later probe (r16 ADVICE)
    if (!hadRows || readLshStamp(spark, path).isEmpty) stampLshIndex(spark, path)
    v
  }

  /** The shared probe→verify tail of every stored-index form: bucket-join
    * the new batch into `index`, then exact-verify the colliding pairs
    * against the corpus text. ONE copy, so the TxTable and parquet index
    * paths cannot drift in verify semantics (threshold, caching, output
    * contract) — the parity their specs pin. */
  private def verifyAgainstIndex(spark: SparkSession, dir: String,
      index: DataFrame, newDocs: DataFrame, threshold: Double): DataFrame = {
    val cands = dedupProbe(newDocs, index)
      .select(col("index_id").as("doc_a"), col("new_id").as("doc_b"))
      .distinct()
    exactJaccardFromShingles(docShingles(spark, dir).cache(), cands)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a").as("index_id"), col("doc_b").as("new_id"),
        col("jaccard"))
  }

  /** [[nearDupsFromStoredIndex]] against a TxTable snapshot (latest by
    * default) instead of raw parquet. */
  def nearDupsFromTxIndex(spark: SparkSession, dir: String,
      indexPath: String, newDocs: DataFrame, threshold: Double = 0.7,
      version: Option[Long] = None): DataFrame = {
    requireLshStamp(spark, indexPath)
    verifyAgainstIndex(spark, dir,
      graft.serve.TxTable.read(spark, indexPath, version), newDocs, threshold)
  }

  /** The stored-index form of incremental dedup: band the NEW batch
    * row-locally, bucket-join into the PERSISTED index (no index-side
    * signature recompute — the operator's whole point), then exact-verify
    * the colliding pairs by re-reading only those docs' text from the
    * corpus. Output matches `minhashNearDupsIncremental` exactly when the
    * stored index covers the same split (row-local signatures ≡ batch
    * signatures, so the candidate sets are identical). */
  def nearDupsFromStoredIndex(spark: SparkSession, dir: String,
      indexPath: String, newDocs: DataFrame,
      threshold: Double = 0.7): DataFrame = {
    requireLshStamp(spark, indexPath)
    verifyAgainstIndex(spark, dir, spark.read.parquet(indexPath), newDocs,
      threshold)
  }

  /** Per-doc dedup summary — total-coverage view (one row per doc even when
    * it has no near-dup), so downstream keep/drop decisions are a single
    * anti-join. */
  def minhashSummary(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id")
    val pairs = minhashNearDups(spark, dir)
    val partners = pairs.select(col("doc_a").as("doc_id"), col("doc_b").as("partner"), col("jaccard"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"), col("doc_a").as("partner"), col("jaccard")))
    val agg = partners.groupBy("doc_id")
      .agg(count(lit(1)).as("n_near_dups"), max("jaccard").as("max_jaccard"),
        min("partner").as("min_partner"))
    docs.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"),
        coalesce(col("max_jaccard"), lit(0.0)).as("max_jaccard"),
        col("min_partner"))
  }

  // ------------------------------------------- MinHash DuckDB oracles (r16)
  /** The full MinHash-LSH pipeline re-derived in DuckDB — possible since
    * the hash family is the portable polynomial combiner: tokens →
    * per-token hash (char fold × finisher, `polyMixSql`) → windowed
    * 3-token fold (the `poly_combine` twin) → per-slot min of
    * (sh·B + slot)·MIX under SIGNED order (matching Spark's min over
    * Long) → band fold over 4 slot values → bucket-join candidates →
    * signature-agreement estimate → exact shingle-set verify at 0.7.
    * `candSql` parameterizes the candidate join (self-join for the batch
    * pipeline, even→odd for the incremental probe). Every arithmetic step
    * is HUGEINT mod 2^64 — bit-identical to the codegen'd expressions.
    *
    * PRECONDITION (pinned in OperatorsSpec's oracle-precondition test):
    * document text is non-NULL — a NULL text would leave `len(ths)` NULL
    * in both UNION branches (doc omitted here) while Spark's
    * when/otherwise hashes the empty concat (doc present). */
  private[operators] def minhashSqlCtes(candSql: String): String = {
    import graft.functions.TextFunctions.{polyFinishSql, polyMixSql,
      polyStepSql, tokListCteSql, unsignedSql, wrapSignedSql}
    val sh3 = polyFinishSql(polyStepSql(
      polyStepSql("ths[i]", "ths[i+1]"), "ths[i+2]"))
    // (slot+1)·φ₆₄ mod 2^64 — the unsigned twin of SlotMasks; xor of two
    // sub-2^64 HUGEINTs never touches the high bits, so the 128-bit xor
    // equals the Java 64-bit one bit for bit
    val maskU = """(((i + 1)::HUGEINT * 11400714819323198485::HUGEINT)
                  |        % 18446744073709551616::HUGEINT)""".stripMargin
    val slotH = polyFinishSql(s"xor(sh, $maskU)")
    val bandH = polyFinishSql(polyStepSql(polyStepSql(polyStepSql(
      unsignedSql("hs[4*b + 1]"), unsignedSql("hs[4*b + 2]")),
      unsignedSql("hs[4*b + 3]")), unsignedSql("hs[4*b + 4]")))
    s"""$tokListCteSql,
       |thl AS (
       |  SELECT doc_id, toks,
       |    list_transform(toks, t -> ${polyMixSql("t")}) AS ths
       |  FROM toklist),
       |shing AS (
       |  SELECT DISTINCT doc_id, sh FROM (
       |    SELECT doc_id, UNNEST(list_transform(range(1, len(ths) - 1),
       |      i -> $sh3)) AS sh
       |    FROM thl WHERE len(ths) >= 3
       |    UNION ALL
       |    SELECT doc_id, ${polyMixSql("array_to_string(toks, ' ')")} AS sh
       |    FROM thl WHERE len(ths) < 3) u),
       |mslots AS (
       |  SELECT doc_id, i AS slot, MIN(${wrapSignedSql(slotH)}) AS h
       |  FROM shing CROSS JOIN (SELECT UNNEST(range(0, 16)) AS i) sl
       |  GROUP BY 1, 2),
       |sigl AS (SELECT doc_id, list(h ORDER BY slot) AS hs FROM mslots GROUP BY 1),
       |mbands AS (
       |  SELECT doc_id, b, ${wrapSignedSql(bandH)} AS sig
       |  FROM sigl CROSS JOIN (SELECT UNNEST(range(0, 4)) AS b) bb),
       |mcands AS ($candSql),
       |mest AS (
       |  SELECT c.doc_a, c.doc_b,
       |    ROUND(CAST(len(list_filter(range(1, 17), i -> a.hs[i] = b.hs[i]))
       |          AS DOUBLE) / 16, 6) AS est_jaccard
       |  FROM mcands c
       |  JOIN sigl a ON a.doc_id = c.doc_a
       |  JOIN sigl b ON b.doc_id = c.doc_b),
       |mcnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM shing GROUP BY 1),
       |minter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
       |  FROM mcands c
       |  JOIN shing sa ON sa.doc_id = c.doc_a
       |  JOIN shing sb ON sb.doc_id = c.doc_b AND sa.sh = sb.sh
       |  GROUP BY 1, 2),
       |mpairs AS (
       |  SELECT * FROM (
       |    SELECT e.doc_a, e.doc_b, e.est_jaccard,
       |      ROUND(COALESCE(n_inter, 0)
       |            / CAST(ca.n_sh + cb.n_sh - COALESCE(n_inter, 0) AS DOUBLE),
       |            6) AS jaccard
       |    FROM mest e
       |    LEFT JOIN minter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
       |    JOIN mcnt ca ON ca.doc_id = e.doc_a
       |    JOIN mcnt cb ON cb.doc_id = e.doc_b) v
       |  WHERE jaccard >= 0.7)""".stripMargin
  }

  private[operators] val minhashSelfCandSql: String =
    """SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      |  FROM mbands l JOIN mbands r
      |    ON l.b = r.b AND l.sig = r.sig AND l.doc_id < r.doc_id""".stripMargin

  /** DuckDB oracle for [[minhashNearDups]]. */
  val minhashPairsSql: String =
    s"""WITH ${minhashSqlCtes(minhashSelfCandSql)}
       |SELECT doc_a, doc_b, est_jaccard, jaccard FROM mpairs""".stripMargin

  /** DuckDB oracle for [[minhashSummary]] — the same pair set folded to
    * the per-document total-coverage view. */
  val minhashSummarySql: String =
    s"""WITH ${minhashSqlCtes(minhashSelfCandSql)},
       |partners AS (
       |  SELECT doc_a AS doc_id, doc_b AS partner, jaccard FROM mpairs
       |  UNION ALL
       |  SELECT doc_b, doc_a, jaccard FROM mpairs),
       |pagg AS (
       |  SELECT doc_id, COUNT(*) AS n, MAX(jaccard) AS mj, MIN(partner) AS mp
       |  FROM partners GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(COALESCE(n, 0) AS BIGINT) AS n_near_dups,
       |  COALESCE(mj, 0.0) AS max_jaccard,
       |  mp AS min_partner
       |FROM documents d LEFT JOIN pagg USING (doc_id)""".stripMargin

  /** DuckDB oracle for [[minhashNearDupsIncremental]] — identical chain,
    * even-id index probed by odd-id batch (doc_ids are non-negative, so
    * DuckDB's C-style % equals Spark's pmod here). */
  val minhashIncrementalSql: String =
    s"""WITH ${minhashSqlCtes(
        """SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
          |  FROM mbands l JOIN mbands r ON l.b = r.b AND l.sig = r.sig
          |  WHERE l.doc_id % 2 = 0 AND r.doc_id % 2 = 1""".stripMargin)}
       |SELECT doc_a AS index_id, doc_b AS new_id, jaccard FROM mpairs""".stripMargin

  // ------------------------------------------------------------ SimHash
  /** 64-bit SimHash bit-vote aggregator over token hashes. Typed Aggregator
    * ⇒ partial-aggregable (map-side combine), the property that matters at
    * scale: per-doc state is a fixed 64-int vector regardless of doc size. */
  object SimHashAgg extends Aggregator[Long, Array[Int], Long] {
    override def zero: Array[Int] = new Array[Int](64)
    override def reduce(b: Array[Int], h: Long): Array[Int] = {
      var j = 0
      while (j < 64) { b(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1); j += 1 }
      b
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var j = 0
      while (j < 64) { a(j) += b(j); j += 1 }
      a
    }
    override def finish(b: Array[Int]): Long = {
      var sig = 0L; var j = 0
      while (j < 64) { if (b(j) > 0) sig |= (1L << j); j += 1 }
      sig
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
  }

  /** Portable 64-bit token hash for the SimHash bit-vote: TextFunctions'
    * polynomial fold (base 1e9+7) finished with one odd-constant multiply
    * (the xorshift* mixer 0x2545F4914F6CDD1D — chosen < 2^62 so the DuckDB
    * mirror's HUGEINT product of a mod-2^64 value stays inside INT128)
    * that spreads short-token entropy into the high bits (the bare fold
    * leaves sub-4-char tokens with biased top bits). Both steps are exact
    * HUGEINT mod-2^64 arithmetic in DuckDB — unlike xxhash64 — which is
    * what lets the whole SimHash family hash-oracle. Wraparound multiply
    * must live in Scala (ANSI mode throws on Long overflow in SQL
    * expressions). */
  private[graft] def portableTokenHash(s: String): Long =
    graft.functions.TextFunctions.polyHash(s) * 0x2545F4914F6CDD1DL

  /** Column form — since r6 the native codegen'd [[graft.functions
    * .PolyHash]] expression, bit-identical to [[portableTokenHash]] (the
    * prior Scala UDF paid a serde boundary per TOKEN on the SimHash and
    * feature-hash paths). */
  private[operators] def portableTokenHashCol(c: Column): Column =
    graft.functions.HashExpressions.poly_token_hash(c)

  /** Per-doc 64-bit SimHash over token hashes (frequency-weighted via token
    * multiplicity). Keys on [[portableTokenHash]] so signatures — and every
    * pair/summary derived from them — are recomputable by the DuckDB
    * oracle; swap in xxhash64 for a marginally faster but unverifiable
    * variant (the bit-vote only needs a deterministic, well-spread hash).
    *
    * r18: the bit-vote aggregation is DECLARATIVE — 64 conditional-sum
    * vote columns, signature assembled with constant-folded shifts —
    * instead of `udaf(SimHashAgg)`. Two reasons, both measured live:
    * (1) `udaf(...)`'s ScalaAggregator resolves FRESH encoder instances
    * per query, which fail the canonicalized `sameResult` comparison
    * CacheManager keys cache entries by — every construction silently
    * registered a NEW unpopulated cache entry for the signature/pair
    * frames, so the "cached, warm-touched" simhash family re-ran its full
    * pipeline on every bench call since it shipped (the r17 ADVICE
    * plan-identity fragility, caught by the r18 cache probe: sameResult
    * was false between two identical constructions); declarative
    * aggregates are canonically equal, so the sharing is real now.
    * (2) the ObjectHashAggregate the udaf forced becomes a codegen
    * HashAggregate with primitive long buffers (guide §4: built-in
    * expressions over opaque closures on the hot path). Bit j is set iff
    * its vote is STRICTLY positive — the SimHashAgg.finish rule;
    * [[SimHashAgg]] remains the pinned reference semantics
    * (PropertiesSpec merge-associativity; DedupSpec asserts declarative ≡
    * aggregator corpus-wide). */
  def simhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val votes = (0 until 64).map { j =>
      sum(when(shiftrightunsigned(col("th"), j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"v$j")
    }
    val sig = (0 until 64).map(j =>
        when(col(s"v$j") > 0L, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), portableTokenHashCol(col("tok")).as("th"))
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** Shared DuckDB CTE chain: tokens → portable token hash (polynomial
    * fold × golden-ratio finisher, HUGEINT mod 2^64) → per-(doc, bit)
    * votes → signature assembly (bit j set iff vote strictly positive —
    * the SimHashAgg.finish rule), wrapped to signed BIGINT. */
  private val simhashSqlCtes: String =
    s"""${graft.functions.TextFunctions.tokedCteSql},
      |th AS (
      |  SELECT doc_id,
      |    ${graft.functions.TextFunctions.polyMixSql("tok")} AS h
      |  FROM toked),
      |votes AS (
      |  SELECT doc_id, j,
      |    SUM(CASE WHEN ((h >> j) & 1::HUGEINT) = 1::HUGEINT THEN 1 ELSE -1 END) AS v
      |  FROM th, (SELECT UNNEST(range(0, 64)) AS j) js
      |  GROUP BY 1, 2),
      |sigs AS (
      |  SELECT doc_id,
      |    CAST(CASE WHEN su >= 9223372036854775808::HUGEINT
      |         THEN su - 18446744073709551616::HUGEINT ELSE su END AS BIGINT) AS simhash
      |  FROM (SELECT doc_id,
      |          SUM(CASE WHEN v > 0 THEN (1::HUGEINT << j) ELSE 0::HUGEINT END) AS su
      |        FROM votes GROUP BY doc_id)),
      |spairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      |  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3)""".stripMargin

  /** SimHash near-dups: band the 64-bit signature into 4×16-bit chunks (a
    * pair within hamming distance ≤ 3 must agree on ≥ 1 chunk — pigeonhole),
    * bucket-join per chunk, verify with bit_count(xor). The verified pair
    * set is cached like the minhash pair table above: it is what an ingest
    * materializes, and its two registered consumers (q_simhash_pairs, the
    * q_dedup_simhash summary) each redid the chunk self-join + distinct +
    * verify to reach the same dozens of rows (policy (a): warm-touched by
    * the bench in the same commit). */
  def simhashNearDups(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame =
    simhashNearDupsFromSigs(simhashSignatures(spark, dir), maxHamming).cache()

  def simhashNearDupsFromSigs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val chunked = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("chunk"),
          shiftrightunsigned(col("simhash"), j * 16).bitwiseAND(lit(0xFFFFL)).as("val"))): _*)).as("c"))
      .select(col("doc_id"), col("simhash"), col("c.chunk").as("chunk"), col("c.val").as("val"))
    val l = chunked.alias("l")
    val r = chunked.alias("r")
    l.join(r,
        col("l.chunk") === col("r.chunk") && col("l.val") === col("r.val") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        col("l.simhash").as("sig_a"), col("r.simhash").as("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Per-doc SimHash summary (total coverage, like minhashSummary). */
  def simhashSummary(spark: SparkSession, dir: String): DataFrame = {
    // one signature computation (cached) feeds both the pair search and the
    // final join — recomputing it was the costliest stage run twice; the
    // pair set itself is the cached shared artifact (see simhashNearDups)
    val sigs = simhashSignatures(spark, dir).cache()
    val pairs = simhashNearDups(spark, dir)
    // one explode instead of the two-branch union (r19, guide §2.4): the
    // cached pair set is scanned ONCE and each pair emits its two partner
    // rows row-locally — same multiset, same aggregate, one fewer scan
    // and no Union leg in the plan
    val agg = pairs
      .select(explode(array(
        struct(col("doc_a").as("doc_id"), col("hamming")),
        struct(col("doc_b").as("doc_id"), col("hamming")))).as("p"))
      .select(col("p.doc_id").as("doc_id"), col("p.hamming").as("hamming"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_near_dups"), min("hamming").as("min_hamming"))
    sigs.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("simhash"),
        coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"),
        col("min_hamming"))
  }

  /** DuckDB oracle for [[simhashNearDups]] (maxHamming 3): the banded
    * candidate search + hamming verify collapses to the direct pair sweep —
    * 4×16-bit chunk banding is COMPLETE for hamming ≤ 3 by pigeonhole, so
    * the two constructions emit identical pair sets. */
  val simhashNearDupsSql: String =
    s"""WITH $simhashSqlCtes
       |SELECT doc_a, doc_b, hamming FROM spairs""".stripMargin

  /** DuckDB oracle for [[simhashSummary]]: signatures + per-doc partner
    * counts/min-hamming over the same pair set. */
  val simhashSummarySql: String =
    s"""WITH $simhashSqlCtes,
       |partners AS (
       |  SELECT doc_a AS doc_id, hamming FROM spairs
       |  UNION ALL SELECT doc_b AS doc_id, hamming FROM spairs),
       |agg AS (
       |  SELECT doc_id, COUNT(*) AS n_near_dups, MIN(hamming) AS min_hamming
       |  FROM partners GROUP BY 1)
       |SELECT s.doc_id, s.simhash,
       |  CAST(COALESCE(a.n_near_dups, 0) AS BIGINT) AS n_near_dups,
       |  a.min_hamming
       |FROM sigs s LEFT JOIN agg a USING (doc_id)""".stripMargin

  // ------------------------------------------------------------ n-gram Jaccard
  /** Exact n-gram Jaccard via inverted-index self-join: pairs are generated
    * only for docs sharing ≥1 shingle (sparse by construction), with a
    * document-frequency cap dropping ultra-common shingles — the standard
    * guard that keeps the self-join skew-free at corpus scale (a shingle in
    * f docs contributes f² pair rows; capping f bounds the blow-up). */
  def ngramJaccardPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.5, n: Int = 3, dfCap: Int = 20): DataFrame = {
    val sh = jaccardShingles(spark, dir, n)
    // Candidate generation on the df-capped index ONLY; the reported jaccard
    // is then exact over the FULL shingle sets (same candidates→exact-verify
    // split as the MinHash path). Mixing a capped intersection with uncapped
    // denominators would systematically underestimate pairs that share
    // common shingles; recall is still bounded by the cap (a pair sharing
    // ONLY df>cap shingles is never a candidate — the documented skew/recall
    // trade of any inverted-index join).
    val withDf = shinglesWithDf(spark, dir, n)
    // per-doc count of df>cap shingles — the only shingles a pair can share
    // beyond the rare index (df=1 cannot be shared), so they bound the
    // unseen part of the intersection
    val commonCnt = withDf.filter(col("df") > dfCap)
      .groupBy("doc_id").agg(count(lit(1)).as("n_common"))
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    // SOUND upper-bound prune before the expensive full-set verify:
    // n_inter ≤ r_ab (shared rare shingles, counted here for free) +
    // min(common_a, common_b); jaccard is increasing in n_inter, so pairs
    // whose bound misses the threshold (minus a 1e-6 rounding slack) cannot
    // appear in the output — at sf0.1 this cuts ~1.1M candidates to the
    // few hundred genuine near-dup pairs before the verify join.
    val rInter = rarePairCounts(spark, dir, n, dfCap)
    val cands = rInter
      .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .join(commonCnt.select(col("doc_id").as("doc_a"), col("n_common").as("c_a")),
        Seq("doc_a"), "left")
      .join(commonCnt.select(col("doc_id").as("doc_b"), col("n_common").as("c_b")),
        Seq("doc_b"), "left")
      .na.fill(0L, Seq("c_a", "c_b"))
      .withColumn("ub_i", col("r_ab") + least(col("c_a"), col("c_b")))
      .filter(col("ub_i").cast("double")
        / (col("n_a") + col("n_b") - col("ub_i")).cast("double")
        >= threshold - 1e-6)
      .select("doc_a", "doc_b")
    // cache the verified pairs (few hundred rows): the recall-invariant
    // query re-reads this exact plan, and CacheManager keys by analyzed
    // plan, so one materialization serves both (same policy as
    // minhashNearDups' pipeline caches — session-bounded)
    exactJaccardFromShingles(sh, cands)
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .cache()
  }

  /** DuckDB oracle for [[ngramJaccardPairs]] (defaults: n=3, dfCap=20,
    * threshold=0.5). The Spark side shingles by xxhash64 of token triples;
    * the oracle uses the triple STRINGS — set cardinalities (and therefore
    * jaccard) are identical up to 64-bit hash collisions (~1e-10 at this
    * corpus size). Short docs (<3 tokens) fall back to one whole-text
    * shingle on both sides. */
  val ngramJaccardPairsSql: String = ngramJaccardPairsSqlAt(0.5)

  /** Same oracle, parameterized threshold — the recall-invariant query
    * reuses the pipeline at a higher cut. `extraCols` is spliced into the
    * final projection (structured extension point: string-replacing the
    * SELECT from outside would silently no-op if this text ever drifted). */
  def ngramJaccardPairsSqlAt(threshold: Double, extraCols: String = ""): String =
    raw"""WITH toked AS (
      |  SELECT doc_id,
      |    list_filter(str_split(lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g'))), ' '),
      |                x -> x <> '') AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, sh FROM (
      |    SELECT doc_id, UNNEST(CASE WHEN len(toks) >= 3
      |      THEN list_transform(range(1, len(toks) - 1),
      |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |      ELSE [array_to_string(toks, ' ')] END) AS sh
      |    FROM toked)),
      |freq AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY 1),
      |rare AS (SELECT s.doc_id, s.sh FROM sh s JOIN freq USING (sh)
      |         WHERE freq.df BETWEEN 2 AND 20),
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id),
      |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
      |  FROM cands c
      |  JOIN sh sa ON sa.doc_id = c.doc_a
      |  JOIN sh sb ON sb.doc_id = c.doc_b AND sa.sh = sb.sh
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,$extraCols
      |  ROUND(n_inter / CAST(ca.n_sh + cb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
      |FROM inter
      |JOIN counts ca ON ca.doc_id = doc_a
      |JOIN counts cb ON cb.doc_id = doc_b
      |WHERE ROUND(n_inter / CAST(ca.n_sh + cb.n_sh - n_inter AS DOUBLE), 6) >= $threshold""".stripMargin

  private val jaccShMemo = new SessionMemo[(String, Int), DataFrame]

  /** The exact-Jaccard family's shingle table, MEMOIZED per (session, dir,
    * n) — ONE DataFrame instance shared by the pair pipeline, the rare
    * sweep, and the cap-exposure audit (r18 ADVICE: the three used to
    * build the plan independently and rely on CacheManager plan-identity
    * to share the materialization; any drift in construction order or
    * naming would have silently rebuilt the heavy shingle pass with no
    * test noticing — instance sharing cannot drift). */
  private def jaccardShingles(spark: SparkSession, dir: String,
      n: Int): DataFrame =
    jaccShMemo.getOrElseUpdate(spark, (dir, n)) {
      docShingles(spark, dir, n).cache()
    }

  private val withDfMemo = new SessionMemo[(String, Int), DataFrame]

  /** The df-annotated (doc_id, sh, df ≥ 2) inverted index, MEMOIZED like
    * [[jaccardShingles]] and built from it: df == 1 shingles can never
    * intersect (drop them — typically most of the index); consumers split
    * it at dfCap into the rare index (candidates) and the common tail
    * (the skew guard / recall bound). Warm-touched transitively through
    * `rarePairCounts` (policy (a)): materializing the sweep forces this
    * cache first. */
  private def shinglesWithDf(spark: SparkSession, dir: String,
      n: Int): DataFrame =
    withDfMemo.getOrElseUpdate(spark, (dir, n)) {
      val sh = jaccardShingles(spark, dir, n)
      sh.join(
        sh.groupBy("sh").agg(count(lit(1)).as("df")).filter(col("df") >= 2),
        "sh").cache()
    }

  private val rarePairsMemo = new SessionMemo[(String, Int, Int), DataFrame]

  /** THE exact-truth pair sweep, factored out and memoized (r17 — the one
    * heavy pass three registered consumers previously rebuilt piecemeal:
    * q_dedup_ngram_jaccard's candidate generation, q_minhash_precision's
    * witness scope, and the split-straddle audit via the verified-pairs
    * cache): candidate pairs from grouping the rare (2 ≤ df ≤ dfCap)
    * inverted index by shingle and expanding the ≤ dfCap-doc posting list
    * in-group (nested HOFs) — the same pair multiset as the rare⋈rare
    * equi-self-join, but 2 exchanges (group-by-shingle, group-by-pair)
    * instead of 3. Group size is bounded by dfCap, so the in-group
    * d(d-1)/2 expansion can never skew a task. Returns
    * (doc_a, doc_b, r_ab = shared rare-shingle count); warm-up touches it
    * under policy (a) as a per-ingest truth artifact. */
  private[graft] def rarePairCounts(spark: SparkSession, dir: String,
      n: Int = 3, dfCap: Int = 20): DataFrame =
    rarePairsMemo.getOrElseUpdate(spark, (dir, n, dfCap)) {
      shinglesWithDf(spark, dir, n).filter(col("df") <= dfCap)
        .groupBy("sh").agg(collect_list(col("doc_id")).as("ds"))
        .select(explode(flatten(transform(col("ds"), a =>
          transform(filter(col("ds"), b => b > a),
            b => struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
        .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
        .agg(count(lit(1)).as("r_ab"))
        .cache()
    }

  /** Distinct doc pairs sharing at least one RARE (2 ≤ df ≤ dfCap) shingle
    * — exactly the candidate universe [[ngramJaccardPairs]] can enumerate:
    * a projection of the memoized [[rarePairCounts]] sweep (already
    * distinct by its group-by), so the precision invariant's witness set
    * costs a cached-frame read, not a fresh pair expansion. Used by the
    * precision invariant to scope its subset claim to pairs the df-capped
    * truth pipeline is structurally able to witness. */
  private[operators] def rareSharingPairs(spark: SparkSession, dir: String,
      n: Int = 3, dfCap: Int = 20): DataFrame =
    rarePairCounts(spark, dir, n, dfCap).select("doc_a", "doc_b")

  /** Per-doc quantification of the df-cap recall trade — "no silent caps"
    * made measurable. [[ngramJaccardPairs]] can only witness a pair through
    * a shared RARE (2 ≤ df ≤ dfCap) shingle; a pair sharing ONLY df>cap
    * shingles is structurally invisible. For a doc with n_sh shingles of
    * which n_common are df>cap, any invisible pair (a, b) has
    * n_inter ≤ min(c_a, c_b) and union ≥ max(n_a, n_b), so its jaccard is
    * at most c_a/n_a — `exposure_bound`. `exposed` marks docs whose bound
    * clears the pipeline threshold, i.e. the only docs that could be part
    * of a missed threshold pair; everything else carries a per-doc PROOF
    * of full recall. Reuses the pipeline's cached shingle/df frames, so
    * the audit costs two small aggregates, not a corpus re-scan. */
  def ngramCapExposure(spark: SparkSession, dir: String,
      threshold: Double = 0.5, n: Int = 3, dfCap: Int = 20): DataFrame = {
    val sh = jaccardShingles(spark, dir, n)
    val withDf = shinglesWithDf(spark, dir, n)
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val commonCnt = withDf.filter(col("df") > dfCap)
      .groupBy("doc_id").agg(count(lit(1)).as("n_common"))
    counts.join(commonCnt, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_common"))
      .select(col("doc_id"), col("n_sh"), col("n_common"),
        round(col("n_common").cast("double") / col("n_sh"), 6)
          .as("exposure_bound"),
        (col("n_common").cast("double") / col("n_sh") >= threshold)
          .as("exposed"))
  }

  /** DuckDB oracle for [[ngramCapExposure]] — re-derives the shingle sets,
    * the df histogram, and the per-doc bound. */
  def ngramCapExposureSql(threshold: Double = 0.5, dfCap: Int = 20): String =
    raw"""WITH toked AS (
      |  SELECT doc_id,
      |    list_filter(str_split(lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g'))), ' '),
      |                x -> x <> '') AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, sh FROM (
      |    SELECT doc_id, UNNEST(CASE WHEN len(toks) >= 3
      |      THEN list_transform(range(1, len(toks) - 1),
      |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |      ELSE [array_to_string(toks, ' ')] END) AS sh
      |    FROM toked)),
      |freq AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY 1),
      |common AS (
      |  SELECT s.doc_id, COUNT(*) AS n_common
      |  FROM sh s JOIN freq USING (sh) WHERE freq.df > $dfCap GROUP BY 1),
      |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1)
      |SELECT c.doc_id, c.n_sh, CAST(COALESCE(m.n_common, 0) AS BIGINT) AS n_common,
      |  ROUND(COALESCE(m.n_common, 0) / CAST(c.n_sh AS DOUBLE), 6) AS exposure_bound,
      |  COALESCE(m.n_common, 0) / CAST(c.n_sh AS DOUBLE) >= $threshold AS exposed
      |FROM counts c LEFT JOIN common m USING (doc_id)""".stripMargin

  // ------------------------------------------------ exact duplicated spans
  /** Cross-document EXACT duplicated-span detection — the substring-dedup
    * primitive (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better": near-dup docs share long verbatim runs that survive
    * doc-level dedup). Jaccard says "these docs overlap"; this says "THIS
    * run of tokens is shared, starting at a_start in A and b_start in B" —
    * the actionable unit for span-level scrubbing. Fully relational:
    *
    *   1. per doc, an md5 anchor over the k tokens at every position
    *      (md5, not xxhash64, so the oracle recomputes identical anchors);
    *   2. anchors shared by >dfCap docs dropped (boilerplate/skew guard —
    *      the inverted index's idiom; the join fan-out is bounded by
    *      dfCap² per anchor);
    *   3. anchors equi-joined across docs (doc_a < doc_b) → match points
    *      (pa, pb);
    *   4. points on one DIAGONAL (pa − pb) with consecutive pa chain into
    *      runs (pa − row_number is constant within a run — the classic
    *      gaps-and-islands grouping);
    *   5. a run of m consecutive anchors ⇒ a shared span of k+m−1 tokens.
    *
    * Spans can split where the df-cap drops a mid-span anchor —
    * conservative (reported spans are always real; one long span may
    * surface as two). One shuffle per stage, all keyed on anchor or
    * (doc_a, doc_b, diag) — no all-pairs comparison anywhere.
    *
    * `saltFactor > 1` switches the anchor self-join to the salted form
    * (the `operators.Skew` fallback): per-anchor fan-out is bounded by
    * dfCap² rows, but an ADVERSARIAL corpus can park thousands of distinct
    * boilerplate anchors at exactly the cap AND those anchors can hash
    * into the same shuffle partition — salting by (doc, pos) spreads each
    * anchor's posting list over `saltFactor` tasks while producing the
    * IDENTICAL point set (equivalence pinned in ScaleSpec). */
  def duplicateSpans(spark: SparkSession, dir: String, k: Int = 8,
      minTokens: Int = 12, dfCap: Int = 20, saltFactor: Int = 1): DataFrame = {
    // stage the tokenizer through its own alias: the window transform's
    // per-element slice(toks, …) would otherwise re-tokenize per window
    // (interpreted lambdas get no subexpression elimination)
    val toks = col("__toks")
    val gramArr = when(size(toks) >= k,
        transform(sequence(lit(1), size(toks) - (k - 1)),
          i => md5(concat_ws(" ", slice(toks, i, lit(k))))))
      .otherwise(array().cast("array<string>")) // shorter than k ⇒ no k-spans
    val grams = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("__toks"))
      .select(col("doc_id"), posexplode(gramArr).as(Seq("pos", "gram")))
    val freq = grams.groupBy("gram")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df").between(2, dfCap))
    // the capped anchor index feeds BOTH sides of the self-join and is
    // rebuilt identically by the plain/salted/scrub consumers — cache it so
    // one session materializes the gram pipeline once (same session-bounded
    // policy as the minhash pipeline caches)
    val rare = grams.join(freq, "gram").cache()
    val xa = rare.select(col("gram"), col("doc_id").as("doc_a"), col("pos").as("pa"))
    val yb = rare.select(col("gram"), col("doc_id").as("doc_b"), col("pos").as("pb"))
    val pts =
      if (saltFactor <= 1)
        xa.join(yb, Seq("gram")).filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b", "pa", "pb")
      else {
        // probe side salted by content (deterministic), build side exploded
        // saltFactor× — Skew.saltedJoin's shape with the pair predicate kept
        val salted = xa.withColumn("__salt",
          pmod(xxhash64(col("doc_a"), col("pa")), lit(saltFactor.toLong)))
        val exploded = yb.withColumn("__salt",
          explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
        salted.join(exploded, Seq("gram", "__salt"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b", "pa", "pb")
      }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    pts.withColumn("diag", col("pa") - col("pb"))
      .withColumn("run0", col("pa") - row_number().over(w))
      .groupBy("doc_a", "doc_b", "diag", "run0")
      .agg(min("pa").cast("long").as("a_start"),
        min("pb").cast("long").as("b_start"),
        (count(lit(1)) + lit(k - 1)).cast("long").as("span_tokens"))
      .filter(col("span_tokens") >= minTokens)
      .select("doc_a", "doc_b", "a_start", "b_start", "span_tokens")
  }

  /** DuckDB oracle for [[duplicateSpans]] — the same anchor/diagonal/run
    * construction over the same md5 k-gram anchors (defaults k=8,
    * minTokens=12, dfCap=20). */
  val duplicateSpansSql: String =
    raw"""WITH toked AS (
      |  SELECT doc_id,
      |    list_filter(str_split(lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g'))), ' '),
      |                x -> x <> '') AS toks
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
      |         md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS gram
      |  FROM toked, UNNEST(generate_series(1, len(toks) - 7)) AS t(i)
      |  WHERE len(toks) >= 8),
      |dfreq AS (SELECT gram, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY 1),
      |rare AS (SELECT g.* FROM grams g JOIN dfreq USING (gram)
      |         WHERE df BETWEEN 2 AND 20),
      |pts AS (
      |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.pos AS pa, y.pos AS pb
      |  FROM rare x JOIN rare y ON x.gram = y.gram AND x.doc_id < y.doc_id),
      |runs AS (
      |  SELECT doc_a, doc_b, pa - pb AS diag, pa, pb,
      |         pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pa - pb
      |                                 ORDER BY pa) AS run0
      |  FROM pts)
      |SELECT doc_a, doc_b,
      |       CAST(MIN(pa) AS BIGINT) AS a_start,
      |       CAST(MIN(pb) AS BIGINT) AS b_start,
      |       CAST(COUNT(*) + 7 AS BIGINT) AS span_tokens
      |FROM runs GROUP BY doc_a, doc_b, diag, run0
      |HAVING COUNT(*) + 7 >= 12""".stripMargin

  /** [[duplicateSpans]] MEMOIZED per (session, dir, k, minTokens, dfCap) —
    * the span table has two registered consumers (the span report and the
    * scrub that applies it), and at scale it is a materialized per-ingest
    * artifact a scrub job reads, never recomputed per query (the
    * dupClusters multi-consumer policy). The salted twin stays un-memoized
    * on purpose: its whole point is to execute the alternative join plan. */
  private val spansMemo = new SessionMemo[(String, Int, Int, Int), DataFrame]

  def duplicateSpansMemo(spark: SparkSession, dir: String, k: Int = 8,
      minTokens: Int = 12, dfCap: Int = 20): DataFrame =
    spansMemo.getOrElseUpdate(spark, (dir, k, minTokens, dfCap)) {
      duplicateSpans(spark, dir, k, minTokens, dfCap).cache()
    }

  /** Span-level SCRUB: apply [[duplicateSpans]] to the corpus — the doc
    * with the larger id in each pair has the shared token range removed
    * (the smaller id keeps its copy, matching the min-winner policy of the
    * doc-level dedups). Emits one row per document with before/after token
    * counts and the md5 of the scrubbed text (the redact_pii md5-closed
    * oracle pattern — hash compare without shipping rebuilt documents).
    * Overlapping ranges (a doc sharing spans with several earlier docs)
    * compose correctly: a position is dropped if ANY range covers it. */
  def scrubSpans(spark: SparkSession, dir: String, k: Int = 8,
      minTokens: Int = 12, dfCap: Int = 20): DataFrame = {
    val ranges = duplicateSpansMemo(spark, dir, k, minTokens, dfCap)
      .groupBy(col("doc_b").as("doc_id"))
      .agg(collect_list(struct(col("b_start").as("s"),
        col("span_tokens").as("n"))).as("rs"))
    val docs = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    docs.join(ranges, Seq("doc_id"), "left")
      .withColumn("kept",
        when(col("rs").isNull, col("toks")).otherwise(
          filter(col("toks"), (t, i) =>
            !exists(col("rs"), r => i >= r("s") && i < r("s") + r("n")))))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_before"),
        size(col("kept")).cast("long").as("n_after"),
        md5(concat_ws(" ", col("kept"))).as("scrubbed_md5"))
  }

  /** DuckDB oracle for [[scrubSpans]]: the duplicateSpans construction,
    * ranges re-applied with the same indexed-lambda position filter. */
  val scrubSpansSql: String =
    raw"""WITH toked AS (
      |  SELECT doc_id,
      |    list_filter(str_split(lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g'))), ' '),
      |                x -> x <> '') AS toks
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
      |         md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS gram
      |  FROM toked, UNNEST(generate_series(1, len(toks) - 7)) AS t(i)
      |  WHERE len(toks) >= 8),
      |dfreq AS (SELECT gram, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY 1),
      |rare AS (SELECT g.* FROM grams g JOIN dfreq USING (gram)
      |         WHERE df BETWEEN 2 AND 20),
      |pts AS (
      |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.pos AS pa, y.pos AS pb
      |  FROM rare x JOIN rare y ON x.gram = y.gram AND x.doc_id < y.doc_id),
      |runs AS (
      |  SELECT doc_a, doc_b, pa - pb AS diag, pa, pb,
      |         pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pa - pb
      |                                 ORDER BY pa) AS run0
      |  FROM pts),
      |spans AS (
      |  SELECT doc_b, CAST(MIN(pb) AS BIGINT) AS b_start,
      |         CAST(COUNT(*) + 7 AS BIGINT) AS span_tokens
      |  FROM runs GROUP BY doc_a, doc_b, diag, run0
      |  HAVING COUNT(*) + 7 >= 12),
      |ranges AS (
      |  SELECT doc_b AS doc_id,
      |         list(struct_pack(s := b_start, n := span_tokens)) AS rs
      |  FROM spans GROUP BY 1),
      |scrubbed AS (
      |  SELECT t.doc_id, t.toks,
      |         CASE WHEN r.rs IS NULL THEN t.toks
      |              ELSE list_filter(t.toks, (x, i) ->
      |                     len(list_filter(r.rs, rr ->
      |                       i - 1 >= rr.s AND i - 1 < rr.s + rr.n)) = 0)
      |         END AS kept
      |  FROM toked t LEFT JOIN ranges r USING (doc_id))
      |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_before,
      |       CAST(len(kept) AS BIGINT) AS n_after,
      |       -- a fully-scrubbed doc keeps []: DuckDB array_to_string([])
      |       -- is NULL where Spark concat_ws gives '' — coalesce to match
      |       md5(COALESCE(array_to_string(kept, ' '), '')) AS scrubbed_md5
      |FROM scrubbed""".stripMargin
}
