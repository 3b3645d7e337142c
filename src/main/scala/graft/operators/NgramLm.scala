package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Token-trigram language model with STUPID BACKOFF (Brants et al. 2007,
  * "Large Language Models in Machine Translation" — the distributed
  * count-based LM built exactly for this MapReduce/Spark shape), applied as
  * the CCNet/KenLM-style perplexity quality filter. This is the token-level
  * big sibling of [[LmScore]]'s character-bigram model: the reference's
  * quality path stops at rule scores (`scripts/indexing/to_elasticsearch.py`
  * ships rows to ES with no LM), so this is the training-data-pipeline
  * extension the brief asks for, built relationally end to end.
  *
  * Model: raw counts with a count-cutoff (n-grams seen once are dropped —
  * the standard pruning that (a) bounds the model and (b) makes backoff
  * actually fire on a self-trained corpus). Scores:
  *
  *   S(w | u v) = c(uvw)/c(uv)        if c(uvw) ≥ 2       (no penalty)
  *              = 0.4 · S(w | v)      otherwise
  *   S(w | v)   = c(vw)/c(v)          if c(vw) ≥ 2
  *              = 0.4 · S(w)          otherwise
  *   S(w)       = c(w)/N
  *
  * Denominators are RAW counts (pruning decides presence, not mass — the
  * Brants et al. formulation); c(uvw) ≥ 2 implies the context bigram has
  * raw count ≥ 2, so the trigram score's denominator always exists.
  *
  * Cross-engine determinism (the [[LmScore]] recipe): every per-token
  * log2 term is ln/ln2 rounded to 9 dp and cast to DECIMAL before summing —
  * decimal addition is exact and order-free — then the per-doc mean is
  * rounded to 6 dp. All score ratios are single IEEE divisions of
  * integer-derived doubles (deterministic); only libm's ln ulp variance
  * remains, the accepted exposure.
  *
  * At 100 TB: the three count jobs are plain map-side-combined groupBys
  * over the exploded token stream; the count-cutoff keeps the model tables
  * orders of magnitude below the corpus (raise the cutoff / add entropy
  * pruning to shrink further — the knob is `minCount`). Scoring is
  * broadcast left joins (the model is the small side by construction; if a
  * web-scale vocabulary outgrows broadcast, the same plan shuffle-joins on
  * the n-gram key) plus ONE shuffle keyed by doc_id for the per-doc mean.
  * Training re-reads the corpus once per order; at scale the token arrays
  * would be persisted once (the corpus-shuffle shard layout in
  * [[Layout]] is exactly that materialization).
  */
object NgramLm {

  private val Alpha = 0.4
  private val MinCount = 2

  /** Token stream with 0-based position and the two preceding tokens:
    * (doc_id, lang, source, p, wpp, wp, w). `when` guards keep
    * `element_at` unevaluated at p<1/p<2 (CaseWhen short-circuits), so the
    * ANSI zero-index error cannot fire. */
  private def tokenStream(docs: DataFrame): DataFrame = {
    val tk = TextFunctions.tokens(col("text"))
    docs
      .select(col("doc_id"), col("lang"), col("source"), tk.as("tk"))
      .filter(size(col("tk")) >= 1)
      .select(col("doc_id"), col("lang"), col("source"), col("tk"),
        posexplode(col("tk")).as(Seq("p", "w")))
      .select(col("doc_id"), col("lang"), col("source"), col("p"), col("w"),
        when(col("p") >= 1, element_at(col("tk"), col("p"))).as("wp"),
        when(col("p") >= 2, element_at(col("tk"), col("p") - 1)).as("wpp"))
  }

  /** RAW n-gram count tables — the model's sufficient statistic (what the
    * production LM pipeline keeps on disk; pruning and score derivation
    * happen at model-BUILD time, so counts stay mergeable under appends):
    * uni(w, c1), big(b1, b2, c2), tri(t1, t2, t3, c3), all exact longs. */
  private def rawCounts(st: DataFrame): (DataFrame, DataFrame, DataFrame) = (
    st.groupBy("w").agg(count(lit(1)).as("c1")),
    st.filter(col("p") >= 1)
      .groupBy(col("wp").as("b1"), col("w").as("b2"))
      .agg(count(lit(1)).as("c2")),
    st.filter(col("p") >= 2)
      .groupBy(col("wpp").as("t1"), col("wp").as("t2"), col("w").as("t3"))
      .agg(count(lit(1)).as("c3")))

  /** Score tables derived from raw counts: (uni with s1 and N folded in,
    * pruned bigrams with s2, pruned trigrams with s3). Cached: they are
    * the MODEL (KBs–MBs at any corpus size), re-used by every scoring
    * branch — and the ONE derivation both the inline and the stored paths
    * go through, so they cannot drift. */
  private def modelFromCounts(uni0: DataFrame, bigRaw0: DataFrame,
      tri0: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val uni = uni0.select(col("w"), col("c1").cast("double").as("c1"))
    val n = uni.agg(sum("c1").as("n_tokens_total"))
    // s1 rides on the unigram table: one scalar broadcast, no per-row agg
    val uniS = uni.crossJoin(broadcast(n))
      .select(col("w"), col("c1"), (col("c1") / col("n_tokens_total")).as("s1"))
      .cache()
    // Count-cutoff BEFORE the cast and BEFORE caching/broadcasting: on the
    // stored path the `c2 >= 2` / `c3 >= 2` predicates land on the raw long
    // column and push down to the parquet scan (PushedFilters — a filter on
    // the cast-to-double column would not), so the singleton-dominated tail
    // of the persisted count tables is never read back. Pruning bigrams
    // here is lossless for the trigram denominator too: every surviving
    // trigram has c3 ≥ 2, and c(uv) ≥ c(uvw), so its context bigram always
    // clears the same cutoff.
    val bigRaw = bigRaw0.filter(col("c2") >= MinCount)
      .select(col("b1"), col("b2"), col("c2").cast("double").as("c2")).cache()
    val bigS = bigRaw
      .join(broadcast(uniS.select(col("w").as("b1"), col("c1"))), "b1")
      .select(col("b1"), col("b2"), col("c2"), (col("c2") / col("c1")).as("s2"))
      .cache()
    val triS = tri0.filter(col("c3") >= MinCount)
      .select(col("t1"), col("t2"), col("t3"), col("c3").cast("double").as("c3"))
      // raw-count denominator: c3 ≥ 2 ⇒ the context bigram exists in bigRaw
      .join(broadcast(bigRaw.select(col("b1").as("t1"), col("b2").as("t2"),
        col("c2").as("c2ctx"))), Seq("t1", "t2"))
      .select(col("t1"), col("t2"), col("t3"), col("c3"),
        (col("c3") / col("c2ctx")).as("s3"))
      .cache()
    (uniS, bigS, triS)
  }

  private def model(st: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val (u, b, t) = rawCounts(st)
    modelFromCounts(u, b, t)
  }

  private val rawCountsMemo =
    new SessionMemo[String, (DataFrame, DataFrame, DataFrame)]

  /** The corpus RAW count tables, once per (session, sf dir) — the ONE
    * sufficient statistic both the in-session model derivation and the
    * stored-model write consume (each used to re-run the token explode +
    * three count aggregates). Cached: they are what an ingest pipeline
    * materializes; everything else derives from them. */
  private def corpusRawCounts(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) =
    rawCountsMemo.getOrElseUpdate(spark, dir) {
      val (u, b, t) = rawCounts(
        tokenStream(Tables.spread(spark, Tables.documents(spark, dir))))
      (u.cache(), b.cache(), t.cache())
    }

  private val corpusModelMemo =
    new SessionMemo[String, (DataFrame, DataFrame, DataFrame)]

  /** The corpus-trained model tables, once per (session, sf dir) — four
    * registered queries (score/gate/stored/curriculum) consume the same
    * model; rebuilding the three cached aggregates per query would re-run
    * the count jobs each time (the `ivfTrain`/`seededCodebooks` memo
    * pattern). */
  private def corpusModel(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) =
    corpusModelMemo.getOrElseUpdate(spark, dir) {
      val (u, b, t) = corpusRawCounts(spark, dir)
      modelFromCounts(u, b, t)
    }

  /** Per-document stupid-backoff score: (doc_id, lang, n_tokens,
    * avg_log2sb, sb_ppl). Self-trained on the scored corpus (the CCNet
    * production shape trains on a reference corpus — swap the `st` the
    * model is built from to change that). */
  def scoreDocs(docs: DataFrame): DataFrame = {
    val st = tokenStream(docs)
    val (uniS, bigS, triS) = model(st)
    scoreStream(st, uniS, bigS, triS)
  }

  /** The scoring join+backoff+aggregate over a token stream, shared by the
    * inline (self-trained) and stored-model paths.
    *
    * OOV FLOOR (the foreign-corpus contract, r14 verdict #3): on the CCNet
    * production shape the model is trained on a REFERENCE corpus, so the
    * scored stream can carry tokens the model never saw. The unigram join
    * is LEFT and an unseen token scores at the Laplace-style floor
    * s1 = 1/(N+1) (one phantom occurrence against the model's token mass)
    * instead of silently dropping out of the per-doc mean — the count
    * stays TOTAL (every token contributes one term). On the self-trained
    * path the join is total by construction, the coalesce never fires and
    * the output is bit-identical — which is why the stored twin keeps the
    * SAME oracle. NgramLmSpec's foreign-corpus leg pins the floor. */
  private def scoreStream(st: DataFrame, uniS: DataFrame, bigS: DataFrame,
      triS: DataFrame): DataFrame = {
    // N from the model's own unigram table (one scalar broadcast): the
    // floor must be a property of the MODEL, not of the scored corpus
    val nTot = uniS.agg(sum("c1").as("n_tot_oov"))
    val s1eff = coalesce(col("s1"), lit(1.0) / (col("n_tot_oov") + lit(1.0)))
    val s: Column =
      when(col("p") >= 2 && col("s3").isNotNull, col("s3"))
        .when(col("p") >= 2 && col("s2").isNotNull, lit(Alpha) * col("s2"))
        .when(col("p") >= 2, lit(Alpha * Alpha) * s1eff)
        .when(col("p") === 1 && col("s2").isNotNull, col("s2"))
        .when(col("p") === 1, lit(Alpha) * s1eff)
        .otherwise(s1eff)
    st
      .join(broadcast(triS), col("wpp") === col("t1") &&
        col("wp") === col("t2") && col("w") === col("t3"), "left")
      .join(broadcast(bigS), col("wp") === col("b1") && col("w") === col("b2"), "left")
      .join(broadcast(uniS.select(col("w"), col("s1"))), Seq("w"), "left")
      .crossJoin(broadcast(nTot))
      // fixed-point 1e-9-unit LONG, not DECIMAL(20,9) (the LmScore r18
      // rule): integer addition keeps the per-doc sum exact and order-free
      // in primitive codegen arithmetic instead of a BigDecimal per token.
      // Bound: the OOV floor keeps s ≥ 1/(N+1) ⇒ |t| ≲ log2(N) < 50 ⇒
      // |t_units| < 5·10¹⁰, so Σ_doc stays under 2⁵³ (toDouble exact, one
      // IEEE division — bit-identical to the decimal cast) for any doc up
      // to ~10⁵ tokens, far past the chunking contract's doc sizes.
      .withColumn("t_units",
        rint(round(log(s) / log(lit(2.0)), 9) * lit(1e9)).cast("long"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        round(sum(col("t_units")).cast("double") / lit(1e9)
          / count(lit(1)), 6).as("avg_log2sb"))
      .withColumn("sb_ppl", round(pow(lit(2.0), -col("avg_log2sb")), 4))
  }

  private val scoredMemo = new SessionMemo[String, DataFrame]

  // no ORDER BY: the result is corpus-sized (one row per doc) and the
  // driver's compare sorts rows — a global sort here would be pure cost.
  // MEMOIZED per (session, dir): the per-doc score table is metadata-scale
  // (one row per doc) and in production it is a MATERIALIZED quality
  // column written once per ingest — gate, curriculum and the score query
  // itself all read that artifact, they never re-run the token explode +
  // three model joins per consumer (the dupClusters memo contract).
  def scoreQuery(spark: SparkSession, dir: String): DataFrame =
    scoredMemo.getOrElseUpdate(spark, dir) {
      val (uniS, bigS, triS) = corpusModel(spark, dir)
      scoreStream(
        tokenStream(Tables.spread(spark, Tables.documents(spark, dir))),
        uniS, bigS, triS).cache()
    }

  /** The model artifact itself: top pruned trigrams by count with their
    * backoff score — the inspectable head of what `writeModel` would
    * persist. Total-order tiebreak (c3 desc, t1, t2, t3). */
  def modelQuery(spark: SparkSession, dir: String): DataFrame = {
    val (_, _, triS) = corpusModel(spark, dir)
    triS.select(col("t1"), col("t2"), col("t3"),
      col("c3").cast("long").as("c3"), round(col("s3"), 6).as("s3"))
      .orderBy(col("c3").desc, col("t1"), col("t2"), col("t3"))
      .limit(40)
  }

  /** The filter in use: per-source keep rate at the self-calibrating
    * threshold (corpus mean of the per-doc scores — decimal-exact mean, so
    * both engines compute the identical cut). */
  def gateQuery(spark: SparkSession, dir: String): DataFrame = {
    val scored = scoreQuery(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "source"), "doc_id")
    val thr = scored.agg(
      round(sum(col("avg_log2sb").cast("decimal(20,6)")).cast("double")
        / count(lit(1)), 6).as("thr"))
    scored.crossJoin(broadcast(thr))
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("avg_log2sb") >= col("thr"), 1L).otherwise(0L)).as("n_keep"))
      .withColumn("keep_rate", round(col("n_keep") / col("n_docs"), 6))
      .orderBy("source")
  }

  // ------------------------------------------------ stored model (TxTable)
  /** Materialize the RAW count tables as three TxTables under `path` —
    * the production form the sketch/ANN indexes already ship
    * ([[Similarity.writePqIndex]] / `writeIvfIndex` / `writeLshIndex`):
    * at 100 TB the counts are computed once per ingest window and the
    * nightly model build derives scores from the stored statistic instead
    * of re-reading the corpus. Counts are exact longs → parquet
    * round-trips bit-exactly. */
  def writeLmModel(spark: SparkSession, docs: DataFrame, path: String): Unit =
    writeLmModelFrom(spark, rawCounts(tokenStream(docs)), path)

  private def writeLmModelFrom(spark: SparkSession,
      counts: (DataFrame, DataFrame, DataFrame), path: String): Unit = {
    graft.serve.TxTable.write(spark, counts._1, s"$path/uni")
    graft.serve.TxTable.write(spark, counts._2, s"$path/big")
    graft.serve.TxTable.write(spark, counts._3, s"$path/tri")
    ()
  }

  /** INCREMENTAL count maintenance: count the new batch, add the stored
    * counts for the touched grams, MERGE keyed by gram — file-pruned by
    * the TxTable key stats, so the rewrite cost scales with the touched
    * gram range, not the model. Each table's merge is one atomic commit.
    * NOT replay-idempotent (counts are additive — a redelivered batch
    * double-counts): producers must dedupe batches upstream, e.g. keying
    * deliveries by batch id — the honest contract of any count-based
    * statistic, unlike the overwrite-style code/index merges. */
  def appendLmCounts(spark: SparkSession, batch: DataFrame, path: String): Unit = {
    val (uni, big, tri) = rawCounts(tokenStream(batch))
    def bump(cnts: DataFrame, table: String, keys: Seq[String], ccol: String): Unit = {
      val stored = graft.serve.TxTable.read(spark, s"$path/$table")
        .select((keys.map(col) :+ col(ccol).as("c_old")): _*)
      val updated = cnts.join(stored, keys, "left")
        .select((keys.map(col) :+
          (col(ccol) + coalesce(col("c_old"), lit(0L))).as(ccol)): _*)
      graft.serve.TxTable.merge(spark, updated, s"$path/$table", keys)
      ()
    }
    bump(uni, "uni", Seq("w"), "c1")
    bump(big, "big", Seq("b1", "b2"), "c2")
    bump(tri, "tri", Seq("t1", "t2", "t3"), "c3")
  }

  /** RIGHT-TO-BE-FORGOTTEN on the count statistic: counts form an abelian
    * group, so removing documents is the NEGATED bump — count the purged
    * batch, subtract from the stored grams, merge, then DELETE rows whose
    * count reached zero (a zero-count gram must leave the model: it would
    * otherwise score as an existing-but-impossible event). After the purge
    * the stored tables are EXACTLY the counts of the remaining corpus
    * (PurgeSpec pins table equality against a from-scratch rebuild) — no
    * full recount, cost O(purged batch) + the touched gram ranges. Same
    * delivery contract as [[appendLmCounts]]: not replay-idempotent. */
  def removeLmCounts(spark: SparkSession, purged: DataFrame, path: String): Unit = {
    val (uni, big, tri) = rawCounts(tokenStream(purged))
    def unbump(cnts: DataFrame, table: String, keys: Seq[String], ccol: String): Unit = {
      val tpath = s"$path/$table"
      val stored = graft.serve.TxTable.read(spark, tpath)
        .select((keys.map(col) :+ col(ccol).as("c_old")): _*)
      val updated = cnts.join(stored, keys, "left")
        .select((keys.map(col) :+
          (coalesce(col("c_old"), lit(0L)) - col(ccol)).as(ccol)): _*)
      graft.serve.TxTable.merge(spark, updated, tpath, keys)
      graft.serve.TxTable.delete(spark, tpath, col(ccol) <= 0L)
      ()
    }
    unbump(uni, "uni", Seq("w"), "c1")
    unbump(big, "big", Seq("b1", "b2"), "c2")
    unbump(tri, "tri", Seq("t1", "t2", "t3"), "c3")
  }

  /** Score a corpus against the PERSISTED model: counts read back from
    * the TxTable snapshot, scores derived through the SHARED
    * [[modelFromCounts]] — so when the stored counts equal the inline
    * counts the output is IDENTICAL to [[scoreDocs]] and the SAME DuckDB
    * oracle verifies it (the `q_ann_pq_stored` proof-by-same-oracle
    * pattern). This is also the CCNet production shape: the model may be
    * trained on a DIFFERENT (reference) corpus than the one scored —
    * tokens the model never saw score at [[scoreStream]]'s 1/(N+1) OOV
    * floor and the per-doc mean stays total (NgramLmSpec's foreign-corpus
    * leg). The registered twin trains on the scored corpus, where the
    * unigram join is total and the floor never fires. */
  def scoreDocsStored(docs: DataFrame, spark: SparkSession, path: String): DataFrame = {
    val (uniS, bigS, triS) = modelFromCounts(
      graft.serve.TxTable.read(spark, s"$path/uni"),
      graft.serve.TxTable.read(spark, s"$path/big"),
      graft.serve.TxTable.read(spark, s"$path/tri"))
    scoreStream(tokenStream(docs), uniS, bigS, triS)
  }

  private val storedModelMemo = new SessionMemo[String, String]

  /** Registered-query form: write the stored model once per (session, sf
    * dir) under the scratch root, then score against it — the in-session
    * stand-in for "the counts were materialized by last night's ingest"
    * ([[Similarity.pqStoredQuery]] pattern). Same oracle as
    * `q_ngram_lm_score`. */
  def scoreStoredQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(spark, Tables.documents(spark, dir))
    val path = storedModelMemo.getOrElseUpdate(spark, dir) {
      // write the SAME memoized raw counts the in-session model derives
      // from — one count pipeline serves both forms
      Similarity.scratchIndexPath("graft_lm_model", dir)(p =>
        writeLmModelFrom(spark, corpusRawCounts(spark, dir), p))
    }
    scoreDocsStored(docs, spark, path)
  }

  /** Shared DuckDB token-stream fragment — mirrors [[tokenStream]]:
    * `tk` is the Spark `TextFunctions.tokens` split; DuckDB lists are
    * 1-based, so prev = tk[p], prevprev = tk[p-1] for 0-based p. */
  private val tokenStreamSql: String =
    raw"""toks AS (
      |  SELECT doc_id, lang, source,
      |    list_filter(str_split(lower(trim(regexp_replace(text,
      |      '[ \t\n\x0B\f\r]+', ' ', 'g'))), ' '), t -> length(t) > 0) AS tk
      |  FROM documents),
      |st AS (
      |  SELECT doc_id, lang, source, tk,
      |    unnest(range(0, len(tk))) AS p, unnest(tk) AS w
      |  FROM toks WHERE len(tk) >= 1),
      |st2 AS (
      |  SELECT doc_id, lang, source, p, w,
      |    CASE WHEN p >= 1 THEN tk[p] END AS wp,
      |    CASE WHEN p >= 2 THEN tk[p-1] END AS wpp
      |  FROM st),
      |uni AS (SELECT w, count(*)::DOUBLE AS c1 FROM st2 GROUP BY 1),
      |unis AS (SELECT w, c1, c1 / (SELECT sum(c1) FROM uni) AS s1 FROM uni),
      |bigraw AS (SELECT wp AS b1, w AS b2, count(*)::DOUBLE AS c2
      |           FROM st2 WHERE p >= 1 GROUP BY 1, 2),
      |bigs AS (SELECT b.b1, b.b2, b.c2, b.c2 / u.c1 AS s2
      |         FROM bigraw b JOIN uni u ON u.w = b.b1 WHERE b.c2 >= 2),
      |tris AS (
      |  SELECT t.t1, t.t2, t.t3, t.c3, t.c3 / b.c2 AS s3
      |  FROM (SELECT wpp AS t1, wp AS t2, w AS t3, count(*)::DOUBLE AS c3
      |        FROM st2 WHERE p >= 2 GROUP BY 1, 2, 3) t
      |  JOIN bigraw b ON b.b1 = t.t1 AND b.b2 = t.t2
      |  WHERE t.c3 >= 2)""".stripMargin

  private val scoredSql: String =
    raw"""scored AS (
      |  SELECT s.doc_id, s.lang, CAST(count(*) AS INT) AS n_tokens,
      |    round(CAST(sum(CAST(round(ln(
      |      CASE WHEN s.p >= 2 AND t.s3 IS NOT NULL THEN t.s3
      |           WHEN s.p >= 2 AND b.s2 IS NOT NULL THEN 0.4 * b.s2
      |           WHEN s.p >= 2 THEN 0.16000000000000003 * u.s1
      |           WHEN s.p = 1 AND b.s2 IS NOT NULL THEN b.s2
      |           WHEN s.p = 1 THEN 0.4 * u.s1
      |           ELSE u.s1 END) / ln(2.0), 9) AS DECIMAL(20,9))) AS DOUBLE)
      |      / count(*), 6) AS avg_log2sb
      |  FROM st2 s
      |  LEFT JOIN tris t ON t.t1 = s.wpp AND t.t2 = s.wp AND t.t3 = s.w
      |  LEFT JOIN bigs b ON b.b1 = s.wp AND b.b2 = s.w
      |  JOIN unis u ON u.w = s.w
      |  GROUP BY s.doc_id, s.lang)""".stripMargin

  val scoreQuerySql: String =
    raw"""WITH $tokenStreamSql,
      |$scoredSql
      |SELECT doc_id, lang, n_tokens, avg_log2sb,
      |  round(pow(2.0, -avg_log2sb), 4) AS sb_ppl
      |FROM scored""".stripMargin

  val modelQuerySql: String =
    raw"""WITH $tokenStreamSql
      |SELECT t1, t2, t3, CAST(c3 AS BIGINT) AS c3, round(s3, 6) AS s3
      |FROM tris ORDER BY c3 DESC, t1, t2, t3 LIMIT 40""".stripMargin

  val gateQuerySql: String =
    raw"""WITH $tokenStreamSql,
      |$scoredSql,
      |thr AS (SELECT round(CAST(sum(CAST(avg_log2sb AS DECIMAL(20,6)))
      |                    AS DOUBLE) / count(*), 6) AS thr FROM scored)
      |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN s.avg_log2sb >= thr.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      |  round(sum(CASE WHEN s.avg_log2sb >= thr.thr THEN 1 ELSE 0 END)::DOUBLE
      |        / count(*), 6) AS keep_rate
      |FROM scored s JOIN documents d ON d.doc_id = s.doc_id, thr
      |GROUP BY d.source ORDER BY d.source""".stripMargin
}
