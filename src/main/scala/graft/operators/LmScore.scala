package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Perplexity-proxy quality scoring — the CCNet/Gopher-style LM filter for
  * pretraining data, at the scale-friendly end of the family: a per-language
  * CHARACTER-BIGRAM model trained on the corpus itself (add-one smoothing),
  * each document scored by its mean log2 P(c_i | c_{i-1}). Low scores flag
  * gibberish / wrong-language / boilerplate text exactly the way a real
  * KenLM filter does, with only relational machinery: a row-local
  * bigram-count kernel (one compressed (bg, c) row per distinct bigram per
  * doc — never one row per instance), three tiny per-language aggregates
  * (bigram counts, context counts, vocabulary size — all broadcastable),
  * one keyed re-join, one per-doc aggregate.
  *
  * Cross-engine determinism: each bigram's log term is rounded to 9 dp and
  * cast to DECIMAL before summing — decimal addition is EXACT and
  * order-free, so the per-doc sum is identical regardless of partitioning
  * or engine (a double sum would be accumulation-order-specific and could
  * never hash-oracle). The 6-dp rounded mean then matches DuckDB's
  * recomputation bit-for-bit.
  *
  * At 100 TB: the model tables are O(langs × vocab²) rows — KBs — and
  * broadcast; scoring is a map-side join + one shuffle keyed by doc_id.
  * Training is self-supervised on the scored corpus (the CCNet shape uses
  * a held-out reference corpus; swap the `bi` source to change that). */
object LmScore {

  /** Row-local bigram multiplicities of a normalized string — the compressed
    * (bg, c) pairs the query's `f` relation used to obtain via a corpus-wide
    * explode + (doc, lang, bg) hash aggregation. Bigrams are adjacent CODE
    * POINT pairs, exactly the strings `substr(i, 2)` over
    * `sequence(1, length(s) - 1)` produced (LmScoreSpec pins kernel ≡
    * explode+groupBy corpus-wide plus adversarial unicode legs). Counts are
    * exact integers, so every downstream aggregate regroups bit-identically
    * (the fixed-point-exactness rule in the scoring comment below). Per-row
    * work is O(doc length) — the same linear pass the explode paid, minus
    * the 64-bit-hash shuffle of one row per bigram INSTANCE.
    *
    * r19: the kernel is the codegen expression [[graft.functions
    * .BigramCounts]] (guide §4) — the r18 ScalaUDF made the same decisions
    * but paid a UTF8String→String decode per row, a CatalystTypeConverter
    * re-encode per produced pair, and a WholeStageCodegen break at the
    * projection; the expression walks the raw UTF-8 bytes with zero-copy
    * bigram slices inside codegen. */
  private[graft] def bigramCounts(s: Column): Column =
    graft.functions.LmExpressions.bigram_counts(s)

  def bigramScores(spark: SparkSession, dir: String): DataFrame = {
    val norm = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), TextFunctions.normText(col("text")).as("s"))
    // The compressed per-(doc, bigram) counts, computed ROW-LOCALLY by the
    // kernel above (r18): natural text repeats bigrams heavily, and every
    // downstream step (model training AND scoring) only ever needs the
    // multiplicity, never the instances — the per-doc score regroups as
    // Σ c·t ≡ Σ_instances t BIT-FOR-BIT because t is an exact fixed-point
    // long (see below; a double sum could not be regrouped like this).
    // The old shape exploded one row per bigram INSTANCE (Σ doc-lengths
    // rows) and hash-aggregated them through a corpus-keyed exchange that
    // the three consumers shared via ReusedExchange; compressing inside
    // the row leaves NO corpus-keyed exchange at all — each consumer
    // re-runs the cheap O(doc length) kernel pass instead (guide §2.3/2.4:
    // shuffle fewer bytes, then remove the shuffle outright). F stays
    // uncached (doc-level state must never be the engine's largest cache —
    // the pinned LmScoreSpec contract).
    val f = norm.select(col("doc_id"), col("lang"),
        explode(bigramCounts(col("s"))).as("kv"))
      .select(col("doc_id"), col("lang"),
        col("kv._1").as("bg"), col("kv._2").as("c"))
    // cab derives from F by an exact integer re-aggregation: F's rows are
    // already per-(doc, bg) distinct, so the map-side partial aggregation
    // compresses each task to its distinct (lang, bg) set and the exchange
    // carries model-scale rows. F itself stays UNCACHED (caching would
    // serialize a doc-scale table — the pinned LmScoreSpec contract), but
    // cab IS cached: it is the KB-scale model table (langs × vocab² rows,
    // like vocab below), and caching it lets the context counts derive
    // from it WITHOUT the optimizer re-expanding cab's aggregation chain
    // (the r18 hazard — phrased over an uncached cab, ca re-ran the whole
    // kernel pass; the InMemoryRelation breaks that re-expansion), so the
    // query runs TWO kernel passes over the corpus instead of three
    // (guide §2.4 — remove passes outright).
    val cabCounts = f.groupBy("lang", "bg")
      .agg(sum("c").as("n_ab")).cache()
    val cab = cabCounts
      .select(col("lang"), col("bg"), col("n_ab").cast("double").as("c_ab"))
    // context counts c(a·) = Σ_b c(ab) — an exact integer regrouping of
    // the cached model table (long sums below 2⁵³ cast at the end, no
    // accumulation-order exposure), numerically identical to aggregating
    // the instances directly.
    val ca = cabCounts
      .groupBy(col("lang").as("lang_a"), substring(col("bg"), 1, 1).as("a"))
      .agg(sum("n_ab").cast("double").as("c_a"))
    // per-doc distinct characters BEFORE the explode: the corpus vocabulary
    // is the union of per-doc character sets, so deduplicating row-locally
    // first shrinks the exploded stream from Σ doc-lengths to
    // Σ per-doc-distinct (~5× here, unboundedly more on long docs) with an
    // identical countDistinct result. r19: the row-local step is the
    // codegen expression [[graft.functions.DistinctChars]] — bit-identical
    // to array_distinct(split(s, "")) (LmScoreSpec pins it over the corpus
    // plus unicode edges) without the regex zero-width split's one
    // single-char String allocation per corpus CHARACTER (guide §4).
    val vocab = norm
      .select(col("lang"),
        explode(graft.functions.LmExpressions.distinct_chars(col("s"))).as("c"))
      .groupBy("lang").agg(countDistinct("c").cast("double").as("v")).cache()
    f
      .join(broadcast(cab), Seq("lang", "bg"))
      .join(broadcast(ca),
        col("lang") === col("lang_a") && substring(col("bg"), 1, 1) === col("a"))
      .join(broadcast(vocab), Seq("lang"))
      // log(x)/log(2) SPELLED OUT on both sides (not each engine's log2):
      // only libm's ln ulp variance remains, the same accepted exposure as
      // the Multimodal entropy oracle.
      //
      // The 9-dp term rides as FIXED-POINT 1e-9 units in a LONG, not
      // DECIMAL(20,9) (r18): the sum stays order-free and EXACT — integer
      // addition — but in primitive codegen arithmetic instead of a
      // BigDecimal allocation per row (the (31,9) product left Spark's
      // compact-long decimal range, which made this agg the query's
      // hottest kernel). Exactness bound: |t| < 100 ⇒ |t_units| < 10¹¹,
      // and Σ_doc c·t_units ≤ doc_len·10¹¹ ≪ 2⁶³ for any document a lake
      // stores. rint recovers the 9-dp integer exactly (round(x,9) is
      // within 5e-5 units of it; see the regrouping note above). The
      // final double is bit-identical to the decimal form's: U.toDouble
      // is exact below 2⁵³ and IEEE division rounds once, exactly like
      // the old decimal→double cast.
      .withColumn("t_units",
        rint(round(log((col("c_ab") + 1.0) / (col("c_a") + col("v"))) / log(lit(2.0)), 9)
          * lit(1e9)).cast("long"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).cast("int").as("n_bigrams"),
        round(sum(col("t_units") * col("c")).cast("double") / lit(1e9)
          / sum(col("c")), 6).as("avg_log2p"))
  }

  /** DuckDB mirror: identical counts, identical smoothed terms, identical
    * decimal-exact summation. */
  val bigramScoresSql: String =
    raw"""WITH norm AS (
      |  SELECT doc_id, lang,
      |    lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS s
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, lang,
      |    unnest(list_transform(range(1, length(s)), i -> substr(s, i, 2))) AS bg
      |  FROM norm),
      |cab AS (SELECT lang, bg, count(*)::DOUBLE AS c_ab FROM bi GROUP BY 1, 2),
      |ca AS (SELECT lang, substr(bg, 1, 1) AS a, count(*)::DOUBLE AS c_a
      |       FROM bi GROUP BY 1, 2),
      |vocab AS (
      |  SELECT lang, CAST(count(DISTINCT ch) AS DOUBLE) AS v
      |  FROM (SELECT lang, unnest(split(s, '')) AS ch FROM norm) GROUP BY 1),
      |terms AS (
      |  SELECT b.doc_id, b.lang,
      |    CAST(round(ln((cab.c_ab + 1.0) / (ca.c_a + vocab.v)) / ln(2.0), 9)
      |         AS DECIMAL(20,9)) AS t
      |  FROM bi b
      |  JOIN cab ON cab.lang = b.lang AND cab.bg = b.bg
      |  JOIN ca ON ca.lang = b.lang AND ca.a = substr(b.bg, 1, 1)
      |  JOIN vocab ON vocab.lang = b.lang)
      |SELECT doc_id, lang, CAST(count(*) AS INT) AS n_bigrams,
      |  round(CAST(sum(t) AS DOUBLE) / count(*), 6) AS avg_log2p
      |FROM terms GROUP BY doc_id, lang""".stripMargin
}
