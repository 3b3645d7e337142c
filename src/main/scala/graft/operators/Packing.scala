package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Sequence packing — the training-data step that concatenates documents
  * into fixed token-budget sequences (LLM pretraining batches). Two forms:
  *
  *  - [[packContiguous]]: deterministic relational assignment — per-language
  *    cumulative token sum over doc_id order, `pack_id = ⌊cum_before/B⌋`.
  *    Documents may straddle a boundary (they'd be split at tokenization),
  *    which is exactly how streaming pretraining pipelines pack. Pure
  *    window arithmetic → DuckDB oracle.
  *  - [[packNextFit]]: budget-RESPECTING next-fit — close the bin when the
  *    next document would overflow (a document larger than the budget gets
  *    its own bin). Inherently sequential per language, so it runs as the
  *    per-partition kernel after one hash shuffle on the language key:
  *    `repartition(lang) → sortWithinPartitions → mapPartitions`. At 100 TB
  *    the key would be (lang, shard) to bound partition size; packing
  *    quality is unchanged because bins never cross shards.
  */
object Packing {

  val DefaultBudget = 2048

  private def docsWithTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        TextFunctions.bpeTokenCount(col("text")).as("n_tokens"))

  // ---------------------------------------------------------- contiguous
  def packContiguous(spark: SparkSession, dir: String,
      budget: Int = DefaultBudget): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docsWithTokens(spark, dir)
      .withColumn("cum", sum(col("n_tokens").cast("long")).over(w))
      .withColumn("pack_id",
        floor((col("cum") - col("n_tokens")).cast("double") / budget).cast("long"))
      .select("doc_id", "lang", "n_tokens", "pack_id")
  }

  def packContiguousSql(budget: Int = DefaultBudget): String =
    s"""WITH toked AS (
       |  SELECT doc_id, lang,
       |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]')) AS INT)
       |      AS n_tokens
       |  FROM documents),
       |cum AS (
       |  SELECT doc_id, lang, n_tokens,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM toked)
       |SELECT doc_id, lang, n_tokens,
       |  CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE) / $budget) AS BIGINT) AS pack_id
       |FROM cum""".stripMargin

  // ------------------------------------------------------------ next-fit
  case class DocTok(doc_id: Long, lang: String, n_tokens: Int)

  def packNextFit(spark: SparkSession, dir: String,
      budget: Int = DefaultBudget): DataFrame = {
    import spark.implicits._
    docsWithTokens(spark, dir)
      .as[DocTok]
      .repartition(col("lang"))
      .sortWithinPartitions("lang", "doc_id")
      .mapPartitions(it => nextFitAssign(it, budget))
      .toDF("doc_id", "lang", "n_tokens", "pack_key")
  }

  /** Next-fit invariants per language, stated so a plain-SQL oracle can
    * verify the sequential kernel: every document packed exactly once
    * (n_docs anchors against the source table), every pack within budget
    * unless it is a single oversized document, and the pack count obeys the
    * next-fit bounds — at least n_oversized + ⌈(total−oversized)/B⌉ (each
    * regular pack holds ≤ B tokens, each oversized doc is its own pack) and
    * strictly under 2·total/B + 2 (any two consecutive packs sum > B, or
    * the second would not have been opened). All booleans are computed FROM
    * the packed output; the oracle recomputes the per-language row set and
    * doc counts portably and asserts the verdicts. */
  def packBounds(spark: SparkSession, dir: String,
      budget: Int = DefaultBudget): DataFrame = {
    import Invariants.allOf
    val packed = packNextFit(spark, dir, budget)
    val perPack = packed.groupBy("lang", "pack_key")
      .agg(sum(col("n_tokens").cast("long")).as("fill"),
        count(lit(1)).as("n_in_pack"))
    val packsOk = perPack.groupBy("lang").agg(
      count(lit(1)).as("n_packs"),
      allOf(col("fill") <= budget || col("n_in_pack") === 1)
        .as("packs_within_budget"))
    val docsAgg = packed.groupBy("lang").agg(
      count(lit(1)).as("n_docs_l"),
      sum(col("n_tokens").cast("long")).as("total_tokens"),
      sum(when(col("n_tokens") > budget, 1L).otherwise(0L)).as("n_over"),
      sum(when(col("n_tokens") > budget, col("n_tokens").cast("long"))
        .otherwise(0L)).as("over_tokens"))
    docsAgg.join(packsOk, "lang")
      .select(col("lang"),
        col("n_docs_l").cast("int").as("n_docs"),
        col("packs_within_budget"),
        (col("n_packs") >= col("n_over") +
          ceil((col("total_tokens") - col("over_tokens")).cast("double") / budget))
          .as("pack_count_lower_ok"),
        (col("n_packs").cast("double") <
          col("total_tokens").cast("double") * 2.0 / budget + 2.0)
          .as("pack_count_upper_ok"))
  }

  def packBoundsSql: String =
    """SELECT lang, CAST(COUNT(*) AS INT) AS n_docs,
      |  true AS packs_within_budget,
      |  true AS pack_count_lower_ok,
      |  true AS pack_count_upper_ok
      |FROM documents GROUP BY lang""".stripMargin

  /** Sequential next-fit kernel (one partition): open a new bin when the
    * language changes or the document would overflow the budget; key =
    * (lang, PER-LANG bin counter starting at 0) — unique, deterministic
    * given the sort, and independent of how languages co-reside in shuffle
    * partitions (a cross-lang running counter would make pack keys a
    * function of `spark.sql.shuffle.partitions`). A document larger than
    * the budget gets a bin of its own. */
  def nextFitAssign(it: Iterator[DocTok],
      budget: Int): Iterator[(Long, String, Int, String)] = {
    // `!started` (not a null sentinel) opens the first bin even when the
    // first document's lang is itself null
    var started = false
    var curLang: String = null
    var packSeq = 0L
    var fill = 0L
    it.map { d =>
      if (!started || d.lang != curLang) {
        started = true
        curLang = d.lang
        packSeq = 0L
        fill = 0L
      } else if (fill + d.n_tokens > budget) {
        packSeq += 1
        fill = 0L
      }
      fill += d.n_tokens
      (d.doc_id, d.lang, d.n_tokens, s"${d.lang}_$packSeq")
    }
  }

  /** Full oracle for [[packNextFit]]: the sequential fold re-run as a
    * DuckDB RECURSIVE CTE — one state row per (lang, position), each step
    * advancing every language's chain by one document. Exact because the
    * kernel's order (lang, doc_id) and its open-new-bin rule are both
    * replicated; recursion depth = max docs per language. */
  // ------------------------------------------------------------- chunking
  /** Overlapping token-window chunking — the tokenize-and-split step that
    * turns variable-length documents into training-window-sized pieces
    * (the fixed-context precursor to packing): windows of `window` tokens
    * every `stride` tokens, plus one END-ANCHORED window whenever the
    * stride grid would strand a tail shorter than `window` — with
    * stride ≤ window this guarantees every token lands in ≥ 1 chunk
    * (sliding-window chunking with tail anchoring, as used by
    * context-window preprocessors). Entirely row-local higher-order-
    * function arithmetic (sequence/slice/explode — no UDF, no shuffle):
    * each document expands to its own chunks wherever it already lives.
    * Chunk content is reported as md5 of the space-joined window (exact,
    * engine-portable) so the oracle verifies the tokens themselves. */
  def chunkDocuments(spark: SparkSession, dir: String,
      window: Int = 64, stride: Int = 32): DataFrame =
    chunkTokens(
      Tables.spread(spark, Tables.documents(spark, dir))
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t")),
      window, stride)

  /** THE chunk kernel over any (doc_id, t ARRAY<STRING>) token frame —
    * shared by the whitespace-token query above (oracled) and the
    * real-BPE-token twin [[chunkDocumentsBpe]], so the two differ ONLY in
    * the tokenizer feeding them. */
  private[graft] def chunkTokens(toked: DataFrame,
      window: Int, stride: Int): DataFrame =
    chunkRows(toked, window, stride)
      .select(col("doc_id"), col("chunk_pos"),
        col("start_idx"),
        size(col("chunk")).as("n_chunk_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_sig"))

  /** The kernel one projection earlier — (doc_id, chunk_pos, start_idx,
    * chunk ARRAY<STRING>) — for consumers that need the chunk CONTENT
    * (the RAG retrieval chain embeds it), not just its digest. */
  private[graft] def chunkRows(toked: DataFrame,
      window: Int, stride: Int): DataFrame = {
    require(stride <= window, "stride > window would strand tokens between chunks")
    val anchor = greatest(lit(1), col("n") - (window - 1))
    toked
      .withColumn("n", size(col("t")))
      .withColumn("starts", array_union(
        sequence(lit(1), anchor, lit(stride)), array(anchor)))
      .select(col("doc_id"), col("t"), col("n"),
        posexplode(col("starts")).as(Seq("chunk_pos", "s")))
      .withColumn("chunk", slice(col("t"), col("s"), lit(window)))
      .select(col("doc_id"), col("chunk_pos"), col("s").as("start_idx"),
        col("chunk"))
  }

  /** Chunking on the REAL token bill: the same window/stride/anchor
    * kernel run over the BPE token stream [[BpeEncode]] produces (each
    * doc's per-word token arrays flattened in order), so chunk
    * boundaries land where a trained tokenizer would put them — the
    * difference between "64 words" and "64 tokens" is exactly what makes
    * context-window packing honest. Fully hash-oracled since r17 via
    * [[chunkDocumentsBpeSql]]: DuckDB replays the whole train→encode
    * chain ([[BpeEncode.encodedCtes]]) and runs the same chunk kernel on
    * the re-derived token stream; PackingSpec additionally pins coverage
    * + stream reassembly on the BPE side. */
  def chunkDocumentsBpe(spark: SparkSession, dir: String,
      window: Int = 64, stride: Int = 32): DataFrame =
    chunkTokens(
      BpeEncode.encodedWordToks(spark, dir)
        .select(col("doc_id"), flatten(col("word_toks")).as("t")),
      window, stride)

  /** THE chunk-kernel SQL tail over any source CTE exposing
    * (doc_id, t LIST(VARCHAR)) — stride grid, tail anchor, slicing, md5
    * rendering. ONE text shared by the whitespace-token oracle and the
    * BPE-stream oracle, mirroring how the Spark twins share
    * [[chunkTokens]]: a kernel edit can no longer reach one oracle and
    * silently miss the other (r17 review). */
  private def chunkKernelSql(src: String, window: Int, stride: Int): String =
    s"""sized AS (SELECT doc_id, t, len(t) AS n FROM $src),
       |grid AS (
       |  SELECT doc_id, t, n,
       |    greatest(1, n - ${window - 1}) AS anchor,
       |    range(1, greatest(1, n - ${window - 1}) + 1, $stride) AS base
       |  FROM sized),
       |st AS (
       |  SELECT doc_id, t,
       |    CASE WHEN list_contains(base, anchor) THEN base
       |         ELSE list_append(base, anchor) END AS starts
       |  FROM grid),
       |ex AS (
       |  SELECT doc_id, t,
       |    UNNEST(list_transform(range(len(starts)),
       |      i -> struct_pack(pos := i, s := starts[i + 1]))) AS u
       |  FROM st)
       |SELECT doc_id,
       |  CAST(u.pos AS INT) AS chunk_pos,
       |  CAST(u.s AS INT) AS start_idx,
       |  CAST(len(list_slice(t, u.s, u.s + ${window - 1})) AS INT) AS n_chunk_tokens,
       |  md5(array_to_string(list_slice(t, u.s, u.s + ${window - 1}), ' ')) AS chunk_sig
       |FROM ex""".stripMargin

  /** DuckDB oracle for [[chunkDocuments]] — same tokenization, stride
    * grid, tail anchor, slicing, and md5 rendering. */
  def chunkDocumentsSql(window: Int = 64, stride: Int = 32): String =
    raw"""WITH toked AS (
      |  SELECT doc_id,
      |    list_filter(str_split(lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g'))), ' '),
      |                x -> x <> '') AS t
      |  FROM documents),
      |""".stripMargin + chunkKernelSql("toked", window, stride)

  /** Full oracle for [[chunkDocumentsBpe]] (r17): the BPE token stream
    * per document is the ordered flatten of the replayed per-word encode
    * (`wtoks`), and the window/stride/anchor/slice/md5 kernel below is
    * the SAME text as [[chunkDocumentsSql]]'s tail — only the `t` feeding
    * it differs, mirroring how the Spark twins share `chunkTokens`. The
    * documents LEFT JOIN restores zero-word documents, which chunk to one
    * empty window on the Spark side. */
  def chunkDocumentsBpeSql(window: Int = 64, stride: Int = 32,
      merges: Int = 20): String =
    BpeEncode.encodedCtes(merges) +
      """,
        |stream0 AS (
        |  SELECT doc_id, flatten(list(toks ORDER BY i ASC)) AS t FROM wtoks GROUP BY doc_id),
        |stream AS (
        |  SELECT d.doc_id, COALESCE(s.t, []) AS t
        |  FROM documents d LEFT JOIN stream0 s ON d.doc_id = s.doc_id),
        |""".stripMargin + chunkKernelSql("stream", window, stride)

  def packNextFitSql(budget: Int = DefaultBudget): String =
    s"""WITH RECURSIVE toked AS (
       |  SELECT doc_id, lang,
       |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]')) AS INT)
       |      AS n_tokens
       |  FROM documents),
       |ord AS (
       |  SELECT doc_id, lang, n_tokens,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
       |  FROM toked),
       |packed AS (
       |  SELECT doc_id, lang, n_tokens, rn,
       |         CAST(0 AS BIGINT) AS seq, CAST(n_tokens AS BIGINT) AS fill
       |  FROM ord WHERE rn = 1
       |  UNION ALL
       |  SELECT o.doc_id, o.lang, o.n_tokens, o.rn,
       |         CASE WHEN p.fill + o.n_tokens > $budget THEN p.seq + 1 ELSE p.seq END,
       |         CASE WHEN p.fill + o.n_tokens > $budget
       |              THEN CAST(o.n_tokens AS BIGINT) ELSE p.fill + o.n_tokens END
       |  FROM packed p JOIN ord o
       |    ON o.lang IS NOT DISTINCT FROM p.lang AND o.rn = p.rn + 1)
       |SELECT doc_id, lang, n_tokens,
       |       COALESCE(lang, 'null') || '_' || seq AS pack_key
       |FROM packed""".stripMargin

  // ------------------------------------------------------ length bucketing
  /** Quartile length bucketing + padding-waste audit — the "bucketed
    * batching" decision a padded-batch training loader makes: group docs
    * of similar token length so a batch's padding overhead (pad-to-max)
    * stays small, and REPORT that overhead per bucket so the bucket count
    * is a measured decision, not a guess. padding_waste = what pad-to-max
    * costs inside the bucket (max·n − Σtokens); waste_frac is that as a
    * share of the padded volume. Compare bucket 3's waste under 4 buckets
    * vs one global bucket to see what the bucketing bought.
    *
    * Scale shape: boundaries are ONE scalar aggregate (exact `percentile`
    * here, swap for `approx_percentile`'s fixed-size mergeable sketch at
    * 100 TB — the audit tolerates approximate cuts), bucketing is a
    * map-side CASE against three broadcast literals, and the per-bucket
    * stats are a 4-group map-combinable aggregate. No shuffle touches
    * doc-level rows beyond the one 4-key hash exchange. */
  def lengthBuckets(spark: SparkSession, dir: String): DataFrame = {
    // the memoized quality column IS tokenCount(text) — read the
    // materialized metadata, don't re-tokenize the lake
    val toks = TextFunctions.qualityQuery(spark, dir)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
    val b = toks.agg(
      expr("percentile(n_tokens, 0.25)"),
      expr("percentile(n_tokens, 0.5)"),
      expr("percentile(n_tokens, 0.75)")).first()
    val (b1, b2, b3) = (b.getDouble(0), b.getDouble(1), b.getDouble(2))
    toks
      .withColumn("bucket",
        when(col("n_tokens") <= b1, 0)
          .when(col("n_tokens") <= b2, 1)
          .when(col("n_tokens") <= b3, 2)
          .otherwise(3).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("n_tokens").as("min_tokens"), max("n_tokens").as("max_tokens"),
        sum("n_tokens").as("sum_tokens"))
      .withColumn("padding_waste",
        col("max_tokens") * col("n_docs") - col("sum_tokens"))
      .withColumn("waste_frac",
        when(col("max_tokens") * col("n_docs") === 0, lit(0.0))
          .otherwise(round(col("padding_waste").cast("double")
            / (col("max_tokens") * col("n_docs")).cast("double"), 6)))
  }

  /** DuckDB oracle for [[lengthBuckets]] — `quantile_cont` is the same
    * linear-interpolated exact percentile as Spark's `percentile` (parity
    * already pinned by q_percentiles). */
  val lengthBucketsSql: String =
    raw"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
       |      x -> x <> '')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |b AS (SELECT quantile_cont(n_tokens, 0.25) AS b1,
       |             quantile_cont(n_tokens, 0.5)  AS b2,
       |             quantile_cont(n_tokens, 0.75) AS b3 FROM t),
       |g AS (
       |  SELECT CASE WHEN n_tokens <= b1 THEN 0
       |              WHEN n_tokens <= b2 THEN 1
       |              WHEN n_tokens <= b3 THEN 2 ELSE 3 END AS bucket,
       |         n_tokens
       |  FROM t CROSS JOIN b)
       |SELECT CAST(bucket AS INT) AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens,
       |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(MAX(n_tokens) * COUNT(*) - SUM(n_tokens) AS BIGINT) AS padding_waste,
       |  CASE WHEN MAX(n_tokens) * COUNT(*) = 0 THEN 0.0
       |       ELSE ROUND((MAX(n_tokens) * COUNT(*) - SUM(n_tokens))
       |              / CAST(MAX(n_tokens) * COUNT(*) AS DOUBLE), 6) END AS waste_frac
       |FROM g GROUP BY 1""".stripMargin
}
