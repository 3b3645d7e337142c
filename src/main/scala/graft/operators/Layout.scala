package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.BitExpressions.interleave_bits
import graft.functions.TextFunctions

/** Z-order data layout: cluster a table on the Morton curve of two join/
  * filter dimensions before writing, so parquet min/max statistics prune
  * files for box predicates on EITHER dimension.
  *
  * Why a layout operator at all: partition pruning handles the partition
  * column, and a single-column sort gives tight file stats on that column
  * only — a 100 TB fact table queried by both (part, supplier) needs the
  * 2-D clustering or one of the two predicates always scans everything.
  * The curve key is computed by the codegen'd [[graft.functions.InterleaveBits]]
  * expression; the write is `repartitionByRange(z)` + in-partition sort, so
  * file k holds a contiguous z-range (range exchange samples the key — no
  * driver-side histogram needed).
  */
object Layout {

  /** 16-bit bucketized dimensions + the Morton key, per lineitem row — the
    * oracle recomputes z bit-by-bit in SQL, making the codegen'd expression
    * itself gate-checked. */
  def zorderValues(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      pmod(col("l_partkey"), lit(65536)).cast("int").as("pb"),
      pmod(col("l_suppkey"), lit(65536)).cast("int").as("sb"))
      .withColumn("z", interleave_bits(col("pb"), col("sb")))

  val zorderValuesSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(l_partkey % 65536 AS INT) AS pb,
      |  CAST(l_suppkey % 65536 AS INT) AS sb,
      |  CAST(list_sum(list_transform(range(0, 16), i ->
      |    (((CAST(l_partkey % 65536 AS BIGINT) >> i) & 1) << (2*i)) +
      |    (((CAST(l_suppkey % 65536 AS BIGINT) >> i) & 1) << (2*i + 1))))
      |    AS BIGINT) AS z
      |FROM lineitem""".stripMargin

  /** Write `df` clustered on the z-curve of (xCol, yCol) into `numFiles`
    * contiguous z-ranges.
    *
    * Each dimension is first normalized to `2^bits` equal-width buckets:
    * interleaving RAW values lets the wider-ranged column monopolize the
    * curve's high bits (a 4-bit column interleaved with a 20-bit one gets
    * no say in where files split), which is why production z-order
    * implementations bucketize per column before interleaving. Bucket
    * bounds come from one O(1) min/max scalar aggregate — the same
    * statistics a catalog would hold at 100 TB. */
  def zorderedWrite(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int, path: String, bits: Int = 8): Unit =
    zorderCluster(df, xCol, yCol, numFiles, bits)
      .write.mode("overwrite").parquet(path)

  /** The clustering transform alone: `df` redistributed into `numFiles`
    * contiguous z-ranges (range-partitioned + sorted on the Morton key,
    * key dropped). Returns `df` unchanged when empty/all-null clustering
    * columns leave nothing to cluster. Also the OPTIMIZE ZORDER path for
    * `serve/TxTable.compact`. */
  def zorderCluster(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int, bits: Int = 8): DataFrame = {
    val nb = 1 << bits
    val r = df.agg(min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).first()
    // empty input / all-null clustering column: there is nothing to
    // cluster — pass through instead of dying on a null min/max
    if (r.anyNull) return df
    def bucket(c: String, lo: Double, hi: Double) =
      least(width_bucket(col(c).cast("double"), lit(lo), lit(hi + 1.0), lit(nb)) - 1,
        lit(nb - 1)).cast("int")
    df.withColumn("__z", interleave_bits(
        bucket(xCol, r.getDouble(0), r.getDouble(1)),
        bucket(yCol, r.getDouble(2), r.getDouble(3))))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  // ------------------------------------------- training-order shuffle/shards

  /** Default token budget per training shard (tokens, not docs — shard
    * size is what the training loader cares about). */
  val ShardTokens = 5000L

  /** Hash-order buckets = the top `ShuffleTopBits` bits of the signed
    * shuffle key (arithmetic shift preserves two's-complement order, so
    * bucket ranges ARE contiguous key ranges). 64 here; production sets
    * this ~log2(cluster parallelism) — the only state that ever reaches
    * the driver is 2^topBits partial sums. */
  val ShuffleTopBits = 6

  /** The portable shuffle key: the same engine-portable polynomial hash
    * the split assignment ranks with ([[graft.functions.HashExpressions
    * .poly_token_hash]] over "docId:seed"), so the DuckDB oracle re-derives
    * the full permutation bit-for-bit. */
  private def shuffleKey(id: Column, seed: Int): Column =
    graft.functions.HashExpressions.poly_token_hash(
      concat(id.cast("string"), lit(s":$seed")))

  /** Seeded training-order shuffle + token-budget shard assignment — the
    * export step of the curation story: a training run wants the corpus in
    * a deterministic pseudo-random order (decorrelated from ingest order)
    * cut into shards of ~`shardTokens` tokens each, and it wants the SAME
    * permutation every re-export (resumable jobs, reproducible runs — no
    * RNG state, content-independent of row order and partitioning).
    *
    * Per doc: its shuffle key, real whitespace token bill, the EXACT
    * number of corpus tokens preceding it in shuffle order (`cum_before`),
    * and its shard = cum_before div shardTokens — greedy contiguous fill,
    * so shard k starts at exactly k·shardTokens tokens into the stream.
    *
    * Scale shape — a global running total is a prefix sum, and the naive
    * spelling (`sum().over(Window.orderBy(key))`) funnels the corpus
    * through ONE task. This is the classic two-phase decomposition
    * instead:
    *   1. per-BUCKET token subtotals (buckets = top bits of the key —
    *      contiguous key ranges by construction), one map-side-combined
    *      groupBy producing 2^topBits rows;
    *   2. driver prefix over those subtotals (metadata scale — the same
    *      O(#partitions) state Spark's own range exchange collects),
    *      broadcast back as each bucket's starting offset;
    *   3. within-bucket exact cumulative sum, window PARTITIONED by
    *      bucket — ~corpus/2^topBits rows per window task, and topBits
    *      scales with the cluster.
    * Equality with the one-task global window is pinned in LayoutSpec;
    * the DuckDB oracle computes the global form directly. */
  def shuffleShards(spark: SparkSession, dir: String, seed: Int = 42,
      shardTokens: Long = ShardTokens,
      topBits: Int = ShuffleTopBits): DataFrame =
    shuffleShardsOfCounts(spark, corpusTokenCounts(spark, dir),
      seed, shardTokens, topBits)

  /** The corpus-level (doc_id, n_tokens) source: the MEMOIZED quality
    * columns (`TextFunctions.qualityQuery` — n_tokens there IS
    * `tokenCount(text)`, the same whitespace definition this operator's
    * oracle re-derives) instead of a fresh full-text tokenizer scan. At
    * 100 TB n_tokens is a materialized per-ingest metadata column (the
    * quality-memo contract); the shard dealer reads it — it never
    * re-tokenizes the lake. */
  private def corpusTokenCounts(spark: SparkSession, dir: String): DataFrame =
    graft.functions.TextFunctions.qualityQuery(spark, dir)
      .select(col("doc_id"), col("n_tokens"))

  /** [[shuffleShards]] over any (doc_id, text) frame, with the export's
    * token stream starting at `startTokens` (0 for a fresh export; the
    * next shard boundary past the frozen prefix for the incremental
    * form).
    *
    * Zero-token (whitespace-only) docs are EXCLUDED from assignment: they
    * contribute nothing to a training shard, and — because a zero-token
    * doc's `cum_before` can land EXACTLY on the export's final token total
    * — one sorting last in a frozen generation whose total is an exact
    * multiple of `shardTokens` would take shard id total/shardTokens, the
    * very id the next generation's ceil(hw/B)·B boundary start hands to
    * ITS first doc, gluing two generations into one shard and reopening a
    * frozen shard file. With every assigned doc ≥ 1 token, each doc's
    * `cum_before` is strictly below the generation's token total, so
    * max(shard) < base/B and generations stay disjoint by arithmetic. */
  def shuffleShardsOf(spark: SparkSession, input: DataFrame, seed: Int = 42,
      shardTokens: Long = ShardTokens, topBits: Int = ShuffleTopBits,
      startTokens: Long = 0L): DataFrame =
    shuffleShardsOfCounts(spark,
      input.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
      seed, shardTokens, topBits, startTokens)

  /** The shard dealer over PRE-COMPUTED per-doc token counts — the
    * EXPLICIT entry point for the materialized-metadata path (the quality
    * memo's n_tokens IS this operator's whitespace token definition, see
    * [[corpusTokenCounts]]). A separate function, not schema sniffing on
    * the text form: an input that merely happens to carry an `n_tokens`
    * column computed under some OTHER tokenizer must keep tokenizing the
    * text, never silently change shard assignment semantics — the caller
    * opts into trusting its counts by calling this. */
  def shuffleShardsOfCounts(spark: SparkSession, counts: DataFrame,
      seed: Int = 42, shardTokens: Long = ShardTokens,
      topBits: Int = ShuffleTopBits, startTokens: Long = 0L): DataFrame = {
    val docs = counts
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("shuffle_key", shuffleKey(col("doc_id"), seed))
      .withColumn("bucket",
        (shiftright(col("shuffle_key"), 64 - topBits) +
          (1L << (topBits - 1))).cast("int"))
    // phase 1+2: per-bucket subtotals → driver prefix. ≤ 2^topBits rows —
    // the metadata-scale collect every two-phase prefix sum pays.
    val subtotals = docs.groupBy("bucket").agg(sum("n_tokens").as("btok"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = subtotals.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (b, t)) => (b, acc + t)
    }.sliding(2).collect { case Array((_, off), (b, _)) => (b, off) }.toSeq
    val offDf = spark.createDataFrame(offsets).toDF("bucket", "offset")
    // phase 3: within-bucket exact running total + the bucket's offset
    val w = Window.partitionBy("bucket")
      .orderBy(col("shuffle_key").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(broadcast(offDf), "bucket")
      .withColumn("cum_before",
        lit(startTokens) + col("offset") + sum("n_tokens").over(w) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("shuffle_key"),
        col("cum_before"),
        expr(s"CAST(cum_before DIV $shardTokens AS INT)").as("shard"))
  }

  /** DuckDB oracle for [[shuffleShards]]: the SAME portable hash, the
    * global one-window spelling of the prefix sum (the oracle is allowed
    * the single-task form the operator must avoid), and the SAME
    * zero-token exclusion. */
  def shuffleShardsSql(seed: Int = 42,
      shardTokens: Long = ShardTokens): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+'),
       |      x -> x <> '')) AS BIGINT) AS n_tokens,
       |    ${TextFunctions.wrapSignedSql("hu")} AS shuffle_key
       |  FROM (SELECT doc_id, text,
       |      ${TextFunctions.polyMixSql(s"doc_id::VARCHAR || ':$seed'")} AS hu
       |    FROM documents)),
       |c AS (
       |  SELECT doc_id, n_tokens, shuffle_key,
       |    CAST(SUM(n_tokens) OVER (ORDER BY shuffle_key, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
       |      AS BIGINT) AS cum_before
       |  FROM t WHERE n_tokens > 0)
       |SELECT doc_id, n_tokens, shuffle_key, cum_before,
       |  CAST(cum_before // $shardTokens AS INT) AS shard
       |FROM c""".stripMargin

  /** INCREMENTAL export — the production form of [[shuffleShards]] for a
    * growing lake: a training export is frozen once written (shard files
    * are immutable, loaders may already have streamed them), so newly
    * landed documents must never re-deal the existing permutation. The
    * frozen prefix (even doc_ids — the repo's incremental convention)
    * keeps its original assignment BIT-FOR-BIT; the new batch (odd ids)
    * is shuffled among itself and appended starting at the next shard
    * boundary past the frozen token total — old shards are never
    * reopened, and the new generation's shards are fresh ids.
    *
    * The only cross-generation state is ONE number: the frozen export's
    * token high-water mark (in production a manifest read — here
    * recomputed as a scalar aggregate). Per-generation work is the same
    * two-phase prefix sum as the full export. LayoutSpec pins the frozen
    * prefix, the fresh-boundary start, and generation-disjoint shards. */
  def shuffleShardsIncremental(spark: SparkSession, dir: String,
      seed: Int = 42, shardTokens: Long = ShardTokens,
      topBits: Int = ShuffleTopBits): DataFrame = {
    val all = corpusTokenCounts(spark, dir)
    val oldDocs = all.filter(col("doc_id") % 2 === 0)
    val newDocs = all.filter(col("doc_id") % 2 === 1)
    val frozen = shuffleShardsOfCounts(spark, oldDocs, seed, shardTokens, topBits)
    val oldTotal = frozen.agg(coalesce(sum("n_tokens"), lit(0L)))
      .first().getLong(0)
    val base = ((oldTotal + shardTokens - 1) / shardTokens) * shardTokens
    val appended =
      shuffleShardsOfCounts(spark, newDocs, seed, shardTokens, topBits, base)
    frozen.withColumn("generation", lit(0))
      .unionByName(appended.withColumn("generation", lit(1)))
  }

  /** DuckDB oracle for [[shuffleShardsIncremental]]: both halves' global
    * prefix sums, the new half offset by the frozen total rounded up to
    * the next shard boundary. */
  def shuffleShardsIncrementalSql(seed: Int = 42,
      shardTokens: Long = ShardTokens): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+'),
       |      x -> x <> '')) AS BIGINT) AS n_tokens,
       |    ${TextFunctions.wrapSignedSql("hu")} AS shuffle_key
       |  FROM (SELECT doc_id, text,
       |      ${TextFunctions.polyMixSql(s"doc_id::VARCHAR || ':$seed'")} AS hu
       |    FROM documents)),
       |base AS (
       |  SELECT CAST(((COALESCE(SUM(n_tokens), 0) + $shardTokens - 1)
       |    // $shardTokens) * $shardTokens AS BIGINT) AS b0
       |  FROM t WHERE doc_id % 2 = 0),
       |oldc AS (
       |  SELECT doc_id, n_tokens, shuffle_key,
       |    CAST(SUM(n_tokens) OVER (ORDER BY shuffle_key, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
       |      AS BIGINT) AS cum_before
       |  FROM t WHERE doc_id % 2 = 0 AND n_tokens > 0),
       |newc AS (
       |  SELECT doc_id, n_tokens, shuffle_key,
       |    CAST(base.b0 + SUM(n_tokens) OVER (ORDER BY shuffle_key, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
       |      AS BIGINT) AS cum_before
       |  FROM t CROSS JOIN base WHERE doc_id % 2 = 1 AND n_tokens > 0)
       |SELECT doc_id, n_tokens, shuffle_key, cum_before,
       |  CAST(cum_before // $shardTokens AS INT) AS shard,
       |  CAST(0 AS INT) AS generation
       |FROM oldc
       |UNION ALL
       |SELECT doc_id, n_tokens, shuffle_key, cum_before,
       |  CAST(cum_before // $shardTokens AS INT) AS shard,
       |  CAST(1 AS INT) AS generation
       |FROM newc""".stripMargin

  /** Materialize the shuffled export: shard directories under `path`
    * (`shard=k/`), each file's rows in shuffle order — what a training
    * loader streams. One extra hash-partitioned exchange on `shard` (the
    * write fan-out); the in-file order comes from the per-partition sort,
    * not a global one. */
  def shuffledWrite(spark: SparkSession, dir: String, path: String,
      seed: Int = 42, shardTokens: Long = ShardTokens): Unit = {
    val plan = shuffleShards(spark, dir, seed, shardTokens)
    Tables.documents(spark, dir)
      .join(plan.select("doc_id", "shuffle_key", "cum_before", "shard"), "doc_id")
      .repartition(col("shard"))
      .sortWithinPartitions("shuffle_key", "doc_id")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }
}
