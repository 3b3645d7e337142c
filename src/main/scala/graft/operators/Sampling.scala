package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Stratified sampling with EXACT per-stratum allocation — the curation
  * step that draws a fixed-rate sample per language (or domain) for
  * eval sets, quality audits, and mixture rebalancing.
  *
  * `DataFrame.sampleBy` is Bernoulli: each row flips a coin, so the
  * per-stratum count is binomial-noisy and non-reproducible across
  * partitionings. This operator instead ranks each stratum by a
  * deterministic per-row hash (xxhash64(doc_id, seed) — a fixed random
  * permutation of the stratum) and keeps exactly ⌈frac·n_s⌉ rows, so
  *  - the sample is reproducible under repartitioning/retries (rank ties
  *    broken by doc_id → total order), and
  *  - downstream token-budget math can rely on exact counts.
  *
  * Scale shape: one hash shuffle on the stratum key; the rank is a window
  * over each stratum. At 100 TB a mega-stratum would bottleneck its single
  * window partition — the documented fix is the two-phase form (sample a
  * hash THRESHOLD from the per-stratum count, filter rows below it — no
  * global sort), which trades exactness for O(1) per-row work; the exact
  * form here is the contract both must satisfy on bounded strata.
  */
object Sampling {

  /** The sampled rows (deterministic; membership is hash-defined and
    * engine-specific, so this is gate-checked via [[stratifiedSummary]]). */
  def stratifiedSample(spark: SparkSession, dir: String,
      frac: Double = 0.1, seed: Int = 42): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val w = Window.partitionBy("lang")
      .orderBy(xxhash64(col("doc_id"), lit(seed)), col("doc_id"))
    // the per-stratum count rides the SAME exchange the rank needs (an
    // unordered window over the stratum) — one scan, one shuffle, no
    // side aggregation + join
    docs.withColumn("rk", row_number().over(w))
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy("lang")))
      .filter(col("rk") <= ceil(col("n_docs") * frac))
      .select("doc_id", "lang")
  }

  /** Per-stratum summary with the EXACT allocation the operator promises:
    * n_sampled = ⌈frac·n_docs⌉ precisely — a full-strength oracle (the
    * counts are portable arithmetic), not a statistical bound. */
  def stratifiedSummary(spark: SparkSession, dir: String,
      frac: Double = 0.1, seed: Int = 42): DataFrame = {
    val sampled = stratifiedSample(spark, dir, frac, seed)
      .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
    Tables.documents(spark, dir).groupBy("lang")
      .agg(count(lit(1)).as("n_docs"))
      .join(sampled, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
  }

  // ------------------------------------------ cluster-balanced sampling
  /** Embedding-cluster assignment for every embedded document: nearest
    * lang-seeded centroid over the hashed-text vectors — the SAME
    * deterministic coarse quantizer the IVF text twin uses
    * (`TextEmbed.textIvfTopK`), so the whole assignment is closed-form
    * and the sampler's allocation oracle re-derives it in SQL. */
  private def clusterAssign(spark: SparkSession, dir: String): DataFrame = {
    val vecs = TextEmbed.embeddings(spark, dir)
      .join(Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang").as("label")), "doc_id")
      .select(col("doc_id").as("vec_id"), col("label"), col("emb"))
    val cents = Similarity.meanVectors(
        vecs.select(col("label"), col("emb")), "label", "emb")
      .withColumnRenamed("label", "c_label")
    Similarity.nearestCells(vecs, cents, 1)
      .select(col("vec_id").as("doc_id"), col("cell").as("cluster"))
  }

  /** Cluster-BALANCED sample: an equal per-cluster budget drawn with the
    * same deterministic hash-rank as [[stratifiedSample]] — the
    * topic-debias step of a data-mixing pipeline (a skewed corpus
    * contributes at most `budget` docs per embedding cluster, so one
    * dominant topic cannot crowd the mixture). Strata here are LEARNED
    * (embedding clusters), not metadata — the composition of the
    * similarity tier's quantizer with the sampling tier's exact
    * allocator, both already oracled on their own. Membership is
    * hash-defined (engine-specific) → rows-only, gate-checked via the
    * fully-oracled allocation summary below. */
  def clusterBalancedSample(spark: SparkSession, dir: String,
      budget: Int = 40, seed: Int = 42): DataFrame = {
    val w = Window.partitionBy("cluster")
      .orderBy(xxhash64(col("doc_id"), lit(seed)), col("doc_id"))
    clusterAssign(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= budget)
      .select("doc_id", "cluster")
  }

  /** Per-cluster allocation: n_sampled = least(budget, n_docs) EXACTLY —
    * and because the cluster assignment is the deterministic lang-seeded
    * quantizer, the DuckDB oracle recomputes the clusters themselves
    * (embed chain → centroids → nearest-cell) before checking the
    * arithmetic. */
  def clusterBalancedSummary(spark: SparkSession, dir: String,
      budget: Int = 40, seed: Int = 42): DataFrame = {
    val sampled = clusterBalancedSample(spark, dir, budget, seed)
      .groupBy("cluster").agg(count(lit(1)).as("n_sampled"))
    clusterAssign(spark, dir)
      .groupBy("cluster").agg(count(lit(1)).as("n_docs"))
      .join(sampled, Seq("cluster"), "left")
      .select(col("cluster"), col("n_docs"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
  }

  def clusterBalancedSummarySql(budget: Int = 40): String =
    s"""WITH ${Similarity.ivfSqlCtesOver(TextEmbed.labeledVecsCtes)}
       |SELECT assigned_label AS cluster,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(LEAST($budget, COUNT(*)) AS BIGINT) AS n_sampled
       |FROM assign GROUP BY 1""".stripMargin

  def stratifiedSummarySql(frac: Double = 0.1): String =
    // CAST the fraction to DOUBLE: a bare decimal literal types as DECIMAL
    // in DuckDB, whose exact ceil could disagree with Spark's IEEE-double
    // product on a boundary-crossing count — both sides must compute in
    // the same number system
    s"""SELECT lang,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(CEIL(COUNT(*) * CAST($frac AS DOUBLE)) AS BIGINT) AS n_sampled
       |FROM documents GROUP BY lang""".stripMargin
}
