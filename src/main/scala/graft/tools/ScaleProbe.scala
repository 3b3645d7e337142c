package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Empirical scale-exponent guard: run the hot "linear-claim" operators at
  * two scale factors and measure how runtime actually grows with input
  * rows. An operator whose SCALE.md story says "one shuffle, linear" but
  * whose measured exponent creeps toward 2 has a hidden quadratic — this
  * probe is what would have flagged the pre-r6 semanticDedup (exact N×N
  * pair grid) automatically.
  *
  * exponent = log(t_big / t_small) / log(rows_big / rows_small)
  *
  * Method: every probe runs COLD (graft.Caches.clear before each timed
  * run) so it pays its own full pipeline cost, not a sibling's cached
  * state; the session is warmed once so JVM/codegen startup is outside
  * every measurement. Fixed per-query overhead (~0.1-0.5 s of planning)
  * biases exponents DOWN at these SFs — the 1.5 gate is therefore
  * deliberately loose: it catches quadratic blow-ups, not 10% regressions
  * (the bench owns those). The machine-quiet gate is the bench's: the
  * probe sleep-retries for pre-run loadavg < 1 BEFORE any work, records
  * that one sample, and stamps `tainted` in the summary when the gate was
  * never met — per-probe samples would mostly measure the probe's own
  * 32-core burn (the `loadavg_end` lesson).
  *
  * Usage: `sbt 'runMain graft.tools.ScaleProbe'` (env SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SF_SMALL/_BIG override defaults). Emits one JSON line per
  * probe plus a summary line; exits non-zero if any linear-claim probe
  * exceeds the exponent gate. The committed report lives at
  * PROBE_r{N}.json. */
object ScaleProbe {

  /** (probe name, input table whose row count is the scale denominator,
    * query). All claim ≤ linear-ish growth in SCALE.md. */
  private def probes: Seq[(String, String, (SparkSession, String) => DataFrame)] = Seq(
    ("q_dedup_exact", "documents",
      (s: SparkSession, d: String) => graft.operators.Dedup.exact(s, d)),
    ("q_dedup_minhash_pairs", "documents",
      (s: SparkSession, d: String) => graft.operators.Dedup.minhashNearDups(s, d)),
    ("q_dedup_simhash", "documents",
      (s: SparkSession, d: String) => graft.operators.Dedup.simhashSummary(s, d)),
    ("q_dedup_ngram_jaccard", "documents",
      (s: SparkSession, d: String) => graft.operators.Dedup.ngramJaccardPairs(s, d)),
    ("q_lm_score", "documents",
      (s: SparkSession, d: String) => graft.operators.LmScore.bigramScores(s, d)),
    ("q_embed_text", "documents",
      (s: SparkSession, d: String) => graft.operators.TextEmbed.embedQuery(s, d)),
    ("q_embed_text_topk", "documents",
      (s: SparkSession, d: String) => graft.operators.TextEmbed.textNearDupTopK(s, d)),
    ("q_heavy_hitters_exact", "documents",
      (s: SparkSession, d: String) => graft.operators.Sketches.heavyTermsExact(s, d)),
    ("q_decontaminate", "documents",
      (s: SparkSession, d: String) => graft.operators.Curation.decontaminate(s, d)),
    ("q_source_reputation", "documents",
      (s: SparkSession, d: String) => graft.operators.Curation.sourceReputation(s, d)),
    ("q_curation_pipeline", "documents",
      (s: SparkSession, d: String) => graft.operators.Curation.curationPipeline(s, d)),
    ("q_semantic_dedup", "embeddings",
      (s: SparkSession, d: String) => graft.operators.Similarity.semanticDedup(s, d)),
    ("q_ann_lsh", "embeddings",
      (s: SparkSession, d: String) => graft.operators.Similarity.lshTopK(s, d)),
    ("q_semantic_probe", "embeddings",
      (s: SparkSession, d: String) => graft.operators.Similarity.semanticProbe(s, d)))

  val ExponentGate = 1.5

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val sfSmall = sys.env.getOrElse("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")
    val sfBig = sys.env.getOrElse("SPARK_GRAFT_SF_BIG", "/root/testdata/sf0.1")
    val quietThreshold =
      sys.env.getOrElse("SPARK_GRAFT_LOADAVG_MAX", "1.0").toDouble
    val maxWaitMs =
      sys.env.getOrElse("SPARK_GRAFT_LOADAVG_WAIT_SEC", "600").toLong * 1000L
    val loadavgStart = graft.Bench.awaitQuiet(quietThreshold, maxWaitMs)
    // unreadable loadavg ⇒ never verified quiet ⇒ tainted (as in Bench)
    val tainted = !(loadavgStart >= 0.0 && loadavgStart < quietThreshold)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, file-index, JVM) outside every timing,
    // then absorb the first-cold-query JIT cliff with one untimed dry run
    // (without it the first probe's t_small carries ~1.5 s of warm-up and
    // its exponent reads absurdly negative)
    try graft.SparkEntry.entry(spark).queryExecution.toRdd.count()
    catch { case _: Throwable => }
    try {
      graft.Caches.clear(spark)
      probes.head._3(spark, sfSmall).queryExecution.toRdd.count()
    } catch { case _: Throwable => }

    def rowsOf(dir: String, table: String): Long =
      spark.read.parquet(s"$dir/$table.parquet").count()
    def timeCold(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      graft.Caches.clear(spark)
      val t0 = System.nanoTime()
      fn(spark, dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    def r3(v: Double): Double = math.rint(v * 1e3) / 1e3

    var worst = 0.0
    val lines = probes.map { case (name, table, fn) =>
      val (rs, rb) = (rowsOf(sfSmall, table), rowsOf(sfBig, table))
      val ts = timeCold(fn, sfSmall)
      val tb = timeCold(fn, sfBig)
      val exp = math.log(tb / ts) / math.log(rb.toDouble / rs)
      worst = math.max(worst, exp)
      val ok = exp < ExponentGate
      val line = s"""{"probe":"$name","table":"$table","rows_small":$rs,"rows_big":$rb,""" +
        s""""t_small":${r3(ts)},"t_big":${r3(tb)},"exponent":${r3(exp)},"linear_ok":$ok}"""
      println(line)
      (line, ok)
    }
    val allOk = lines.forall(_._2)
    println(s"""{"metric":"scale_probe","gate":$ExponentGate,"worst_exponent":${r3(worst)},"all_linear":$allOk,"loadavg":$loadavgStart,"tainted":$tainted,"sf_small":"$sfSmall","sf_big":"$sfBig"}""")
    spark.stop()
    if (!allOk) sys.exit(1)
  }
}
