package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of q_dsir_weights — the bench's stable top line
  * (4.9 s driver / 4.1 s pin through r17). Times each pipeline stage in
  * isolation so the optimization lands where the cost actually is
  * (feature explode+hash vs bucket LMs vs score join vs the rank-select
  * machinery). The ProfileDedup pattern. */
object ProfileDsir {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($n rows)")
    }
    import graft.operators.Curation
    val docs = graft.Tables.spread(spark, graft.Tables.documents(spark, dir))
    t("scan documents") { docs.count() }
    val raw = Curation.dsirFeatures(docs.select("doc_id", "lang", "text"), 4096)
    t("feature explode+hash (uncached)") { raw.count() }
    val feats = Curation.compressFeatures(raw).cache()
    t("compress (cold+cache)") { feats.count() }
    t("compress (warm read)") { feats.count() }
    val ratio = Curation.ratioFromFeatures(feats, 4096, 0.01)
    t("bucket LM ratio (warm feats)") { ratio.count() }
    val w = Curation.scoreFeatures(feats.select("doc_id", "b", "cnt"), ratio)
    t("score join+agg (warm feats)") { w.count() }
    val full = docs.select("doc_id").join(w, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("lw").cast("double"), lit(0.0)).as("lw"))
    t("doc table materialize (ckpt)") { full.localCheckpoint().count() }
    spark.catalog.clearCache()
    t("dsirWeights end-to-end cold") { Curation.dsirWeights(spark, dir).count() }
    t("dsirWeights end-to-end again") { Curation.dsirWeights(spark, dir).count() }
    spark.stop()
  }
}
