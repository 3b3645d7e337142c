package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fragment decomposition of q_lm_score (r19): norm pass vs kernel pass vs
  * model fill vs scoring tail, each timed with the noop-equivalent
  * toRdd.count on a warm session — the ProfileTop pattern one level down. */
object ProfileLm {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def sec[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lm] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    import graft.Tables
    val norm = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.normText(col("text")).as("s"))
    def cnt(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    // JIT/codegen warm
    (1 to 2).foreach { _ =>
      cnt(graft.operators.LmScore.bigramScores(spark, dir))
      cnt(norm)
    }
    sec("norm only")(cnt(norm))
    val f = norm.select(col("doc_id"), col("lang"),
        explode(graft.operators.LmScore.bigramCounts(col("s"))).as("kv"))
      .select(col("doc_id"), col("lang"),
        col("kv._1").as("bg"), col("kv._2").as("c"))
    sec("norm+kernel explode (f)")(cnt(f))
    sec("cab agg uncached")(cnt(
      f.groupBy("lang", "bg").agg(sum("c").as("n_ab"))))
    sec("vocab agg uncached (split)")(cnt(
      norm.select(col("lang"), explode(array_distinct(split(col("s"), ""))).as("c"))
        .groupBy("lang").agg(countDistinct("c").as("v"))))
    sec("vocab agg uncached (kernel)")(cnt(
      norm.select(col("lang"),
          explode(graft.functions.LmExpressions.distinct_chars(col("s"))).as("c"))
        .groupBy("lang").agg(countDistinct("c").as("v"))))
    sec("full query (warm models)")(cnt(
      graft.operators.LmScore.bigramScores(spark, dir)))
    sec("full query again")(cnt(
      graft.operators.LmScore.bigramScores(spark, dir)))
    spark.stop()
  }
}
