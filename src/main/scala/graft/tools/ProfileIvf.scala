package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[ivf] $tag%-30s ${(System.nanoTime()-t0)/1e9}%7.3f s")
    }
    t("warm embed memo")(graft.operators.TextEmbed.embeddings(spark, dir).queryExecution.toRdd.count())
    val vecs = graft.operators.TextEmbed.embeddings(spark, dir)
      .join(graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang").as("label")), "doc_id")
      .select(col("doc_id").as("vec_id"), col("label"), col("emb"))
    t("vecs count")(vecs.queryExecution.toRdd.count())
    t("vecs count again")(vecs.queryExecution.toRdd.count())
    t("full ivf 1")(graft.operators.TextEmbed.textIvfTopK(spark, dir).queryExecution.toRdd.count())
    t("full ivf 2")(graft.operators.TextEmbed.textIvfTopK(spark, dir).queryExecution.toRdd.count())
    t("full pq 1")(graft.operators.TextEmbed.textPqTopK(spark, dir).queryExecution.toRdd.count())
    t("full pq 2")(graft.operators.TextEmbed.textPqTopK(spark, dir).queryExecution.toRdd.count())
    spark.stop()
  }
}
