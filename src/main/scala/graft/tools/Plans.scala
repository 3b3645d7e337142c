package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for selected queries — the plan-review loop
  * (is the filter pushed? is the dim broadcast? how wide are the codegen
  * stages?). Usage: runMain graft.tools.Plans [sfDir] [query...] */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_flagship_enriched", "q_filter_range_project", "q_topk_by_metric",
        "q_last_value_per_key", "q_date_spine_padded")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
