package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Analyzer, TextFunctions}

/** The ES-style analyzer chain: Porter stemmer pinned against the published
  * example vocabulary, stop-word filtering, and the corpus precondition the
  * q_search_analyzed oracle depends on. */
class AnalyzerSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("porter stemmer reproduces the published example pairs") {
    Analyzer.PorterExamples.foreach { case (w, want) =>
      assert(Analyzer.porterStem(w) == want, s"porterStem($w)")
    }
  }

  test("stemmer conflates an inflection family to one stem") {
    val family = Seq("merge", "merges", "merged", "merging")
    assert(family.map(Analyzer.porterStem).distinct == Seq("merg"))
    val windows = Seq("window", "windows", "windowed", "windowing")
    assert(windows.map(Analyzer.porterStem).distinct == Seq("window"))
  }

  test("analyzed tokens: stop words removed, stems applied only when asked") {
    val df = Seq("The windows WERE merged into the frame").toDF("text")
    val analyzed = df.select(Analyzer.analyzedTokens(col("text")).as("t"))
      .head().getSeq[String](0)
    assert(analyzed == Seq("window", "were", "merg", "frame"))
    val unstemmed = df.select(Analyzer.analyzedTokens(col("text"), stem = false).as("t"))
      .head().getSeq[String](0)
    assert(unstemmed == Seq("windows", "were", "merged", "frame"))
  }

  test("oracle precondition: exactly one corpus vocabulary token stems to the query stem") {
    // q_search_analyzed's oracle rewrites the analyzed match as token
    // equality — valid only while no OTHER vocabulary token conflates into
    // the query term's stem (and the term itself is present un-inflected)
    val vocab = Tables.documents(spark, sf)
      .select(explode(TextFunctions.tokens(col("text"))).as("t"))
      .distinct().as[String].collect()
    val stem = Analyzer.porterStem("merge")
    val family = vocab.filter(t => !Analyzer.StopWords(t) && Analyzer.porterStem(t) == stem)
    assert(family.toSeq == Seq("merge"), s"vocabulary family drifted: ${family.toSeq}")
  }

  test("analyzed search matches inflected forms the keyword search misses") {
    val docs = Seq(
      (1L, "results were merged yesterday"),
      (2L, "the merge completed"),
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    val stem = Analyzer.porterStem("merge")
    val hits = docs
      .filter(array_contains(Analyzer.analyzedTokens(col("text")), stem))
      .select("doc_id").as[Long].collect().sorted
    assert(hits.toSeq == Seq(1L, 2L), "analyzed search must hit the inflected doc too")
  }
}
