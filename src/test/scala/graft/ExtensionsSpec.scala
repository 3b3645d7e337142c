package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def assertFunctionsWork(s: SparkSession): Unit = {
    val row = s.sql(
      """SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cs,
        |       squared_dist(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS sd,
        |       interleave_bits(3, 5) AS z""".stripMargin).first()
    assert(row.getDouble(0) === 1.0)
    assert(row.getDouble(1) === 25.0)
    // 3 = 0b011 (even bits), 5 = 0b101 (odd bits): z = 0b100111 = 39
    assert(row.getLong(2) === 39L)
    val hll = s.sql(
      "SELECT hll_distinct(x) AS d FROM (SELECT explode(sequence(1, 500)) AS x)")
      .first().getLong(0)
    assert(math.abs(hll - 500L) <= 25L) // p=12 ⇒ 3σ ≈ 5%
  }

  test("spark.sql.extensions=graft.GraftExtensions injects SQL functions (static-conf path)") {
    // SparkTestSession sets the static conf before the context starts —
    // the exact path a cluster-wide spark.sql.extensions deployment takes
    assert(spark.conf.get("spark.sql.extensions") === "graft.GraftExtensions")
    assertFunctionsWork(spark)
  }

  test("builder.withExtensions injects into a NEW session over the same context") {
    spark // force the shared context to exist
    val oldDefault = SparkSession.getDefaultSession
    val oldActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions().apply(_))
        .getOrCreate()
      assertFunctionsWork(s)
    } finally {
      oldDefault.foreach(SparkSession.setDefaultSession)
      oldActive.foreach(SparkSession.setActiveSession)
    }
  }
}
