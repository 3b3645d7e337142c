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
    val row2 = s.sql(
      """SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS dp,
        |       dot_product_int(array(2, -3), array(5, 7)) AS dpi,
        |       logistic_grad(array(1.0d, 1.0d), array(0.0d, 0.0d), 1.0d) AS lg
        |""".stripMargin).first()
    assert(row2.getDouble(0) === 32.0)
    assert(row2.getLong(1) === -11L)
    // zero weights: p = 0.5, gradient = x·(p−y) = [-0.5, -0.5],
    // loss = ln 2, hit = 1 (p >= 0.5 and y = 1 agree)
    val lg = row2.getSeq[Double](2)
    assert(lg.take(2) == Seq(-0.5, -0.5) && lg(3) === 1.0)
    assert(math.abs(lg(2) - math.log(2.0)) < 1e-12)
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
