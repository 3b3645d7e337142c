package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.BinnedRangeJoinRule

/** BinnedRangeJoinRule: the declarative range join must produce exactly the
  * rows the nested-loop plan produces, while compiling to an equi-join.
  * The shared test session loads GraftExtensions statically, so the rule is
  * in the optimizer for every test here; the enabled conf gates it. */
class RangeJoinRuleSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def withRule[T](on: Boolean)(body: => T): T = {
    val prev = spark.conf.getOption(BinnedRangeJoinRule.EnabledConf)
    spark.conf.set(BinnedRangeJoinRule.EnabledConf, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(BinnedRangeJoinRule.EnabledConf, v)
      case None => spark.conf.unset(BinnedRangeJoinRule.EnabledConf)
    }
  }

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def points = Seq(
    (1L, "2024-01-01 00:30:00"), (2L, "2024-01-01 05:00:00"),
    (3L, "2024-01-02 12:00:00"), (4L, "2024-01-05 00:00:00"),
    (5L, null.asInstanceOf[String]))
    .toDF("pid", "ts_s").select($"pid", $"ts_s".cast("timestamp").as("t"))

  private def ranges = Seq(
    (10L, "2024-01-01 00:00:00", "2024-01-01 06:00:00"),  // covers 1, 2
    (11L, "2024-01-02 00:00:00", "2024-01-03 00:00:00"),  // covers 3
    (12L, "2024-01-04 00:00:00", "2024-01-06 00:00:00"),  // covers 4
    (13L, "2024-01-09 00:00:00", "2024-01-08 00:00:00"),  // inverted: none
    (14L, null.asInstanceOf[String], "2024-01-10 00:00:00")) // null lo: none
    .toDF("rid", "lo_s", "hi_s")
    .select($"rid", $"lo_s".cast("timestamp").as("lo"), $"hi_s".cast("timestamp").as("hi"))

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.select("pid", "rid").as[(Long, Long)].collect().toSet

  // a Dataset's executedPlan is a lazy val — build the join INSIDE each
  // withRule scope so each side is optimized under its own conf
  private def q(): DataFrame = points.join(ranges, $"t" >= $"lo" && $"t" <= $"hi")

  test("rewritten range join ≡ nested-loop join, including null/inverted intervals") {
    val got = withRule(on = true)(rows(q()))
    val want = withRule(on = false)(rows(q()))
    assert(got == want)
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 11L), (4L, 12L)))
  }

  test("rule replaces the nested-loop plan with an equi-join on the bin") {
    withRule(on = true) {
      val p = plan(q())
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"nested loop survived the rewrite:\n$p")
      assert(p.contains("__graft_bin"), s"bin key missing from plan:\n$p")
    }
    withRule(on = false) {
      val p = plan(q())
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"),
        s"expected the naive plan with the rule disabled:\n$p")
    }
  }

  test("strict bounds and flipped operand order still rewrite and agree") {
    // lo < t AND hi > t — bounds written "backwards", both strict
    def qs(): DataFrame = points.join(ranges, $"lo" < $"t" && $"hi" > $"t")
    val got = withRule(on = true) { val d = qs(); (rows(d), plan(d)) }
    val want = withRule(on = false)(rows(qs()))
    assert(got._1 == want)
    assert(!got._2.contains("BroadcastNestedLoopJoin"), s"strict-bound form not rewritten:\n${got._2}")
  }

  test("point side on the right rewrites too") {
    val q = ranges.join(points, $"t" >= $"lo" && $"t" <= $"hi")
    withRule(on = true) {
      assert(!plan(q).contains("BroadcastNestedLoopJoin"))
      assert(rows(q) == Set((1L, 10L), (2L, 10L), (3L, 11L), (4L, 12L)))
    }
  }

  test("numeric (non-timestamp) range joins rewrite with value-unit bins") {
    val pts = Seq((1L, 5.0), (2L, 42.0), (3L, 9999.5)).toDF("pid", "x")
    val rng = Seq((10L, 0.0, 10.0), (11L, 40.0, 50.0), (12L, 9000.0, 10000.0))
      .toDF("rid", "xlo", "xhi")
    val q = pts.join(rng, $"x" >= $"xlo" && $"x" <= $"xhi")
    withRule(on = true) {
      assert(!plan(q).contains("BroadcastNestedLoopJoin"))
      assert(rows(q) == Set((1L, 10L), (2L, 11L), (3L, 12L)))
    }
  }

  test("joins that already have an equi-key are left alone") {
    val pts = Seq((1L, 1L, 5.0)).toDF("pid", "k", "x")
    val rng = Seq((10L, 1L, 0.0, 10.0)).toDF("rid", "k", "xlo", "xhi")
    val q = pts.join(rng, pts("k") === rng("k") && $"x" >= $"xlo" && $"x" <= $"xhi")
    withRule(on = true) {
      assert(!plan(q).contains("__graft_bin"), "rule fired on an equi-join")
      assert(rows(q) == Set((1L, 10L)))
    }
  }

  test("binSize <= 0 / NaN falls back to the default instead of NULL bins") {
    def withBin[T](v: String)(body: => T): T = {
      spark.conf.set(BinnedRangeJoinRule.BinSizeConf, v)
      try body finally spark.conf.unset(BinnedRangeJoinRule.BinSizeConf)
    }
    val want = withRule(on = false)(rows(q()))
    for (bad <- Seq("0", "-5", "NaN")) {
      val got = withRule(on = true)(withBin(bad) {
        val d = q()
        assert(!plan(d).contains("BroadcastNestedLoopJoin"),
          s"binSize=$bad disabled the rewrite instead of falling back")
        rows(d)
      })
      assert(got == want, s"binSize=$bad changed results")
    }
  }

  test("registered query q_range_join_auto matches its oracle shape on sf0.001") {
    val df = operators.RangeJoin.eventsInDayWindows(spark, sf)
    assert(!plan(df).contains("BroadcastNestedLoopJoin"))
    val n = df.agg(sum("n_events")).as[Long].head()
    val events = Tables.events(spark, sf)
      .filter($"ts" >= lit("2024-01-01").cast("timestamp")).count()
    // 48h windows sliding daily: every event except those in the first day
    // of the span lands in exactly 2 windows
    assert(n >= events, s"fan-out lost events: $n < $events")
  }
}
