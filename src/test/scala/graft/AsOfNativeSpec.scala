package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin
import graft.plans.AsOfJoinNative

/** The custom physical as-of operator (AsOfJoinPlan → AsOfJoinStrategy →
  * AsOfJoinExec) must return exactly what the union-window composition
  * returns, on real data and on the null/tie/empty edge cases, while
  * planning as the merge exec with co-partitioned sorted children. */
class AsOfNativeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("native exec ≡ union-window composition on the registered query (sf0.001)") {
    val viaWindow = AsOfJoin.asofQuery(spark, sf).collect().map(_.toString).sorted
    val viaExec = AsOfJoin.asofQueryNative(spark, sf).collect().map(_.toString).sorted
    assert(viaExec.length == viaWindow.length)
    assert(viaExec.sameElements(viaWindow))
  }

  test("the physical plan is the custom exec over sorted, key-clustered children") {
    val (probes, states) = AsOfJoin.probesAndStates(spark, sf)
    val df = AsOfJoinNative.backward(probes, states, "o_custkey", "o_orderdate", Seq("ship_qty"))
    val p = plan(df)
    assert(p.contains("AsOfJoin"), s"custom exec missing:\n$p")
    assert(p.contains("Sort ["), s"planner did not insert the required sorts:\n$p")
    assert(!p.contains("Window"), s"composition leaked into the native path:\n$p")
  }

  private def probes = Seq(
    (1L, Option(10L), "2024-01-05"), (2L, Option(10L), "2024-01-01"),
    (3L, Option(20L), "2024-01-10"), (4L, Option(30L), "2024-01-10"),
    (5L, None: Option[Long], "2024-01-10"))
    .toDF("id", "k", "d_s").select($"id", $"k", $"d_s".cast("date").as("t"))

  private def states = Seq(
    (10L, "2024-01-01", 1.0), (10L, "2024-01-05", 2.0),  // exact-date tie for probe 1
    (10L, "2024-01-07", 3.0),                            // after probe 1: invisible
    (20L, "2024-01-02", 4.0),
    (99L, "2024-01-01", 9.0))                            // key with no probes
    .toDF("k", "d_s", "v").select($"k", $"d_s".cast("date").as("t"), $"v")

  private def run(l: DataFrame, r: DataFrame): Map[Long, Option[Double]] =
    AsOfJoinNative.backward(l, r, "k", "t", Seq("v"))
      .select($"id", $"asof_v").collect()
      .map(row => row.getLong(0) -> (if (row.isNullAt(1)) None else Some(row.getDouble(1))))
      .toMap

  test("backward semantics: latest state ≤ probe time, ties visible, no-match null") {
    val got = run(probes, states)
    assert(got == Map(
      1L -> Some(2.0),  // same-date state row visible, later row not
      2L -> Some(1.0),
      3L -> Some(4.0),
      4L -> None,       // key 30 has no states
      5L -> None))      // null key never matches
  }

  test("null state times never match; empty state side yields all-null payload") {
    val nullTimes = Seq((10L, null.asInstanceOf[String], 7.0))
      .toDF("k", "d_s", "v").select($"k", $"d_s".cast("date").as("t"), $"v")
    assert(run(probes, nullTimes).values.forall(_.isEmpty))
    assert(run(probes, states.filter($"k" === -1)).values.forall(_.isEmpty))
  }

  test("composition and native agree on the synthetic edge cases too") {
    val viaWindow = AsOfJoin.backward(probes, states, "k", "t", Seq("v"))
      .select($"id", $"asof_v").collect().map(_.toString).sorted
    val viaExec = AsOfJoinNative.backward(probes, states, "k", "t", Seq("v"))
      .select($"id", $"asof_v").collect().map(_.toString).sorted
    assert(viaExec.sameElements(viaWindow))
  }

  test("forward direction: earliest state ≥ probe time, ties visible") {
    val got = AsOfJoinNative.forward(probes, states, "k", "t", Seq("v"))
      .select($"id", $"asof_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(
      1L -> Some(2.0),  // same-date state is the earliest ≥, later 3.0 loses
      2L -> Some(1.0),  // exact tie at 2024-01-01
      3L -> None,       // key 20's only state is BEFORE the probe
      4L -> None,
      5L -> None))
  }

  test("forward direction: NULL probe time never matches") {
    // forward order sorts null times LAST within a key, so the sweep
    // consumes (and remembers) every same-key state before reaching the
    // null-time probe — the lt != null guard must still reject the match
    val nullProbe = Seq(
      (1L, Option(10L), Option("2024-01-01")),
      (2L, Option(10L), None: Option[String]))
      .toDF("id", "k", "d_s").select($"id", $"k", $"d_s".cast("date").as("t"))
    val got = AsOfJoinNative.forward(nullProbe, states, "k", "t", Seq("v"))
      .select($"id", $"asof_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(1L -> Some(1.0), 2L -> None))
  }

  test("self-join without aliasing fails fast with a clear message") {
    val df = states
    val e = intercept[IllegalArgumentException] {
      AsOfJoinNative.backward(df, df, "k", "t", Seq("v"))
    }
    assert(e.getMessage.contains("share attribute ids"))
  }

  test("forward ≡ backward on negated time (the oracle identity)") {
    import org.apache.spark.sql.functions.expr
    def neg(df: DataFrame) = df.withColumn("nt",
      expr("-unix_timestamp(CAST(t AS TIMESTAMP))"))
    val fwd = AsOfJoinNative.forward(probes, states, "k", "t", Seq("v"))
      .select($"id", $"asof_v").collect().map(_.toString).sorted
    val bwdNeg = AsOfJoinNative.backward(neg(probes), neg(states), "k", "nt", Seq("v"))
      .select($"id", $"asof_v").collect().map(_.toString).sorted
    assert(fwd.sameElements(bwdNeg))
  }

  test("multi-column payload rides as a unit") {
    val st2 = states.withColumn("src", concat(lit("s"), $"v".cast("int")))
    val got = AsOfJoinNative.backward(probes, st2, "k", "t", Seq("v", "src"))
      .filter($"id" === 1L).select($"asof_v", $"asof_src").head()
    assert(got.getDouble(0) == 2.0 && got.getString(1) == "s2")
  }
}
