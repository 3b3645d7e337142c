package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profile

/** Invariants of the one-pass column profiler and the plan shape its
  * Scaladoc promises (single wide aggregate; the exact-distinct Expand is
  * the one documented cost). */
class ProfileSpec extends AnyFunSuite {
  import SparkTestSession._

  test("profiler invariants: counts, ranges, and exact distincts") {
    val p = Profile.profileLineitem(spark, sf).collect()
    assert(p.length == 6)
    val li = Tables.lineitem(spark, sf)
    val total = li.count()
    p.foreach { r =>
      assert(r.getAs[Long]("n_rows") == total)
      assert(r.getAs[Long]("n_nonnull") <= total)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_nonnull"))
    }
    // spot-check one numeric and one string column against direct queries
    val q = p.find(_.getAs[String]("column_name") == "l_quantity").get
    assert(q.getAs[Long]("n_distinct") ==
      li.select("l_quantity").distinct().count())
    assert(q.getAs[Double]("min_num") <= q.getAs[Double]("max_num"))
    val rf = p.find(_.getAs[String]("column_name") == "l_returnflag").get
    assert(rf.getAs[Long]("n_distinct") ==
      li.select("l_returnflag").distinct().count())
    assert(rf.isNullAt(rf.fieldIndex("min_num")) && rf.getAs[String]("min_str") != null)
  }

  test("profiler plan: one scan, map-side partial aggregation") {
    val qe = Profile.profileLineitem(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    // all aggregates ride a single lineitem scan
    val scans = qe.executedPlan.collectLeaves()
      .count(_.toString.contains("lineitem"))
    assert(scans == 1, s"expected one lineitem scan, got $scans:\n$plan")
    // partial aggregation before the single-group merge (map-side combine)
    assert(plan.contains("partial_count"),
      s"counts must combine map-side before the merge:\n$plan")
    // exact distincts cost one Expand — the documented trade; anything
    // beyond it (a second scan, a join) would be a plan regression
    assert("Expand".r.findAllIn(plan).length <= 1)
  }
}
