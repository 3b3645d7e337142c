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

  test("profiler plan: hash-aggregated Expand pass + pruned string pass") {
    // the IMPL plan at an SF the suite never memoizes: the registered
    // query reads the cached memo (r16), and CacheManager substitutes any
    // plan-identical frame with the InMemoryRelation, whose printed AQE
    // wrapper repeats the scan in Initial/Final variants — a different
    // dir yields the same plan SHAPE with no cache hit
    val qe = Profile.profileLineitemImpl(spark, "/root/testdata/sf0.01").queryExecution
    val plan = qe.executedPlan.toString
    // two scans by design: the wide fixed-width-buffer pass and the
    // Expand-free string min/max pass (string buffers would demote the
    // whole mixed-distinct aggregate to SortAggregate over the Expand)
    val scans = plan.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("lineitem"))
    assert(scans == 2, s"expected two lineitem scans, got $scans:\n$plan")
    // partial aggregation before the single-group merge (map-side combine)
    assert(plan.contains("partial_count"),
      s"counts must combine map-side before the merge:\n$plan")
    // exact distincts cost one Expand — the documented trade; anything
    // beyond it (a third scan, a join) would be a plan regression
    assert("Expand".r.findAllIn(plan).length <= 1)
    // THE r13 pin: the Expand output must be hash-aggregated, never sorted
    // — SortAggregate over the (k+1)-way Expand was the measured 11 s
    // regression the string/numeric split exists to prevent
    assert(plan.contains("HashAggregate"),
      s"the wide pass must stay a HashAggregate:\n$plan")
    assert(!plan.contains("Expand") || {
      // no Sort may feed the Expand's aggregate chain
      val expandIdx = plan.indexOf("Expand")
      !plan.substring(0, expandIdx).contains("SortAggregate(key=[l_")
    }, s"Expand output must not be sort-aggregated:\n$plan")
  }

  test("approx profiler: Expand-free ONE-scan plan, HLL within 3-sigma of exact") {
    val qe = Profile.profileLineitemApprox(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"approx_count_distinct must collapse the Expand:\n$plan")
    // r19: ONE aggregation pass over ONE scan — the string min/max ride
    // the same (keyless, therefore sort-free) aggregate the sketches use;
    // the old split paid a second sequential full scan through a 1x1
    // cross join. A keyless SortAggregate is a fold, not a sort — the
    // exact profiler's demotion hazard needs the Expand this plan lacks.
    assert("FileScan|Scan parquet".r.findAllIn(plan).length == 1,
      s"the approx profile must be ONE pass over ONE scan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the two-pass cross join must be gone:\n$plan")
    val exact = Profile.profileLineitem(spark, sf).collect()
      .map(r => r.getAs[String]("column_name") -> r.getAs[Long]("n_distinct")).toMap
    val approx = Profile.profileLineitemApprox(spark, sf).collect()
    assert(approx.length == 6)
    approx.foreach { r =>
      val c = r.getAs[String]("column_name")
      val nd = r.getAs[Long]("n_distinct").toDouble
      val ex = exact(c).toDouble
      // default rsd 0.05 ⇒ 3σ = 15%
      assert(math.abs(nd - ex) <= math.max(3.0, 0.15 * ex),
        s"$c: approx $nd vs exact $ex outside 3-sigma")
      // every non-sketch column is IDENTICAL to the exact profiler
      assert(r.getAs[Long]("n_rows") > 0)
    }
  }
}
