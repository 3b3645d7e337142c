package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HllAggregate.hll_distinct
import graft.serve.LensQueries

class HllSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("hll estimate within published error bound on 100k distinct longs") {
    // p=12 → σ ≈ 1.04/√4096 ≈ 1.6%; assert 3σ. repartition forces the
    // partial/merge aggregation path (register-max merges across partitions).
    val n = 100000L
    val est = (1L to n).toDF("v").repartition(8)
      .agg(hll_distinct(col("v"))).collect()(0).getLong(0)
    val err = math.abs(est - n).toDouble / n
    assert(err < 0.05, s"est $est vs $n: err $err")
  }

  test("hll small-range linear counting is near-exact") {
    val est = (1L to 50L).toDF("v").agg(hll_distinct(col("v")))
      .collect()(0).getLong(0)
    assert(math.abs(est - 50L) <= 1, s"got $est")
  }

  test("duplicates do not move the estimate") {
    val distinct = (1L to 1000L).toDF("v")
    val dup = distinct.union(distinct).union(distinct).repartition(4)
    val a = distinct.agg(hll_distinct(col("v"))).collect()(0).getLong(0)
    val b = dup.agg(hll_distinct(col("v"))).collect()(0).getLong(0)
    assert(a == b, s"$a vs $b")
  }

  test("nulls are ignored") {
    val est = Seq[Option[Long]](Some(1L), None, Some(2L), None)
      .toDF("v").agg(hll_distinct(col("v"))).collect()(0).getLong(0)
    assert(est == 2L)
  }

  test("SQL-registered hll_distinct matches the DataFrame API") {
    graft.functions.HllAggregate.register(spark)
    (1L to 5000L).toDF("v").createOrReplaceTempView("hll_probe")
    val viaSql = spark.sql("SELECT hll_distinct(v) AS c FROM hll_probe")
      .collect()(0).getLong(0)
    val viaDf = (1L to 5000L).toDF("v").agg(hll_distinct(col("v")))
      .collect()(0).getLong(0)
    assert(viaSql == viaDf)
    // explicit precision is honored, not silently dropped
    val sqlP8 = spark.sql("SELECT hll_distinct(v, 8) AS c FROM hll_probe")
      .collect()(0).getLong(0)
    val dfP8 = (1L to 5000L).toDF("v").agg(hll_distinct(col("v"), 8))
      .collect()(0).getLong(0)
    assert(sqlP8 == dfP8)
    // wrong arity fails with a readable message
    val e = intercept[Exception](
      spark.sql("SELECT hll_distinct() FROM hll_probe").collect())
    assert(e.getMessage.contains("hll_distinct"))
  }

  test("q_cardinality_hll tracks exact per-group counts on events") {
    val exact = LensQueries.cardinality(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = LensQueries.cardinalityHll(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(est(k) - n).toDouble / math.max(1L, n)
      assert(err < 0.05, s"group $k: est ${est(k)} vs exact $n")
    }
  }
}
