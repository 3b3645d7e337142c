package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the cluster-wide deployment path for graft's SQL functions — a
      // static conf, so it must be present when the context starts
      // (ExtensionsSpec asserts the injected functions resolve)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class QueriesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every truth twin names a registered query") {
    // a renamed registry entry must not silently fall out of the bench's
    // truth-twin bucket (the Θ(N²) queries Bench reports separately)
    val unknown = SparkEntry.truthTwins -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"truthTwins not in registry: $unknown")
  }

  test("every oracle key exists in queries") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet -- qs
    assert(missing.isEmpty, s"oracleSql keys without a query: $missing")
  }

  test("every registered query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("business days: exactly 30, none on weekends") {
    val days = serve.LensQueries.businessDays(spark, sf).collect().map(_.getString(0))
    assert(days.length == 30)
    val dows = days.map(java.time.LocalDate.parse(_).getDayOfWeek)
    assert(!dows.contains(java.time.DayOfWeek.SATURDAY))
    assert(!dows.contains(java.time.DayOfWeek.SUNDAY))
    assert(days.toSeq == days.toSeq.sorted)
  }

  test("last_value picks exactly one row per user") {
    val df = serve.LensQueries.lastValuePerKey(spark, sf)
    val users = df.select("user_id").collect().map(_.getLong(0))
    assert(users.length == users.distinct.length)
  }

  test("tail-n caps at 5 per event_type") {
    val df = serve.LensQueries.tailNPerKey(spark, sf)
    val byType = df.groupBy("event_type").count().collect()
    assert(byType.forall(_.getLong(1) <= 5))
  }

  test("terms other bucket: top rows + remainder sum to total") {
    val df = serve.LensQueries.termsOtherBucket(spark, sf).collect()
    val total = df.map(_.getLong(1)).sum
    val all = Tables.events(spark, sf).count()
    assert(total == all)
    assert(df.count(_.getString(0) == "__other__") <= 1)
  }

  test("date spine pads empty buckets with 0 and covers full range per type") {
    val rows = serve.LensQueries.dateSpinePadded(spark, sf).collect()
    val types = rows.map(_.getString(0)).distinct
    val daysPerType = rows.groupBy(_.getString(0)).map(_._2.length).toSet
    assert(daysPerType.size == 1, "every type must cover the identical spine")
    assert(rows.forall(_.getLong(2) >= 0))
    assert(types.nonEmpty)
  }

  test("approx percentiles within 10% of exact") {
    val exact = serve.MoreQueries.percentilesQuery(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = serve.MoreQueries.percentileApproxQuery(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (p50, p90)) =>
      assert(math.abs(approx(k)._1 - p50) / p50 < 0.1, s"$k p50")
      assert(math.abs(approx(k)._2 - p90) / p90 < 0.1, s"$k p90")
    }
  }

  test("approx cardinality within 5% of exact") {
    val exact = serve.LensQueries.cardinality(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = serve.LensQueries.cardinalityApprox(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("flagship: no lost fact rows, arithmetic invariant") {
    val enriched = etl.Combine.enrichedOrders(spark, sf)
    assert(enriched.count() == Tables.orders(spark, sf).count())
    val bad = enriched.filter(
      org.apache.spark.sql.functions.col("avg_item_price") <= 0).count()
    assert(bad == 0)
  }
}
