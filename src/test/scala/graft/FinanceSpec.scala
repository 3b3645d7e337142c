package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.serve.FinanceQueries

/** Invariants of the market-analytics battery (the DuckDB hash oracle is
  * the value arbiter; these pin the mathematical contracts the oracle
  * can't name). */
class FinanceSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ohlc: low <= open,close <= high; no window sort in the plan") {
    val df = FinanceQueries.ohlcBars(spark, sf)
    val rows = df.collect()
    assert(rows.length == 150) // 5 instruments x 30 days
    rows.foreach { r =>
      val (o, h, l, c) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(l <= o && o <= h, s"open outside [low, high]: $r")
      assert(l <= c && c <= h, s"close outside [low, high]: $r")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"),
      s"min_by/max_by bars must not plan a window sort:\n$plan")
  }

  test("volatility: positive, full windows only (20 rows per instrument)") {
    val rows = FinanceQueries.volatility(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(2) > 0.0))
    val perType = rows.groupBy(_.getString(0)).view.mapValues(_.length)
    // 30 days, first return null, 10-ret windows complete from day 11
    assert(perType.values.forall(_ == 20), perType.toMap.toString)
  }

  test("beta: equal-weight identity — betas average to 1") {
    val rows = FinanceQueries.betaMarket(spark, sf).collect()
    assert(rows.length == 5)
    // every instrument trades every day, so the equal-weight market return
    // is the cross-sectional mean and Σβ/n = cov(mean, mkt)/var(mkt) = 1
    val meanBeta = rows.map(_.getDouble(1)).sum / rows.length
    assert(math.abs(meanBeta - 1.0) < 1e-5, s"mean beta $meanBeta")
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
  }

  test("drawdown: in [-100, 0), peak equals the series max") {
    val rows = FinanceQueries.maxDrawdown(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val dd = r.getDouble(1)
      assert(dd < 0.0 && dd >= -100.0, s"${r.getString(0)}: $dd")
    }
  }

  test("bollinger: label agrees with the side of the band") {
    val rows = FinanceQueries.bollingerBreach(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (close, sma, band) = (r.getDouble(2), r.getDouble(3), r.getString(4))
      if (band == "above") assert(close > sma) else assert(close < sma)
    }
  }

  test("sma crossover: signals alternate per instrument, in day order") {
    val rows = FinanceQueries.smaCrossover(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val sigs = rs.sortBy(_._2).map(_._3)
      sigs.sliding(2).foreach {
        case Array(a, b) => assert(a != b, s"$t: consecutive $a,$b")
        case _           =>
      }
    }
  }

  test("funnel: stage counts are monotone non-increasing") {
    val rows = graft.serve.CohortQueries.eventFunnel(spark, sf)
      .collect().sortBy(_.getInt(0))
    assert(rows.map(_.getString(1)).toSeq == Seq("view", "click", "purchase"))
    val ns = rows.map(_.getLong(2))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), ns.toSeq.toString)
    assert(rows(0).isNullAt(3))
    rows.tail.foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("cohort retention: offset-0 rate is 1.0, rates bounded") {
    val rows = graft.serve.CohortQueries.cohortRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, rate) = (r.getInt(1), r.getDouble(3))
      assert(rate > 0.0 && rate <= 1.0, r.toString)
      if (off == 0) assert(rate == 1.0, r.toString)
      assert(off >= 0, r.toString)
    }
  }

  test("corr matrix: strict upper triangle, bounded, symmetric coverage") {
    val rows = FinanceQueries.corrMatrix(spark, sf).collect()
    assert(rows.length == 10) // C(5,2)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
  }

  test("value histogram: buckets within [0,7], counts sum to non-null values") {
    val rows = FinanceQueries.valueHistogram(spark, sf).collect()
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 7))
    val total = rows.map(_.getLong(2)).sum
    val expect = Tables.events(spark, sf).filter("value is not null").count()
    assert(total == expect)
  }

  test("mad anomalies: every flagged day exceeds 2.5 MAD-z") {
    val rows = FinanceQueries.madAnomalies(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) > 2.5, r.toString))
  }

  test("dow seasonality: deviations sum to ~0 weighted by day counts") {
    val rows = FinanceQueries.dowSeasonality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(rs.map(_.getInt(1)).forall(wd => wd >= 0 && wd <= 6))
      // Σ n_d·(avg_d − mean) = 0 exactly before rounding
      val s = rs.map(r => r.getLong(2) * r.getDouble(4)).sum
      assert(math.abs(s) < 1e-3, s"$t weighted deviation $s")
    }
  }

  test("transition matrix: rows normalize to 1") {
    val rows = graft.operators.Sessionize.transitionMatrix(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (in, rs) =>
      val tot = rs.map(_.getDouble(3)).sum
      assert(math.abs(tot - 1.0) < 1e-4, s"$in sums to $tot")
    }
  }

  test("underwater: max streak <= total underwater days <= 29") {
    val rows = FinanceQueries.underwaterStreaks(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (mx, tot, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(mx >= 1 && mx <= tot && tot <= 29, r.toString)
      assert(n >= 1 && mx * n >= tot, r.toString) // max*spells bounds total
    }
  }

  test("hhi: within [1/n_types, 1]") {
    val rows = FinanceQueries.turnoverHhi(spark, sf).collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val (hhi, n) = (r.getDouble(1), r.getLong(2))
      assert(hhi >= 1.0 / n - 1e-6 && hhi <= 1.0 + 1e-9, r.toString)
    }
  }

  test("var/es: expected shortfall at or below VaR, non-empty tail") {
    val rows = FinanceQueries.valueAtRisk(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (v, es, n) = (r.getDouble(1), r.getDouble(2), r.getLong(3))
      assert(es <= v + 1e-9, s"ES must be at or below VaR: $r")
      assert(n >= 1, r.toString)
    }
  }

  test("lexical diversity: ttr in (0,1], guiraud positive") {
    val rows = graft.functions.TextFunctions.lexicalDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // types <= tokens
      val ttr = r.getDouble(3)
      assert(ttr > 0.0 && ttr <= 1.0, r.toString)
      assert(r.getDouble(4) > 0.0)
    }
  }

  test("autocorr: |acf1| <= 1, 28 aligned pairs per instrument") {
    val rows = FinanceQueries.autocorr(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9)
      assert(r.getLong(2) == 28) // 30 days -> 29 rets -> 28 lag pairs
    }
  }

  test("moments: kurtosis respects the skewness lower bound") {
    val rows = FinanceQueries.momentsBattery(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (sd, g1, g2) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(sd > 0.0)
      // g2 >= g1^2 - 2 holds for any distribution (Pearson inequality)
      assert(g2 >= g1 * g1 - 2.0 - 1e-6, r.toString)
    }
  }

  test("json extract: every event carries an int k") {
    val rows = graft.serve.CohortQueries.jsonExtract(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getLong(1) > 0 && r.getInt(3) >= 0))
  }

  test("rank battery: rank >= dense_rank, percent/cume in [0,1], ntile in 1..4") {
    val rows = graft.serve.CohortQueries.rankBattery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) >= r.getInt(3)) // rank >= dense_rank
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
      assert(r.getInt(6) >= 1 && r.getInt(6) <= 4)
    }
  }

  test("rank battery: heap + group-count form ≡ the six-window form, row for row") {
    // the r19 rewrite's pin: rank/dense_rank/percent_rank/cume_dist/
    // ntile/row_number re-derived from the bounded heap and the
    // floor-group counts must match the literal window spelling exactly —
    // including ntile's uneven first-bucket split and the N=1
    // percent_rank edge (exercised by whichever types the fixture holds)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val coarse = Window.partitionBy("event_type").orderBy(floor(col("value")))
    val total = Window.partitionBy("event_type")
      .orderBy(col("value"), col("event_id"))
    val windowed = graft.Tables.events(spark, sf)
      .withColumn("rnk", rank().over(coarse))
      .withColumn("drnk", dense_rank().over(coarse))
      .withColumn("prnk", round(percent_rank().over(coarse), 6))
      .withColumn("cume", round(cume_dist().over(coarse), 6))
      .withColumn("quartile", ntile(4).over(total))
      .withColumn("rn", row_number().over(total))
      .filter(col("rn") <= 8)
      .select(col("event_type"), col("event_id"), col("rnk"), col("drnk"),
        col("prnk"), col("cume"), col("quartile"), col("rn"))
      .collect().map(r => r.toSeq).toSet
    val got = graft.serve.CohortQueries.rankBattery(spark, sf)
      .collect().map(r => r.toSeq).toSet
    assert(got == windowed, {
      val miss = windowed -- got; val extra = got -- windowed
      s"rank battery drifted from the window form: missing=${miss.take(3)} " +
        s"extra=${extra.take(3)}"
    })
  }

  test("grouping sets: grand total row equals the sum of per-type rows") {
    val rows = graft.serve.CohortQueries.groupingSets(spark, sf).collect()
    val grand = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(grand.length == 1)
    val perType = rows.filter(r => r.getInt(2) == 0 && r.getInt(3) == 1)
    assert(perType.map(_.getLong(4)).sum == grand.head.getLong(4))
  }

  test("unpivot: 4 long rows per bar, values match the wide frame") {
    val bars = FinanceQueries.ohlcBars(spark, sf).collect()
    val long = FinanceQueries.ohlcUnpivot(spark, sf).collect()
    assert(long.length == bars.length * 4)
    val wide = bars.map(r => (r.getString(0), r.getString(1)) ->
      Map("open" -> r.getDouble(2), "high" -> r.getDouble(3),
        "low" -> r.getDouble(4), "close" -> r.getDouble(5))).toMap
    long.foreach { r =>
      val exp = wide((r.getString(0), r.getString(1)))(r.getString(2))
      assert(r.getDouble(3) == exp, r.toString)
    }
  }

  test("daily report: composed columns agree with the standalone batteries") {
    val rep = FinanceQueries.dailyReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rep.nonEmpty)
    val rsi = FinanceQueries.rsi(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val vol = FinanceQueries.volatility(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    rep.foreach { case (k, r) =>
      assert(math.abs(r.getDouble(6) - rsi(k)) < 1e-9, s"rsi drift at $k")
      assert(math.abs(r.getDouble(5) - vol(k)) < 1e-9, s"vol drift at $k")
    }
    val anomalies = FinanceQueries.madAnomalies(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    rep.foreach { case (k, r) =>
      if (anomalies.contains(k)) assert(r.getString(8) == "anomaly", k.toString)
    }
  }

  test("ship priority: descending revenue, 10 rows, plan broadcasts the segment dim") {
    val df = graft.serve.MoreQueries.shipPriority(spark, sf)
    val rows = df.collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getDouble(1)).toSeq
    assert(revs == revs.sorted.reverse)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"segment dim must broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 must plan as TakeOrdered, not a global sort:\n$plan")
  }

  test("rsi: bounded in [0, 100], full windows only") {
    val rows = FinanceQueries.rsi(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val v = r.getDouble(2); v >= 0.0 && v <= 100.0
    })
  }
}
