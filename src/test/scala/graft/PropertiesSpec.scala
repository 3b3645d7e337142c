package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{Sentiment, TextFunctions}
import graft.operators.Forecast

/** Property-based invariants (SURVEY §5.3): ScalaCheck generators sampled
  * with fixed seeds (the scalatest-scalacheck bridge isn't in the offline
  * cache, so sampling is explicit — and deterministic, which the oracle
  * discipline prefers anyway). Driver-side generators feed pure kernels;
  * Spark-level properties run on small sampled frames. */
class PropertiesSpec extends AnyFunSuite {
  import SparkTestSession._

  def forAll[A](gen: Gen[A], samples: Int = 50)(f: A => Unit): Unit =
    (0 until samples).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  def forAll[A, B](genA: Gen[A], genB: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 50).foreach { i =>
      for {
        a <- genA.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- genB.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } f(a, b)
    }

  def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  // ------------------------------------------------------------ sentiment
  test("sentiment compound always in [-1, 1] and label consistent") {
    val word = Gen.oneOf(Sentiment.lexicon.keys.toSeq ++
      Sentiment.negations.toSeq ++ Sentiment.boosters.keys.toSeq ++
      Seq("table", "chair", "", "Spark!", "123"))
    val text = Gen.listOf(word).map(_.mkString(" "))
    forAll(text) { t =>
      val s = Sentiment.compound(t)
      assert(s >= -1.0 && s <= 1.0)
      val l = Sentiment.label(s)
      if (s >= 0.05) assert(l == "positive")
      else if (s <= -0.05) assert(l == "negative")
      else assert(l == "neutral")
    }
  }

  // ------------------------------------------------------------ forecast
  test("forecast emits 0 rows below 60 inputs, 90+30 at or above") {
    val base = java.time.LocalDate.of(2023, 1, 2)
    forAll(Gen.chooseNum(1, 120)) { n =>
      val pts = (0 until n).map { i =>
        Forecast.SeriesPoint("k", base.plusDays(i).toString, 100.0 + (i % 7), 0.0)
      }
      val out = Forecast.forecastGroup("k", pts.iterator).toSeq
      if (n < 60) assert(out.isEmpty)
      else {
        assert(out.count(_.`type` == "actual") == math.min(90, n))
        assert(out.count(_.`type` == "forecast") == 30)
        out.filter(_.`type` == "forecast").foreach { r =>
          assert(r.confidence_lower <= r.predicted_close + 1e-9)
          assert(r.confidence_upper >= r.predicted_close - 1e-9)
        }
      }
    }
  }

  test("forecast is deterministic") {
    val pts = (0 until 80).map { i =>
      Forecast.SeriesPoint("k", java.time.LocalDate.of(2023, 1, 2).plusDays(i).toString,
        100.0 + math.sin(i * 0.3) * 10, 0.1 * (i % 5))
    }
    val a = Forecast.forecastGroup("k", pts.iterator).toSeq
    val b = Forecast.forecastGroup("k", pts.iterator).toSeq
    assert(a == b)
  }

  // ------------------------------------------------------------ business days
  test("businessDaysAfter: n days, all weekdays, strictly increasing") {
    forAll(Gen.chooseNum(0L, 3000L), Gen.chooseNum(1, 60)) { (offset, n) =>
      val start = java.time.LocalDate.of(2020, 1, 1).plusDays(offset)
      val days = Forecast.businessDaysAfter(start, n)
      assert(days.length == n)
      assert(days.forall(d => d.getDayOfWeek.getValue <= 5))
      assert(days.head.isAfter(start))
      assert(days == days.sorted)
    }
  }

  // ------------------------------------------------------------ dedup kernel
  test("shingle fallback: every doc yields at least one shingle") {
    import spark.implicits._
    val texts = Gen.listOfN(5, Gen.oneOf("", "a", "a b", "a b c", "a b c d e f"))
    forAll(texts, samples = 8) { ts =>
      whenever(ts.nonEmpty) {
        val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val counts = df.select(size(graft.operators.Dedup.shingleArr(col("text"), 3)).as("n"))
          .collect().map(_.getInt(0))
        assert(counts.forall(_ >= 1))
      }
    }
  }

  // ------------------------------------------------------------ simhash
  test("simhash aggregator: merge associativity and buffer isolation") {
    val agg = graft.operators.Dedup.SimHashAgg
    forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (xs, ys) =>
      val left = xs.foldLeft(agg.zero)(agg.reduce)
      val right = ys.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.finish(agg.merge(left, right))
      val sequential = agg.finish((xs ++ ys).foldLeft(agg.zero)(agg.reduce))
      assert(merged == sequential)
    }
  }

  // ------------------------------------------------------------ quality
  test("token count ≥ 0 and 0 iff blank") {
    import spark.implicits._
    val gen = Gen.listOfN(8, Gen.oneOf("", " ", "\t\n", "x", "x y", " x  y\tz "))
    forAll(gen, samples = 8) { ts =>
      whenever(ts.nonEmpty) {
        val got = ts.toDF("t")
          .select(TextFunctions.tokenCount(col("t")).as("n"), col("t"))
          .collect()
        got.foreach { r =>
          val n = r.getInt(0)
          val blank = r.getString(1).trim.isEmpty
          assert(n >= 0)
          assert((n == 0) == blank)
        }
      }
    }
  }
}
