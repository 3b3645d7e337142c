package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOfJoin, Sessionize}
import graft.functions.VectorExpressions.cosine_sim

class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("backward as-of picks latest state at or before probe time") {
    val probes = Seq(
      ("k1", "2024-01-05", "p1"), // after s2 → 20
      ("k1", "2024-01-03", "p2"), // exactly at s2 → 20 (inclusive)
      ("k1", "2024-01-02", "p3"), // between s1 and s2 → 10
      ("k1", "2024-01-01", "p4"), // exactly at s1 → 10
      ("k2", "2024-01-04", "p5"), // k2 has one state at 01-02 → 99
      ("k3", "2024-01-04", "p6")  // no state for k3 → null
    ).toDF("key", "t", "probe_id")
      .withColumn("t", col("t").cast("date"))
    val states = Seq(
      ("k1", "2024-01-01", 10.0),
      ("k1", "2024-01-03", 20.0),
      ("k2", "2024-01-02", 99.0)
    ).toDF("key", "t", "v")
      .withColumn("t", col("t").cast("date"))
    val got = AsOfJoin.backward(probes, states, "key", "t", Seq("v"))
      .collect().map(r => r.getAs[String]("probe_id") -> Option(r.getAs[java.lang.Double]("asof_v"))).toMap
    assert(got("p1").contains(20.0))
    assert(got("p2").contains(20.0))
    assert(got("p3").contains(10.0))
    assert(got("p4").contains(10.0))
    assert(got("p5").contains(99.0))
    assert(got("p6").isEmpty)
  }

  test("backward as-of: multi-column payload stays row-consistent, inner nulls survive") {
    val probes = Seq(("k1", "2024-01-10", "p1")).toDF("key", "t", "probe_id")
      .withColumn("t", col("t").cast("date"))
    val states = Seq(
      ("k1", "2024-01-01", Option(10.0), Option("a")),
      // latest state row: v is genuinely NULL — must NOT be replaced by the
      // older row's 10.0, and u must come from THIS row
      ("k1", "2024-01-05", Option.empty[Double], Option("b"))
    ).toDF("key", "t", "v", "u")
      .withColumn("t", col("t").cast("date"))
    val r = AsOfJoin.backward(probes, states, "key", "t", Seq("v", "u")).collect()(0)
    assert(r.getAs[Any]("asof_v") == null, "null in latest state must survive")
    assert(r.getAs[String]("asof_u") == "b")
  }

  test("asof query: every order row present exactly once") {
    val q = AsOfJoin.asofQuery(spark, sf)
    assert(q.count() == Tables.orders(spark, sf).count())
    assert(q.select("o_orderkey").distinct().count() == q.count())
  }
}

/** Minimal in-memory GroupState for driving sessionFn directly. */
class TestGroupState[S](var opt: Option[S])
    extends org.apache.spark.sql.streaming.GroupState[S] {
  override def exists: Boolean = opt.isDefined
  override def get: S = opt.get
  override def getOption: Option[S] = opt
  override def update(s: S): Unit = { opt = Some(s) }
  override def remove(): Unit = { opt = None }
  var watermarkMs: Long = 0L
  var lastTimeout: Option[Long] = None
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(durationMs: Long): Unit = {}
  override def setTimeoutDuration(duration: String): Unit = {}
  override def setTimeoutTimestamp(timestampMs: Long): Unit = {
    // mirror Spark's contract: an event-time timeout at or before the
    // current watermark is illegal and kills the streaming query
    require(timestampMs > watermarkMs,
      s"timeout $timestampMs must be > watermark $watermarkMs")
    lastTimeout = Some(timestampMs)
  }
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = {}
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = {}
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = {}
  override def getCurrentWatermarkMs(): Long = watermarkMs
  override def getCurrentProcessingTimeMs(): Long = 0L
}

class SessionizeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("batch sessions: gap splits, totals conserved") {
    val s = Sessionize.sessions(spark, sf)
    val totalEvents = s.agg(sum("n_events")).collect()(0).getLong(0)
    assert(totalEvents == Tables.events(spark, sf).count())
    // session bounds ordered
    s.collect().foreach { r =>
      assert(r.getAs[String]("session_start") <= r.getAs[String]("session_end"))
    }
  }

  test("training pairs: count and chain structure follow from sessions") {
    val pairs = Sessionize.trainingPairs(spark, sf).cache()
    val sess = Sessionize.sessions(spark, sf)
    // each session of n events yields exactly n-1 (input, target) pairs
    val expected = sess.agg(sum(col("n_events") - 1)).collect()(0).getLong(0)
    assert(pairs.count() == expected)
    // chain consistency: step k's target is step k+1's input
    val broken = pairs.as("a").join(pairs.as("b"),
        col("a.user_id") === col("b.user_id") &&
        col("a.session_idx") === col("b.session_idx") &&
        col("a.step") + 1 === col("b.step"))
      .filter(col("a.target_event") =!= col("b.input_event")).count()
    assert(broken == 0, "adjacent pairs must chain input/target")
    pairs.unpersist()
  }

  test("streaming sessionization matches batch on a replayed slice") {
    // batch expectation on a small deterministic frame
    val raw = Seq(
      (1L, "2024-01-01 10:00:00", 1.0),
      (1L, "2024-01-01 10:10:00", 2.0), // same session (10 min gap)
      (1L, "2024-01-01 11:30:00", 3.0), // new session (80 min gap)
      (2L, "2024-01-01 09:00:00", 5.0)
    ).toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    val batch = raw
      .withColumn("prev", lag("ts", 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev")) > 1800L, 1L).otherwise(0L))
      .withColumn("sid", sum("new_s").over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid").count().collect()
    assert(batch.length == 3) // user1: 2 sessions, user2: 1
  }

  test("stateful session: late within-gap event extends session start backward") {
    import graft.operators.Sessionize.{Ev, SessionState}
    val state = new TestGroupState(Option.empty[SessionState])
    // first batch: one event at 10:10
    graft.operators.Sessionize.sessionFn(1L,
      Iterator(Ev(1L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 1.0)), state).toList
    // second batch: late event at 10:00 (within gap) must move start back
    graft.operators.Sessionize.sessionFn(1L,
      Iterator(Ev(1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 2.0)), state).toList
    val s = state.getOption.get
    assert(s.start == java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime)
    assert(s.end == java.sql.Timestamp.valueOf("2024-01-01 10:10:00").getTime)
    assert(s.n == 2)
  }

  test("stateful session: timeout is clamped above the watermark") {
    import graft.operators.Sessionize.{Ev, SessionState}
    val state = new TestGroupState(Option.empty[SessionState])
    // batch 1: normal event, timeout = end + gap
    graft.operators.Sessionize.sessionFn(1L,
      Iterator(Ev(1L, java.sql.Timestamp.valueOf("2024-01-01 11:59:00"), 1.0)),
      state).toList
    // batch 2: watermark has advanced PAST end+gap, and this group's only
    // event is stale (dropped) — re-arming the timeout from the old state
    // would be below the watermark, which Spark rejects; the clamp must kick
    // in (require() inside setTimeoutTimestamp throws if unclamped)
    state.watermarkMs = java.sql.Timestamp.valueOf("2024-01-01 13:00:00").getTime
    graft.operators.Sessionize.sessionFn(1L,
      Iterator(Ev(1L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 9.0)),
      state).toList
    assert(state.lastTimeout.exists(_ > state.watermarkMs))
  }

  test("stateful session: pre-watermark events are dropped, not folded in") {
    import graft.operators.Sessionize.{Ev, SessionState}
    val state = new TestGroupState(Option.empty[SessionState])
    state.watermarkMs = java.sql.Timestamp.valueOf("2024-01-01 11:00:00").getTime
    val out = graft.operators.Sessionize.sessionFn(1L, Iterator(
      Ev(1L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 1.0), // stale
      Ev(1L, java.sql.Timestamp.valueOf("2024-01-01 11:30:00"), 2.0)
    ), state).toList
    assert(out.isEmpty)
    val s = state.getOption.get
    assert(s.n == 1 && s.total == 2.0, "stale event must not enter the session")
    assert(s.start == java.sql.Timestamp.valueOf("2024-01-01 11:30:00").getTime)
  }

  test("stateful session function: closes on gap, carries state") {
    import graft.operators.Sessionize.{Ev, SessionOut, SessionState}
    // exercise via a real streaming query over a memory-backed file source
    val dir = java.nio.file.Files.createTempDirectory("sess_stream").toString
    Seq(
      (1L, "2024-01-01 10:00:00", 1.0),
      (1L, "2024-01-01 10:10:00", 2.0),
      (1L, "2024-01-01 11:30:00", 3.0),
      (2L, "2024-01-01 09:00:00", 5.0)
    ).toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
      .parquet(s"$dir/in")
    val q = Sessionize.sessionizeStream(spark, streamIn)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    q.processAllAvailable()
    q.stop()
    val emitted = spark.sql("select * from sess_out").collect()
    // the 80-min gap forces user 1's first session (2 events, value 3.0) out
    assert(emitted.exists(r => r.getAs[Long]("user_id") == 1L &&
      r.getAs[Long]("n_events") == 2L &&
      math.abs(r.getAs[Double]("session_value") - 3.0) < 1e-9),
      s"expected closed first session of user 1, got: ${emitted.mkString("; ")}")
  }
}

class CosineExprSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("native cosine matches hand computation, interpreted and codegen") {
    val df = Seq(
      (Array(1.0, 0.0, 0.0), Array(1.0, 0.0, 0.0), 1.0),
      (Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), 0.0),
      (Array(1.0, 2.0, 3.0), Array(-1.0, -2.0, -3.0), -1.0),
      (Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0), 0.0) // zero-norm guard
    ).toDF("a", "b", "want")
    val got = df.select(cosine_sim(col("a"), col("b")).as("c"), col("want")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("null in → null out") {
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    val got = df.select(cosine_sim(col("a"), col("b"))).collect()
    assert(got(0).isNullAt(0))
  }

  test("SQL registration: cosine_sim callable from spark.sql") {
    graft.functions.VectorExpressions.register(spark)
    val got = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c," +
        " cosine_sim(array(2.0d, 0.0d), array(5.0d, 0.0d)) AS d")
      .collect()(0)
    assert(math.abs(got.getDouble(0)) < 1e-12)
    assert(math.abs(got.getDouble(1) - 1.0) < 1e-12)
  }

  test("native squared_dist: hand values, null propagation, lambda agreement") {
    import graft.functions.VectorExpressions.squared_dist
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0), 0.0),
      (Array(0.0, 0.0), Array(3.0, 4.0), 25.0),
      (Array(-1.0, 1.0), Array(1.0, -1.0), 8.0)
    ).toDF("a", "b", "want")
    df.select(squared_dist(col("a"), col("b")).as("d"), col("want")).collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
    val nulls = Seq((Some(Array(1.0)), Option.empty[Array[Double]])).toDF("a", "b")
    assert(nulls.select(squared_dist(col("a"), col("b"))).collect()(0).isNullAt(0))
    // agreement with the interpreted zip_with form on real embeddings
    val e = Tables.embeddings(spark, sf).limit(30)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val paired = e.crossJoin(e.select(col("vec_id").as("v2"), col("emb").as("emb2")))
      .filter(col("vec_id") < col("v2")).limit(100)
    val lambda = aggregate(zip_with(col("emb"), col("emb2"),
      (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, x) => acc + x)
    paired.select(squared_dist(col("emb"), col("emb2")).as("n"), lambda.as("l"))
      .collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("native dot_product: hand values, nulls, bit-identical to the lambda fold") {
    import graft.functions.VectorExpressions.dot_product
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0), 32.0),
      (Array(0.0, 0.0), Array(3.0, 4.0), 0.0),
      (Array(-1.0, 1.0), Array(1.0, -1.0), -2.0)
    ).toDF("a", "b", "want")
    df.select(dot_product(col("a"), col("b")).as("d"), col("want")).collect()
      .foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    val nulls = Seq((Some(Array(1.0)), Option.empty[Array[Double]])).toDF("a", "b")
    assert(nulls.select(dot_product(col("a"), col("b"))).collect()(0).isNullAt(0))
    // BIT-identical (not just close) to aggregate(zip_with(*)): same
    // left-to-right IEEE accumulation — the property that lets the GD/ADC
    // kernels swap to the native dot without perturbing rounded outputs
    val e = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val paired = e.crossJoin(e.select(col("vec_id").as("v2"), col("emb").as("emb2")))
      .filter(col("vec_id") < col("v2")).limit(200)
    val lambda = aggregate(zip_with(col("emb"), col("emb2"),
      (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    paired.select(dot_product(col("emb"), col("emb2")).as("n"), lambda.as("l"))
      .collect()
      .foreach(r => assert(r.getDouble(0) == r.getDouble(1),
        s"native ${r.getDouble(0)} != lambda ${r.getDouble(1)}"))
  }

  test("native dot_product_int: exact integer dot, nulls, agrees with the lambda form") {
    import graft.functions.VectorExpressions.dot_product_int
    val df = Seq(
      (Array(1, 2, 3), Array(4, 5, 6), 32L),
      (Array(-128, 127), Array(-128, 127), 128L * 128 + 127L * 127),
      (Array(0, 0), Array(7, -9), 0L)
    ).toDF("a", "b", "want")
    df.select(dot_product_int(col("a"), col("b")).as("d"), col("want")).collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1)))
    val nulls = Seq((Some(Array(1)), Option.empty[Array[Int]])).toDF("a", "b")
    assert(nulls.select(dot_product_int(col("a"), col("b"))).collect()(0).isNullAt(0))
    // agreement with the interpreted aggregate(zip_with) Long fold
    val e = spark.range(64).selectExpr(
      "id", "transform(sequence(1, 64), i -> cast((id * i) % 255 - 128 as int)) as a",
      "transform(sequence(1, 64), i -> cast((id + i * 7) % 255 - 128 as int)) as b")
    val lambda = aggregate(zip_with(col("a"), col("b"),
      (x, y) => (x * y).cast("long")), lit(0L), (acc, x) => acc + x)
    e.select(dot_product_int(col("a"), col("b")).as("n"), lambda.as("l")).collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("length mismatch → null across all five kernels, matching the lambda forms") {
    import graft.functions.VectorExpressions._
    // codegen path: a truncated row must DROP OUT (null), the answer the
    // zip_with forms gave via null padding — not score on a prefix
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    val r = df.select(cosine_sim(col("a"), col("b")),
        squared_dist(col("a"), col("b")),
        dot_product(col("a"), col("b")),
        logistic_grad(col("a"), col("b"), lit(1.0)),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0d), (acc, v) => acc + v))
      .collect()(0)
    (0 to 4).foreach(i => assert(r.isNullAt(i), s"col $i must be null"))
    val di = Seq((Array(1, 2, 3), Array(1, 2))).toDF("a", "b")
      .select(dot_product_int(col("a"), col("b"))).collect()(0)
    assert(di.isNullAt(0))
    // interpreted path (direct eval, no codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    val a = Literal.create(Seq(1.0, 2.0, 3.0), ArrayType(DoubleType))
    val b = Literal.create(Seq(1.0, 2.0), ArrayType(DoubleType))
    assert(graft.functions.CosineSimilarity(a, b).eval(null) == null)
    assert(graft.functions.SquaredDistance(a, b).eval(null) == null)
    assert(graft.functions.DotProduct(a, b).eval(null) == null)
    assert(graft.functions.DotProductInt(
      Literal.create(Seq(1, 2, 3), ArrayType(IntegerType)),
      Literal.create(Seq(1, 2), ArrayType(IntegerType))).eval(null) == null)
    assert(graft.functions.LogisticGradient(a, b, Literal(1.0)).eval(null) == null)
  }

  test("logistic_grad: fused kernel equals the unfused reference, stable at huge margins") {
    import graft.functions.VectorExpressions.logistic_grad
    def reference(x: Seq[Double], w: Seq[Double], y: Double): Seq[Double] = {
      val m = x.zip(w).map { case (a, b) => a * b }.sum
      val p = 1.0 / (1.0 + math.exp(-m))
      val loss = math.max(m, 0.0) - m * y + math.log1p(math.exp(-math.abs(m)))
      val hit = if ((p >= 0.5) == (y == 1.0)) 1.0 else 0.0
      x.map(_ * (p - y)) ++ Seq(loss, hit)
    }
    val cases = Seq(
      (Array(1.0, 0.5, -0.25), Array(0.2, -0.4, 1.0), 1.0),
      (Array(1.0, 0.0, 0.0), Array(0.0, 0.0, 0.0), 0.0),
      // |margin| = 100: the direct -y·log(p) - (1-y)·log(1-p) form is
      // -Inf here (1-p == 0.0 exactly); the stable form must stay finite
      (Array(1.0, 1.0), Array(50.0, 50.0), 0.0),
      (Array(1.0, 1.0), Array(-50.0, -50.0), 1.0)
    ).toDF("x", "w", "y")
    val got = cases
      .select(col("x"), col("w"), col("y"),
        logistic_grad(col("x"), col("w"), col("y")).as("g"))
      .collect()
    got.foreach { r =>
      val want = reference(r.getSeq[Double](0), r.getSeq[Double](1), r.getDouble(2))
      val g = r.getSeq[Double](3)
      assert(g.length == want.length)
      g.zip(want).foreach { case (a, b) =>
        assert(!a.isNaN && !a.isInfinite, s"non-finite kernel output $a")
        assert(math.abs(a - b) < 1e-12, s"$a != $b") }
    }
    // and the huge-margin loss is the exact linear tail: loss = m·(1-y) → 100
    val big = got.find(_.getSeq[Double](1).head == 50.0).get.getSeq[Double](3)
    assert(math.abs(big(2) - 100.0) < 1e-9)
  }

  test("agrees with the zip_with/aggregate formulation on real embeddings") {
    val e = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val paired = e.crossJoin(e.select(col("vec_id").as("v2"), col("emb").as("emb2")))
      .filter(col("vec_id") < col("v2")).limit(200)
    val both = paired.select(
      cosine_sim(col("emb"), col("emb2")).as("native"),
      (graft.operators.Similarity.dot(col("emb"), col("emb2")) /
        (sqrt(graft.operators.Similarity.dot(col("emb"), col("emb"))) *
         sqrt(graft.operators.Similarity.dot(col("emb2"), col("emb2"))))).as("lambda"))
      .collect()
    both.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }
}

class PqExprSpec extends AnyFunSuite {
  import SparkTestSession._

  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"),
      col("label"))

  test("fused pq_encode makes bit-identical decisions to the compositional argmin") {
    // the fused expression replaces array_min(array(struct(round(
    // squared_dist(slice, lit-array), 6), ci))) — rebuild that historical
    // form here and require EQUAL codes for every vector of the corpus
    // (same rounding: PqKernels.round6 replicates Catalyst round(x, 6)
    // HALF_UP on doubles; same slice accumulation order; same low-ci
    // tiebreak)
    val cb = graft.operators.Similarity.seededCodebooks(vecs, 16)
    val sub = cb.head.head.length
    def litArr(a: Seq[Double]) = array(a.map(lit): _*)
    def compositional(emb: org.apache.spark.sql.Column, s: Int) =
      array_min(array(cb.head.indices.map { ci =>
        val d2 = round(graft.functions.VectorExpressions.squared_dist(
          slice(emb, s * sub + 1, sub), litArr(cb(s)(ci))), 6)
        struct(d2.as("d"), lit(ci).as("c"))
      }: _*)).getField("c")
    val both = vecs.select(
      col("vec_id"),
      graft.functions.PqExpressions.pq_encode(col("emb"), cb).as("fused"),
      array(cb.indices.map(s => compositional(col("emb"), s)): _*).as("compo"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"codes diverged for vec ${r.getLong(0)}: ${r.getSeq[Int](1)} vs ${r.getSeq[Int](2)}")
    }
  }

  test("fused pq_adc scores bit-identically to the compositional lookup-table dots") {
    val cb = graft.operators.Similarity.seededCodebooks(vecs, 16)
    val sub = cb.head.head.length
    def litArr(a: Seq[Double]) = array(a.map(lit): _*)
    val coded = vecs.select(col("vec_id"), col("emb"),
      graft.functions.PqExpressions.pq_encode(col("emb"), cb).as("codes"))
    val compositional = cb.indices.map { s =>
      val table = array(cb.head.indices.map(ci => litArr(cb(s)(ci))): _*)
      graft.functions.VectorExpressions.dot_product(
        slice(col("emb"), s * sub + 1, sub),
        element_at(table, col("codes").getItem(s) + 1))
    }.reduce(_ + _)
    coded.select(
        graft.functions.PqExpressions.pq_adc(col("emb"), col("codes"), cb).as("f"),
        compositional.as("c"))
      .collect()
      .foreach(r => assert(r.getDouble(0) == r.getDouble(1),
        s"ADC diverged: ${r.getDouble(0)} vs ${r.getDouble(1)}"))
  }

  test("fused pq_assign equals the historical join+min Lloyd assignment") {
    // training assigns on UNROUNDED d2 — rebuild the historical
    // subvector-table ⋈ broadcast-codebooks → groupBy-min shape and
    // require identical (ci, d2) per (vector, subspace)
    import spark.implicits._
    val cb = graft.operators.Similarity.seededCodebooks(vecs, 16)
    val sub = cb.head.head.length
    val nsub = cb.length
    val fused = vecs.select(col("vec_id"),
        graft.functions.PqExpressions.pq_assign(col("emb"), cb).as("a"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val sv = vecs.select(col("vec_id"), explode(array((0 until nsub).map { s =>
        struct(lit(s).as("s"), slice(col("emb"), s * sub + 1, sub).as("v"))
      }: _*)).as("x"))
      .select(col("vec_id"), col("x.s").as("s"), col("x.v").as("v"))
    val cbDf = cb.zipWithIndex.flatMap { case (cws, s) =>
      cws.zipWithIndex.map { case (w, ci) => (s, ci, w) }
    }.toDF("s", "ci", "w")
    val hist = sv.join(broadcast(cbDf), "s")
      .withColumn("d2",
        graft.functions.VectorExpressions.squared_dist(col("v"), col("w")))
      .groupBy("vec_id", "s")
      .agg(min(struct(col("d2"), col("ci"))).as("m"))
      .collect()
    assert(hist.nonEmpty)
    hist.foreach { r =>
      val (vid, s) = (r.getLong(0), r.getInt(1))
      val m = r.getStruct(2)
      val a = fused(vid)
      assert(a(s).toInt == m.getInt(1),
        s"code diverged at ($vid, $s): fused ${a(s).toInt} vs ${m.getInt(1)}")
      assert(a(nsub + s) == m.getDouble(0),
        s"d2 diverged at ($vid, $s): fused ${a(nsub + s)} vs ${m.getDouble(0)}")
    }
  }

  test("truncated embedding → null codes/assign/score, never an unchecked off-heap read") {
    import spark.implicits._
    val cb = graft.operators.Similarity.seededCodebooks(vecs, 16)
    val dim = cb.length * cb.head.head.length
    val bad = Seq(((0 until dim - 3).map(_.toDouble), (0 until cb.length).map(_ => 0)))
      .toDF("emb", "codes")
    val r = bad.select(
        graft.functions.PqExpressions.pq_encode(col("emb"), cb),
        graft.functions.PqExpressions.pq_assign(col("emb"), cb),
        graft.functions.PqExpressions.pq_adc(col("emb"), col("codes"), cb))
      .collect()(0)
    (0 to 2).foreach(i => assert(r.isNullAt(i), s"col $i must be null"))
    // a code array shorter than nsub refuses too
    val short = Seq(((0 until dim).map(_.toDouble), Seq(0))).toDF("emb", "codes")
    assert(short.select(
        graft.functions.PqExpressions.pq_adc(col("emb"), col("codes"), cb))
      .collect()(0).isNullAt(0))
  }

  test("out-of-range code value → null ADC score, never an AIOOBE in generated code") {
    // a stored/streamed code table read against RETRAINED codebooks with a
    // smaller ncode must degrade to a null score (the compositional
    // element_at behavior), not throw mid-stage
    import spark.implicits._
    val cb = graft.operators.Similarity.seededCodebooks(vecs, 16)
    val dim = cb.length * cb.head.head.length
    val ncode = cb.head.length
    val emb = (0 until dim).map(_.toDouble)
    val bad = Seq(
      (emb, Seq.fill(cb.length)(ncode)),                // == ncode: one past the table
      (emb, -1 +: Seq.fill(cb.length - 1)(0)),          // negative
      (emb, Seq.fill(cb.length)(0)))                    // control: in range
      .toDF("emb", "codes")
    val rows = bad.select(
        graft.functions.PqExpressions.pq_adc(col("emb"), col("codes"), cb))
      .collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0), "out-of-range code must null")
    assert(!rows(2).isNullAt(0), "in-range control must score")
    // interpreted path (direct eval, no codegen) agrees
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    val embLit = Literal.create(emb, ArrayType(DoubleType))
    def adc(codes: Seq[Int]) = graft.functions.PqAdc(
      embLit, Literal.create(codes, ArrayType(IntegerType)), cb)
    assert(adc(Seq.fill(cb.length)(ncode)).eval(null) == null)
    assert(adc(-1 +: Seq.fill(cb.length - 1)(0)).eval(null) == null)
    assert(adc(Seq.fill(cb.length)(0)).eval(null) != null)
  }

  test("pq_encode round6 equals Catalyst round(x, 6) on representative doubles") {
    // the helper must track Spark's RoundBase exactly — probe boundary
    // values through BOTH paths (codegen round and the kernel)
    val xs = Seq(0.0000005, 0.0000015, 0.1234565, 1.9999995, 123.45678949,
      0.9999994999, 2.0 / 3.0, 1e-12, 7.7, 0.30000000000000004)
    import spark.implicits._
    val got = xs.toDF("x")
      .select(round(col("x"), 6).as("spark_round"), col("x")).collect()
    got.foreach { r =>
      assert(graft.functions.PqKernels.round6(r.getDouble(1)) == r.getDouble(0),
        s"round6 drifted from Catalyst round at ${r.getDouble(1)}")
    }
  }
}

class PolyHashExprSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._
  import graft.functions.HashExpressions.{poly_hash, poly_token_hash}

  test("native fold is bit-identical to the Scala kernels, codegen and interpreted") {
    val cases = Seq("", "a", "spark", "Zürich ünïcode", "x" * 300,
      "tab\tand\nnewline", "0:42", "123456789:7")
    // codegen path (whole-stage over a local relation)
    val got = cases.toDF("s")
      .select(col("s"), poly_hash(col("s")).as("h"), poly_token_hash(col("s")).as("m"))
      .collect()
    got.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) == graft.functions.TextFunctions.polyHash(s), s"fold($s)")
      assert(r.getLong(2) == graft.functions.TextFunctions.polyHash(s) * 0x2545F4914F6CDD1DL,
        s"mixed($s)")
    }
    // interpreted path (direct eval, no codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    cases.foreach { s =>
      val e = graft.functions.PolyHash(Literal(s), mixed = false)
      assert(e.eval(null) == graft.functions.TextFunctions.polyHash(s))
    }
  }

  test("null in, null out; SQL surface via extensions") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(poly_hash(col("s"))).collect()(0)
    assert(r.isNullAt(0))
    val sql = spark.sql("SELECT poly_token_hash('spark') AS h").collect()(0)
    assert(sql.getLong(0) ==
      graft.functions.TextFunctions.polyHash("spark") * 0x2545F4914F6CDD1DL)
  }

  test("poly_step/poly_finish/poly_combine: bit-identical to the Long fold, codegen and interpreted") {
    import graft.functions.HashExpressions.{poly_combine, poly_finish, poly_step}
    def ref(xs: Seq[Long]): Long = {
      var h = 0L
      xs.foreach(x => h = h * 1000000007L + x)
      h * 0x2545F4914F6CDD1DL
    }
    // wraparound-heavy inputs: extremes, sign flips, golden-ratio products
    val cases = Seq(
      Seq(0L), Seq(1L, 2L, 3L), Seq(Long.MaxValue, Long.MinValue),
      Seq(-1L, -1L, -1L, -1L), Seq(0x2545F4914F6CDD1DL, 1000000007L),
      Seq(42L, Long.MinValue, 7L, Long.MaxValue))
    // codegen path: a DF column per arity
    cases.foreach { xs =>
      val df = Seq(xs).toDF("xs")
      val cols = xs.indices.map(i => element_at(col("xs"), i + 1))
      val got = df.select(poly_combine(cols: _*)).collect()(0).getLong(0)
      assert(got == ref(xs), s"poly_combine($xs)")
    }
    // interpreted path (direct eval)
    import org.apache.spark.sql.catalyst.expressions.Literal
    cases.foreach { xs =>
      val e = graft.functions.PolyFinish(
        xs.map(x => Literal(x): org.apache.spark.sql.catalyst.expressions.Expression)
          .reduceLeft((a, b) => graft.functions.PolyStep(a, b)))
      assert(e.eval(null) == ref(xs), s"interpreted poly_combine($xs)")
    }
    // null propagation through the chain
    val r = Seq((Option.empty[java.lang.Long], 5L)).toDF("a", "b")
      .select(poly_finish(poly_step(col("a"), col("b")))).collect()(0)
    assert(r.isNullAt(0))
    // the single-column degenerate case: fold from zero = finish(x)
    val one = Seq(99L).toDF("x").select(poly_combine(col("x"))).collect()(0).getLong(0)
    assert(one == 99L * 0x2545F4914F6CDD1DL)
  }

  test("split assignment and fingerprints survive the UDF-to-expression swap") {
    // the expression replaced Scala UDFs on hash-oracled paths — any value
    // drift would show as a driver hash mismatch; pin the kernels here too
    val fp = graft.functions.TextFunctions.fingerprintQuery(spark, sf).collect()
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    fp.foreach { r =>
      val want = graft.functions.TextFunctions.polyHash(
        graft.functions.TextFunctions.normString(texts(r.getLong(0))))
      assert(r.getAs[Long]("poly_fp") == want)
    }
  }
}

class NearestCellsExprSpec extends AnyFunSuite {
  import SparkTestSession._

  /** The historical crossJoin+window spelling of the nearest-cells
    * ranking, rebuilt verbatim — the fused [[graft.functions
    * .NearestCellsRank]] kernel must reproduce its (cell, cos_c, crk)
    * rows exactly (same rounded cosines, same label-ASC tiebreak). */
  private def windowForm(vecs: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame, nprobe: Int) = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
      .orderBy(col("cos_c").desc, col("c_label").asc)
    vecs.crossJoin(broadcast(cents))
      .withColumn("cos_c", round(cosine_sim(col("emb"), col("centroid")), 6))
      .withColumn("crk", row_number().over(w))
      .filter(col("crk") <= nprobe)
      .withColumn("cell", col("c_label"))
      .drop("centroid", "c_label")
  }

  private def keyed(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"), col("cell").cast("string"), col("cos_c"), col("crk"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .toSet

  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"),
      col("label"))

  test("fused nearest_cells equals the crossJoin+window form (string labels)") {
    val cents = graft.operators.Similarity.meanVectors(
        vecs.select(col("label"), col("emb")), "label", "emb")
      .withColumnRenamed("label", "c_label")
    for (nprobe <- Seq(1, 2, 3)) {
      val fused = keyed(graft.operators.Similarity.nearestCells(
        vecs.select(col("vec_id"), col("emb")), cents, nprobe))
      val window = keyed(windowForm(
        vecs.select(col("vec_id"), col("emb")), cents, nprobe))
      assert(fused == window, s"nearest-cells diverged at nprobe=$nprobe")
      assert(fused.nonEmpty)
    }
  }

  test("fused nearest_cells equals the window form on LONG labels (adaptive seeds)") {
    val c = vecs.select(col("vec_id"), col("emb"))
    val seeds = c.filter(pmod(col("vec_id"), lit(97)) === 0)
      .select(col("vec_id").as("c_label"), col("emb").as("centroid"))
    val fused = keyed(graft.operators.Similarity.nearestCells(c, seeds, 2))
    val window = keyed(windowForm(c, seeds, 2))
    assert(fused == window && fused.nonEmpty)
  }

  test("empty centroid set yields zero rows, like the empty cross join") {
    val cents = graft.operators.Similarity.meanVectors(
        vecs.select(col("label"), col("emb")), "label", "emb")
      .withColumnRenamed("label", "c_label").limit(0)
    assert(graft.operators.Similarity.nearestCells(
      vecs.select(col("vec_id"), col("emb")), cents, 2).count() == 0L)
  }
}
