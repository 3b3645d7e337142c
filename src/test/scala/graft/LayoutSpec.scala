package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BitExpressions.interleave_bits
import graft.operators.{Layout, Pruning, Sampling}

class LayoutSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("interleave_bits matches a reference bit loop (eval + codegen paths)") {
    def ref(x: Int, y: Int): Long = {
      var z = 0L
      for (i <- 0 until 32)
        z |= (((x.toLong >> i) & 1L) << (2 * i)) | (((y.toLong >> i) & 1L) << (2 * i + 1))
      z
    }
    val cases = Seq((0, 0), (1, 0), (0, 1), (3, 5), (65535, 1), (123456, 654321),
      (Int.MaxValue, 0), (0, Int.MaxValue))
    val df = cases.toDF("x", "y")
    // codegen path (projection over a DataFrame)
    val got = df.select(col("x"), col("y"), interleave_bits(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    cases.foreach { case (x, y) => assert(got((x, y)) === ref(x, y), s"($x,$y)") }
    // z is monotone per dimension when the other is fixed (the property
    // range pruning relies on)
    assert(ref(5, 9) < ref(6, 9) && ref(5, 9) < ref(5, 10))
  }

  test("z-ordered layout prunes box queries better than single-column sort") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val base = Tables.lineitem(spark, sf).select(
      pmod(col("l_partkey"), lit(65536)).cast("int").as("pb"),
      pmod(col("l_suppkey"), lit(65536)).cast("int").as("sb"))
    val n = 8
    Layout.zorderedWrite(base, "pb", "sb", n, s"$dir/zorder")
    base.repartitionByRange(n, col("pb")).sortWithinPartitions("pb")
      .write.mode("overwrite").parquet(s"$dir/bypb")
    // per-FILE min/max from the data itself (what parquet footer stats hold)
    def fileRanges(path: String) =
      spark.read.parquet(path).groupBy(input_file_name())
        .agg(min("pb").as("pbLo"), max("pb").as("pbHi"),
          min("sb").as("sbLo"), max("sb").as("sbHi"))
        .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    val zr = fileRanges(s"$dir/zorder")
    val pr = fileRanges(s"$dir/bypb")
    // box selective on sb (the low quarter of its range): sb clustering
    // only exists in the z layout, so it must skip files the pb-sorted
    // layout cannot
    val (mn, mx) = base.agg(min("sb"), max("sb")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).head
    val (sbLo, sbHi) = (mn, mn + (mx - mn) / 4)
    def overlapping(rs: Array[(Int, Int, Int, Int)]) =
      rs.count { case (_, _, lo, hi) => hi >= sbLo && lo <= sbHi }
    assert(overlapping(zr) < overlapping(pr),
      s"z-order should prune sb-boxes: z=${overlapping(zr)}/${zr.length} " +
        s"vs pb-sort=${overlapping(pr)}/${pr.length}")
  }

  test("stratified sample: exact per-stratum allocation, reproducible") {
    val s1 = Sampling.stratifiedSample(spark, sf)
    val expected = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> math.ceil(r.getLong(1) * 0.1).toLong).toMap
    val got = s1.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // same membership under a different physical partitioning
    val s2 = Sampling.stratifiedSample(spark, sf)
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = s2.repartition(7).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
  }

  test("two-phase stratified sample: row-for-row equal to the exact window form") {
    // the strongest possible pin for the mega-stratum path: same k
    // smallest (hash, doc_id) per stratum, so membership — not just
    // counts — must match the window form exactly
    val exact = Sampling.stratifiedSample(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val twoPhase = Sampling.stratifiedSampleTwoPhase(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(twoPhase == exact,
      s"membership drift: ${twoPhase.size} vs ${exact.size}; " +
        s"diff=${(twoPhase diff exact).take(3)} / ${(exact diff twoPhase).take(3)}")
    // and the only per-stratum sort left is over the quantile band: the
    // plan carries exactly ONE window (the band rank) where the exact
    // form needs a full-stratum window
    val plan = Sampling.stratifiedSampleTwoPhase(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Window".r.findAllIn(plan).length == 1,
      s"expected exactly the band-rank window:\n$plan")
  }

  test("cluster-balanced sample: per-cluster cap respected, membership reproducible") {
    val budget = 40
    val s1 = Sampling.clusterBalancedSample(spark, sf, budget)
    val per = s1.groupBy("cluster").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per.nonEmpty)
    // never over budget, and the summary's allocation matches exactly
    per.values.foreach(n => assert(n <= budget))
    val summary = Sampling.clusterBalancedSummary(spark, sf, budget).collect()
    summary.foreach { r =>
      val expect = math.min(budget.toLong, r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_sampled") == expect, s"allocation drift: $r")
      assert(per.getOrElse(r.getString(0), 0L) == expect)
    }
    // an under-budget cluster keeps ALL its docs; an over-budget one is cut
    assert(summary.exists(r => r.getAs[Long]("n_docs") > budget),
      "fixture must exercise the capped arm")
    // same membership under a different physical partitioning
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.clusterBalancedSample(spark, sf, budget)
      .repartition(7).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
  }

  test("budget sample: bounded-heap membership ≡ the window row_number form") {
    // the r15 portable rank hash made membership SQL-oracle-able; this leg
    // pins the HEAP KERNEL against an independent in-Spark spelling of the
    // same selection (k smallest (hash, doc_id) per key via a window), so
    // a kernel break can never hide behind a matching oracle edit
    val budget = 50
    val heap = Sampling.budgetSample(spark, sf, budget)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(Sampling.budgetRankHash(col("doc_id"), 42), col("doc_id"))
    val window = docs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= budget)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(heap === window && heap.nonEmpty)
  }

  test("bloom semi join output equals the plain semi join") {
    val viaBloom = Pruning.bloomSemiJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val hot = Tables.orders(spark, sf).filter(col("o_totalprice") > 150000.0)
      .select("o_orderkey")
    val plain = Tables.lineitem(spark, sf)
      .join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaBloom === plain && viaBloom.nonEmpty)
  }

  test("corpus shuffle: two-phase prefix sum equals the one-task global window") {
    // the strongest pin for the decomposition: cum_before — not just
    // shard — must match the single-window spelling row-for-row
    val twoPhase = Layout.shuffleShards(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getInt(4))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("shuffle_key").asc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val global = Layout.shuffleShards(spark, sf)
      .select("doc_id", "n_tokens", "shuffle_key")
      .withColumn("cum_before",
        sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("shard", expr(s"CAST(cum_before DIV ${Layout.ShardTokens} AS INT)"))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getInt(4))).toSet
    assert(twoPhase == global && twoPhase.nonEmpty,
      s"prefix-sum drift: ${(twoPhase diff global).take(3)} / ${(global diff twoPhase).take(3)}")
  }

  test("corpus shuffle: shards are contiguous token ranges and budget-bounded") {
    val rows = Layout.shuffleShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getInt(4)))
    val perShard = rows.groupBy(_._4)
    // shard k spans exactly [k·B, (k+1)·B) in cumulative-token space
    perShard.foreach { case (k, docs) =>
      docs.foreach { case (_, _, cum, _) =>
        assert(cum >= k * Layout.ShardTokens && cum < (k + 1) * Layout.ShardTokens,
          s"doc at cum=$cum landed in shard $k")
      }
    }
    // shard ids are dense 0..max (greedy fill never skips a budget window
    // unless one doc is larger than B — none are in this corpus)
    val ids = perShard.keySet
    assert(ids == (0 to ids.max).toSet, s"shard gaps: $ids")
    // deterministic: content-identical under a different partitioning
    val again = Layout.shuffleShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(again == rows.map(r => (r._1, r._3)).toSet)
  }

  test("shuffleShardsOf: pre-tokenized metadata input deals identically to raw text") {
    // r15: the registered corpus queries feed the memoized quality
    // n_tokens (materialized ingest metadata) instead of re-tokenizing —
    // this leg pins that the two input shapes produce the SAME deal
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSet
    val raw = rows(Layout.shuffleShardsOf(spark,
      Tables.documents(spark, sf).select("doc_id", "text")))
    val meta = rows(Layout.shuffleShardsOfCounts(spark,
      graft.functions.TextFunctions.qualityQuery(spark, sf)
        .select("doc_id", "n_tokens")))
    assert(raw === meta && raw.nonEmpty)
  }

  test("corpus shuffle: no single-partition window — the prefix sum stays bucketed") {
    val plan = Layout.shuffleShards(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"one-task funnel in the shuffle-shard plan:\n$plan")
    // every window is partitioned by the hash bucket, never global
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("bucket")),
      s"expected only bucket-partitioned windows:\n$plan")
  }

  test("incremental shuffle: frozen prefix bit-identical, fresh boundary, disjoint generations") {
    val inc = Layout.shuffleShardsIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5)))
    val (gen0, gen1) = inc.partition(_._6 == 0)
    assert(gen0.nonEmpty && gen1.nonEmpty)
    // the frozen prefix equals the standalone export of the old half —
    // appending new data must never re-deal an already-written doc
    val standalone = Layout.shuffleShardsOf(spark,
        Tables.documents(spark, sf).filter(col("doc_id") % 2 === 0))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSet
    assert(gen0.map(t => (t._1, t._2, t._3, t._4, t._5)).toSet == standalone,
      "frozen prefix drifted from its original assignment")
    // the new generation starts at a fresh shard boundary past the prefix
    val oldTotal = gen0.map(_._2).sum
    val b = Layout.ShardTokens
    val base = ((oldTotal + b - 1) / b) * b
    assert(gen1.map(_._4).min == base, "first appended doc must sit on the boundary")
    assert(gen1.map(_._5).min > gen0.map(_._5).max,
      "appended shards must be fresh ids")
    // no shard holds both generations (old files are never reopened)
    assert(gen0.map(_._5).toSet.intersect(gen1.map(_._5).toSet).isEmpty)
  }

  test("zero-token docs are excluded; an exact-multiple frozen total cannot glue generations") {
    val b = 10L
    // Pre-fix failure shape: a whitespace-only doc sorting LAST in a frozen
    // generation whose token total is an exact multiple of B lands at
    // cum_before == total → shard total/B — the id the boundary start
    // hands the next generation's first doc. Pick the even id whose
    // shuffle key is max (keys depend on doc_id+seed only, not text) and
    // make THAT doc whitespace-only.
    val evenIds = (0L until 20L by 2).toSeq
    val keyed = Layout.shuffleShardsOf(spark,
        evenIds.map(id => (id, "w")).toDF("doc_id", "text"), shardTokens = b)
      .select("doc_id", "shuffle_key").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val wsId = keyed.maxBy(t => (t._2, t._1))._1
    // remaining 9 even docs total exactly 2B = 20 tokens
    val counts = Seq(2, 2, 2, 2, 2, 2, 2, 2, 4)
    val evens = evenIds.filterNot(_ == wsId).sorted.zip(counts)
      .map { case (id, c) => (id, Seq.fill(c)("tok").mkString(" ")) } :+
      ((wsId, "   \t  "))
    val odds = Seq((1L, "a b c"), (3L, "d e f"), (5L, "g h i"))
    val frozen = Layout.shuffleShardsOf(spark,
      evens.toDF("doc_id", "text"), shardTokens = b).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getInt(4)))
    // the whitespace doc is not assigned at all
    assert(!frozen.exists(_._1 == wsId), "zero-token doc must be excluded")
    val total = frozen.map(_._2).sum
    assert(total == 2 * b, "test setup: frozen total must be an exact shard multiple")
    // every assigned doc sits strictly below the total → max shard < total/B
    assert(frozen.map(_._3).max < total)
    assert(frozen.map(_._4).max < (total / b).toInt)
    // the appended generation starts at shard total/B — disjoint from frozen
    val base = ((total + b - 1) / b) * b
    val appended = Layout.shuffleShardsOf(spark,
      odds.toDF("doc_id", "text"), shardTokens = b, startTokens = base)
      .collect().map(r => (r.getLong(0), r.getInt(4)))
    assert(appended.map(_._2).min == (base / b).toInt)
    assert(frozen.map(_._4).toSet.intersect(appended.map(_._2).toSet).isEmpty,
      "generations must never share a shard id")
    // the streaming twin's boundary arithmetic inherits the same guarantee
    val streamed = graft.streaming.StreamShards.shardBatch(spark,
      odds.toDF("doc_id", "text"), highWater = total, shardTokens = b)
      .collect().map(r => r.getInt(4))
    assert(streamed.min == (base / b).toInt)
  }

  test("shuffled write: shard dirs hold exactly the planned docs in shuffle order") {
    val out = java.nio.file.Files.createTempDirectory("shuffle_export").toString
    Layout.shuffledWrite(spark, sf, out)
    val plan = Layout.shuffleShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(4))).toMap
    val written = spark.read.parquet(out)
      .select("doc_id", "shard", "shuffle_key").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(written.length == plan.size)
    written.foreach { case (doc, shard, _) =>
      assert(plan(doc) == shard, s"doc $doc exported to shard $shard, planned ${plan(doc)}")
    }
    // text survives the round trip joined intact
    val n = spark.read.parquet(out).filter(col("text").isNotNull).count()
    assert(n == plan.size.toLong)
  }

  test("weighted sample: inclusion frequency tracks weights across seeds (A-ES law)") {
    // two heavy docs (w=400) among 18 light ones (w=1); k=2 per seed.
    // P(a heavy doc wins a slot) ≈ 400/818 per draw — across 60 seeds the
    // heavy pair must dominate selections by an order of magnitude.
    val docs = ((1L to 18L).map(i => (i, 0L)) ++ Seq((100L, 399L), (101L, 399L)))
      .toDF("doc_id", "nc")
      .select(col("doc_id"), (col("nc") + 1L).as("weight"))
    var heavy = 0; var light = 0
    (1 to 60).foreach { seed =>
      Sampling.weightedSampleOf(docs, "weight", 2, seed)
        .collect().map(_.getLong(0)).foreach { id =>
          if (id >= 100L) heavy += 1 else light += 1
        }
    }
    assert(heavy > 8 * math.max(light, 1),
      s"weighted draw not weight-proportional: heavy=$heavy light=$light")
  }

  test("weighted sample: budget >= n keeps everything; membership partitioning-invariant") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), (col("n_chars") + 1L).as("weight"))
    val all = Sampling.weightedSampleOf(docs, "weight", 100000).count()
    assert(all == docs.count())
    val a = Sampling.weightedSampleOf(docs, "weight", 60).collect()
      .map(_.getLong(0)).toSet
    val b = Sampling.weightedSampleOf(docs.repartition(7), "weight", 60).collect()
      .map(_.getLong(0)).toSet
    assert(a == b && a.size == 60)
  }

  test("weighted sample plan: TakeOrderedAndProject, never a global sort") {
    val plan = Sampling.weightedSample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k merge, got:\n$plan")
  }
}
