package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, Dedup}

class CurationSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("connected components: chains collapse to min label (driver fast path)") {
    // graph: 1-2, 2-3 (chain), 10-11, isolated vertices absent from edges
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val comp = Curation.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(10L) == 10L && comp(11L) == 10L)
  }

  test("connected components: long chain (radius 12) fully converges via pointer jumps") {
    val chain = (1L to 12L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("doc_a", "doc_b")
    // driverMaxEdges = -1 forces the distributed label-propagation loop
    val comp = Curation.connectedComponents(chain, driverMaxEdges = -1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 12L).foreach(id => assert(comp(id) == 1L, s"node $id -> ${comp(id)}"))
  }

  test("connected components: early termination stops before the round cap") {
    // pairs/triangles converge in ~2 rounds + 1 fixpoint-confirming round;
    // the cap (10) must NOT all execute
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val (comp, rounds) =
      Curation.connectedComponentsRounds(pairs, driverMaxEdges = -1L)
    val m = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(3L) == 1L && m(11L) == 10L)
    assert(rounds < 10, s"expected early termination, ran $rounds rounds")
    assert(rounds >= 2, s"fixpoint needs a confirming round, got $rounds")
  }

  test("connected components: driver union-find ≡ distributed loop") {
    // mixed fixture: chain, triangle, pair, singleton-by-absence, and a
    // diamond (cycle) — every label identical across the two paths
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), // chain
      (7L, 8L), (8L, 9L), (7L, 9L),               // triangle
      (20L, 21L),                                  // pair
      (30L, 31L), (31L, 32L), (30L, 33L), (32L, 33L)) // diamond cycle
      .toDF("doc_a", "doc_b")
    val fast = Curation.connectedComponentsRounds(pairs)
    val slow = Curation.connectedComponentsRounds(pairs, driverMaxEdges = -1L)
    assert(fast._2 == 0, "small graph must take the driver fast path")
    assert(slow._2 > 0, "forced path must be the distributed loop")
    val fm = fast._1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sm = slow._1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fm == sm, s"paths diverged: driver=$fm loop=$sm")
    assert(fm(4L) == 1L && fm(9L) == 7L && fm(21L) == 20L && fm(33L) == 30L)
  }

  test("curriculum plan: quartile allocation exact, buckets ordered and disjoint") {
    val rows = Curation.curriculumPlan(spark, sf).collect()
      .map(r => r.getAs[Int]("bucket") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("min_score"),
          r.getAs[Double]("max_score"))).toMap
    assert(rows.keySet == Set(1, 2, 3, 4))
    val n = rows.values.map(_._1).sum
    // type-1 quantile cuts: each bucket holds between ⌊N/4⌋−ties and
    // ⌈N/4⌉+ties docs; with distinct-heavy scores the split is near-exact
    rows.values.foreach { case (c, _, _) =>
      assert(math.abs(c - n / 4.0) <= math.max(4, n / 20.0), s"allocation skew: $rows")
    }
    // easy→hard: bucket i's score range sits strictly above bucket i+1's
    (1 to 3).foreach { b =>
      assert(rows(b)._2 > rows(b + 1)._3,
        s"bucket $b overlaps ${b + 1}: ${rows(b)} vs ${rows(b + 1)}")
    }
  }

  test("split contamination: exactly the cross-split near-dup pairs") {
    val pairs = Dedup.minhashNearDups(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assume(pairs.nonEmpty)
    val splits = Curation.splitAssign(spark, sf, 42).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val got = Curation.splitContamination(spark, sf).collect()
    got.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(pairs.contains((a, b)))
      assert(r.getAs[String]("split_a") == splits(a))
      assert(r.getAs[String]("split_b") == splits(b))
      assert(splits(a) != splits(b))
    }
    // completeness: every cross-split pair is reported
    val expected = pairs.count { case (a, b) => splits(a) != splits(b) }
    assert(got.length == expected)
  }

  test("decontaminate: flags consistent, one row per train doc, 13-gram ⊆ 7-gram") {
    val splits = Curation.splitAssign(spark, sf, 42).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val d13 = Curation.decontaminate(spark, sf).collect()
    // exactly the train split, each exactly once
    assert(d13.map(_.getAs[Long]("doc_id")).toSet
      == splits.collect { case (id, "train") => id }.toSet)
    assert(d13.length == splits.values.count(_ == "train"))
    d13.foreach { r =>
      assert(r.getAs[Boolean]("contaminated")
        == (r.getAs[Long]("n_contaminated_ngrams") > 0))
    }
    // a shared 13-gram contains a shared 7-gram, so flags are monotone in n
    val c13 = d13.filter(_.getAs[Boolean]("contaminated"))
      .map(_.getAs[Long]("doc_id")).toSet
    assume(c13.nonEmpty) // fixture plants cross-split near-dups
    val c7 = Curation.decontaminate(spark, sf, n = 7).collect()
      .filter(_.getAs[Boolean]("contaminated")).map(_.getAs[Long]("doc_id")).toSet
    assert(c13.subsetOf(c7), s"13-gram hits not within 7-gram hits: ${c13 -- c7}")
  }

  test("dup clusters: every doc labeled, one keeper per cluster") {
    val c = Curation.dupClusters(spark, sf)
    assert(c.count() == Tables.documents(spark, sf).count())
    val perCluster = c.groupBy("cluster_id")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("keepers"),
        count(lit(1)).as("n"))
      .collect()
    perCluster.foreach { r =>
      assert(r.getLong(1) == 1L, s"cluster ${r.get(0)} has ${r.getLong(1)} keepers")
    }
    // planted near-dups must share a cluster
    val pairs = Dedup.minhashNearDups(spark, sf).collect()
    assume(pairs.nonEmpty)
    val comp = c.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { p =>
      assert(comp(p.getAs[Long]("doc_a")) == comp(p.getAs[Long]("doc_b")))
    }
  }

  test("jaccard components: closure over the pair graph, canonical = min, soft weights sum to 1") {
    val c = Curation.jaccardComponents(spark, sf)
    assert(c.count() == Tables.documents(spark, sf).count())
    val comp = c.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every Jaccard pair shares a component; component = min over members
    val pairs = Dedup.ngramJaccardPairs(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assume(pairs.nonEmpty)
    pairs.foreach { case (a, b) => assert(comp(a) == comp(b)) }
    val members = comp.toSeq.groupBy(_._2)
    members.foreach { case (label, ms) =>
      assert(ms.map(_._1).min == label, s"component $label is not its min member")
    }
    // canonical flag marks exactly the label-bearing member
    c.collect().foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(0) == r.getLong(1)))
    }
    // soft weights: each component contributes exactly 1.0 expected mass
    val w = Curation.softDedupWeights(spark, sf)
      .groupBy("component").agg(sum("weight").as("mass"), count(lit(1)).as("n"))
      .collect()
    w.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-4,
        s"component ${r.getLong(0)} mass ${r.getDouble(1)}")
    }
    // non-trivial clusters exist at this SF, so the closure is exercised
    assert(w.exists(_.getLong(2) >= 2))
  }

  test("curation: keep iff no drop reason; near-dup losers dropped") {
    val cur = Curation.curate(spark, sf).collect()
    cur.foreach { r =>
      assert(r.getAs[Boolean]("keep") == (r.getAs[String]("drop_reason") == null))
    }
    val dropped = cur.filter(_.getAs[String]("drop_reason") == "near_duplicate")
    val pairs = Dedup.minhashNearDups(spark, sf).count()
    assert(dropped.length > 0 == pairs > 0)
  }

  test("split assignment: total coverage, disjoint, deterministic, ~80/10/10") {
    val a = Curation.splitAssign(spark, sf).collect()
    assert(a.length == Tables.documents(spark, sf).count())
    val bySplit = a.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    val n = a.length.toDouble
    assert(bySplit("train") / n > 0.7 && bySplit("train") / n < 0.9)
    // deterministic: identical assignment on recompute
    val b = Curation.splitAssign(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    a.foreach(r => assert(b(r.getLong(0)) == r.getString(1)))
    // different seed ⇒ different (not identical) assignment
    val c = Curation.splitAssign(spark, sf, seed = 7).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.exists(r => c(r.getLong(0)) != r.getString(1)))
  }

  test("source reputation: dense ranks, keep = top-k, totals cover the corpus") {
    val r = Curation.sourceReputation(spark, sf).collect()
    assert(r.map(_.getAs[Long]("n_docs")).sum
      == Tables.documents(spark, sf).count())
    assert(r.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to r.length))
    val byRank = r.sortBy(_.getAs[Int]("rank"))
    val reps = byRank.map(_.getAs[Double]("reputation"))
    assert(reps.zip(reps.tail).forall { case (a, b) => a >= b })
    byRank.foreach { row =>
      assert(row.getAs[Boolean]("keep") == (row.getAs[Int]("rank") <= 15))
      val dr = row.getAs[Double]("dup_rate")
      assert(dr >= 0.0 && dr <= 1.0)
      assert(row.getAs[Long]("n_dup_docs") <= row.getAs[Long]("n_docs"))
    }
    assert(byRank.count(_.getAs[Boolean]("keep")) == math.min(15, r.length))
  }

  test("curation pipeline: monotone funnel anchored at the corpus") {
    val f = Curation.curationPipeline(spark, sf).collect()
      .sortBy(_.getAs[Int]("stage_id"))
    assert(f.map(_.getAs[Int]("stage_id")).toSeq == (1 to 5))
    assert(f.head.getAs[Long]("n_docs") == Tables.documents(spark, sf).count())
    val docsT = f.map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens")))
    docsT.zip(docsT.tail).foreach { case ((d1, t1), (d2, t2)) =>
      assert(d2 <= d1 && t2 <= t1, s"funnel not monotone: $docsT")
    }
    // every stage does something across the suite's fixtures: at minimum the
    // source gate and the decontamination stage must actually drop here
    assert(docsT(1)._1 < docsT(0)._1, "source gate dropped nothing")
    assert(docsT(4)._1 < docsT(3)._1, "decontamination dropped nothing")
  }

  test("epoch plan: kept sources only, budget conserved, epochs = ceil(rate)") {
    val kept = Curation.sourceReputation(spark, sf).collect()
      .filter(_.getAs[Boolean]("keep")).map(_.getAs[String]("source")).toSet
    val plan = Curation.epochPlan(spark, sf, budgetTokens = 20000L).collect()
    assert(plan.map(_.getAs[String]("source")).toSet == kept)
    val targetSum = plan.map(_.getAs[Double]("target_tokens")).sum
    assert(math.abs(targetSum - 20000.0) < 1e-3)
    plan.foreach { r =>
      assert(r.getAs[Double]("sample_rate") > 0.0)
      // recompute the UNROUNDED rate (epochs derives from it, not from the
      // 6-dp display column)
      val trueRate = (20000.0 / plan.length) / r.getAs[Long]("avail_tokens")
      assert(r.getAs[Int]("epochs") == math.ceil(trueRate).toInt)
    }
    // the fixture budget is chosen to straddle 1.0 so both regimes appear
    assert(plan.exists(_.getAs[Double]("sample_rate") > 1.0)
      && plan.exists(_.getAs[Double]("sample_rate") < 1.0))
  }

  test("epoch plan: a zero-token source is excluded, never an ANSI crash") {
    import spark.implicits._
    // one degenerate source (zero available tokens): budget/0 = Infinity
    // and ceil(inf).cast(int) throws under ANSI mode — the guard must
    // exclude it from the plan AND from the n_sources budget split
    val per = Seq(
      ("web", 10L, 1000L),
      ("empty", 3L, 0L),
      ("books", 5L, 500L)).toDF("source", "n_docs", "avail_tokens")
    val plan = Curation.epochPlanFrom(per, budgetTokens = 600L).collect()
    assert(plan.map(_.getAs[String]("source")).toSet == Set("web", "books"))
    // budget split across the FUNDED sources only (600/2 = 300 each)
    plan.foreach { r =>
      assert(r.getAs[Double]("target_tokens") == 300.0)
      assert(r.getAs[Int]("epochs") ==
        math.ceil(300.0 / r.getAs[Long]("avail_tokens")).toInt)
    }
  }

  test("DSIR: en target scores higher, selection is the exact top fraction") {
    val w = graft.operators.Curation.dsirWeights(spark, sf)
      .join(Tables.documents(spark, sf).select("doc_id", "lang"), "doc_id")
      .cache()
    val n = w.count()
    // selection cardinality: exactly ceil(keepFrac * N), deterministic
    val kept = w.filter(col("selected")).count()
    assert(kept == math.ceil(0.2 * n).toLong, s"kept $kept of $n")
    // the method's point: documents from the target language model (en)
    // must average a higher importance weight than the rest of the corpus
    val means = w.groupBy(col("lang") === "en")
      .agg(avg("log_weight").as("m")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"en mean ${means(true)} must exceed non-en mean ${means(false)}")
    // and the selected set should be overwhelmingly target-like
    val keptEn = w.filter(col("selected") && col("lang") === "en").count()
    assert(keptEn.toDouble / kept > 0.9,
      s"top-20% should be dominated by target-like docs: $keptEn/$kept en")
  }

  test("semantic decontamination: train docs, eval neighbors, cosines exact, hits bounded") {
    val got = Curation.decontaminateSemantic(spark, sf).collect()
    assert(got.nonEmpty, "fixture corpus must produce semantic decon hits")
    val splits = Curation.splitAssign(spark, sf, 42).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    // reference cosines from a driver-side exact eval×train sweep (the
    // corpus is spec-sized): rounded like the kernel
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val den = math.sqrt(na) * math.sqrt(nb)
      graft.functions.PqKernels.round6(if (den == 0.0) 0.0 else d / den)
    }
    val evalIds = splits.collect { case (id, s) if s != "train" => id }.toSet
    got.foreach { r =>
      val (doc, ev, c, n) = (r.getAs[Long]("doc_id"), r.getAs[Long]("eval_id"),
        r.getAs[Double]("cosine"), r.getAs[Long]("n_eval_hits"))
      assert(splits(doc) == "train", s"flagged doc $doc is ${splits(doc)}")
      assert(evalIds.contains(ev), s"neighbor $ev is not an eval doc")
      assert(c >= 0.4, s"reported cosine $c under threshold")
      assert(c == cos(emb(doc), emb(ev)), s"cosine drift for ($doc, $ev)")
      // probed hits are a subset of the exact neighbor set
      val exactHits = evalIds.count(e => cos(emb(doc), emb(e)) >= 0.4)
      assert(n >= 1L && n <= exactHits.toLong,
        s"doc $doc reports $n hits, exact sweep has $exactHits")
    }
  }

  test("tfidf: k per lang, rank ordered, df consistent") {
    val t = Curation.tfidfTopTerms(spark, sf).collect()
    val byLang = t.groupBy(_.getString(0))
    byLang.foreach { case (_, rows) =>
      assert(rows.length <= 5)
      val ranked = rows.sortBy(_.getInt(1))
      assert(ranked.map(_.getInt(1)).toSeq == (1 to rows.length))
      val scores = ranked.map(_.getAs[Double]("tfidf"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("split drift: PSI terms non-negative, counts conserve splits, hash split stable") {
    val rows = operators.Curation.splitDrift(spark, sf).collect()
    assert(rows.length == 4)
    // PSI terms are (p−q)·ln(p/q) ≥ 0 by construction; NULL only for an
    // empty bucket
    val terms = rows.flatMap(r =>
      if (r.isNullAt(r.fieldIndex("psi_term"))) None
      else Some(r.getAs[Double]("psi_term")))
    assert(terms.forall(_ >= 0.0))
    // an unbiased hash split must read as stable (PSI well under the 0.25
    // "significant shift" convention at any shipped SF)
    assert(terms.sum < 0.25, s"PSI ${terms.sum} should be stable")
    // bucket counts conserve the split populations
    val split = operators.Curation.splitAssign(spark, sf)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getAs[Long]("n_train")).sum == split("train"))
    assert(rows.map(_.getAs[Long]("n_val")).sum == split("val"))
  }

  test("contamination straddle: minhash source ≡ exact source at the verify threshold") {
    // the r15 source switch (MinHash-LSH → df-capped exact n-gram Jaccard)
    // narrowed what "contamination caught" can see: a cross-split pair
    // sharing ONLY df>cap shingles is exact-invisible but LSH-findable.
    // This leg keeps that recall gap MEASURED: at the MinHash verify
    // threshold (0.7) the two straddle pair sets — same split join, same
    // exact jaccard over full shingle sets — must agree exactly on the
    // pinned fixtures, so a df-cap (or banding) miss shows up as a set
    // difference, not an assumption.
    val exact = Curation.splitContamination(spark, sf)
      .filter(col("jaccard") >= 0.7)
      .select("doc_a", "doc_b", "jaccard")
      .collect().map(_.toString).toSet
    val mh = Curation.splitContaminationMinhash(spark, sf)
      .select("doc_a", "doc_b", "jaccard")
      .collect().map(_.toString).toSet
    assert(mh == exact,
      s"straddle sources diverged: exact-only=${(exact -- mh).take(3)} " +
      s"minhash-only=${(mh -- exact).take(3)}")
  }
}
