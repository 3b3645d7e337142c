package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Classifier

/** Learned quality gate: distributed logistic GD — convergence by the
  * descent lemma, real progress, and teacher agreement. */
class ClassifierSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val stats = Classifier.qualityTrain(spark, sf)
    .collect().sortBy(_.getInt(0))

  test("loss is monotonically non-increasing and actually decreases") {
    assert(stats.map(_.getInt(0)).toSeq == (0 to Classifier.DefaultIters))
    val losses = stats.map(_.getAs[Double]("loss"))
    losses.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-6, s"descent lemma violated: ${losses.toSeq}")
    }
    assert(losses.last < losses.head - 0.02,
      s"training made no real progress: ${losses.head} -> ${losses.last}")
    // iteration 0 is the zero-weight start: loss = ln 2 exactly
    assert(math.abs(losses.head - math.log(2.0)) < 1e-4)
    // the registered invariant query agrees
    val inv = graft.operators.Invariants.qualityTrainMonotone(spark, sf).collect()
    assert(inv.forall(_.getBoolean(1)))
  }

  test("the learned gate beats the zero-weight baseline and agrees with its teacher") {
    val acc = stats.last.getAs[Double]("accuracy")
    // majority-class baseline: accuracy of always predicting the more
    // common teacher label
    val gate = Classifier.qualityGate(spark, sf).collect()
    val n = gate.length.toDouble
    val pos = gate.count(_.getAs[Boolean]("teacher_keep")) / n
    // τ must actually split the corpus — a one-class teacher degenerates
    // the task to a constant and accuracy stops measuring anything
    assert(pos > 0.1 && pos < 0.9, s"teacher labels degenerate: pos=$pos")
    val majority = math.max(pos, 1 - pos)
    // the content features must EARN something over always-majority —
    // this is the claim that separates learning from memorizing a prior
    assert(acc >= majority + 0.03,
      s"learned gate adds nothing over the majority baseline: $acc vs $majority")
    assert(acc >= 0.62, s"teacher agreement collapsed: $acc")
    // the gate's keep decisions are exactly the 0.5 score threshold, and
    // its agreement matches the training accuracy of the final weights
    gate.foreach { r =>
      assert(r.getAs[Boolean]("keep") == (r.getAs[Double]("score") >= 0.5))
    }
    val agree = gate.count(r =>
      r.getAs[Boolean]("keep") == r.getAs[Boolean]("teacher_keep")) / n
    assert(math.abs(agree - acc) < 1e-3,
      s"gate agreement $agree drifted from training accuracy $acc")
  }

  test("sampled-teacher training: corpus-wide quality parity with the full-batch gate") {
    // the 100 TB production split: train on the stratified quarter
    // (exactly-allocated per language by the oracled two-phase sampler,
    // 60 passes = the full-batch trainer's exact row-touch budget), score
    // everything. The contract is QUALITY parity, not doc-by-doc
    // identity: both gates are weak classifiers whose scores sit near
    // 0.5, so near-boundary decisions legitimately flip under sampling
    // noise (measured doc-agreement ~0.73 at n/d ≈ 2 — the 500-doc
    // fixture trains 127 docs against 65 parameters, the worst possible
    // regime for the claim). What must hold: (a) same corpus coverage,
    // (b) teacher-accuracy within 0.10 of the full-batch gate (measured
    // gap: +0.012 at sf0.001, −0.068 at sf0.01), (c) a real margin over
    // the majority baseline, (d) the same descent-lemma invariant.
    val full = Classifier.qualityGate(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[Boolean]("teacher_keep"))).toMap
    val fullAcc = full.values.count(v => v._1 == v._2).toDouble / full.size
    val sampled = Classifier.qualityGateSampled(spark, sf).collect()
    assert(sampled.length == full.size, "sampled gate must score the whole corpus")
    val n = sampled.length.toDouble
    val teacherAgree = sampled.count(r =>
      r.getAs[Boolean]("keep") == r.getAs[Boolean]("teacher_keep")) / n
    assert(teacherAgree >= fullAcc - 0.10,
      s"sampled gate quality collapsed: $teacherAgree vs full-batch $fullAcc")
    val pos = sampled.count(_.getAs[Boolean]("teacher_keep")) / n
    val majority = math.max(pos, 1 - pos)
    assert(teacherAgree >= majority + 0.05,
      s"sampled gate adds nothing over majority: $teacherAgree vs $majority")
    // doc-level agreement floor — loose by design (boundary mass)
    val agree = sampled.count(r =>
      full(r.getAs[Long]("doc_id"))._1 == r.getAs[Boolean]("keep")) / n
    assert(agree >= 0.65,
      s"sampled-trained gate diverged wholesale from the full-batch gate: $agree")
    // and its training stats carry the same descent-lemma invariant
    val losses = Classifier.qualityTrainSampledFull(spark, sf)._1
      .collect().sortBy(_.getInt(0)).map(_.getAs[Double]("loss"))
    losses.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-6, s"sampled descent violated: ${losses.toSeq}")
    }
  }

  test("driver-local fit equals the distributed GD path on the same data") {
    // below LocalFitRows the loop collects once and iterates locally
    // (iters sequential driver-synchronized jobs become one); the two
    // paths share the same formulas and may differ only in float
    // summation order — weights must agree to ~1e-9 and every stats row
    // to the 6-dp rounding the frame carries
    val frame = Classifier.trainingFrame(spark, sf, Classifier.DefaultTau)
    val local = Classifier.gdLoop(spark, frame, Classifier.DefaultIters,
      Classifier.DefaultEta)
    Classifier.forceDistributed = true
    val dist =
      try Classifier.gdLoop(spark, frame, Classifier.DefaultIters,
        Classifier.DefaultEta)
      finally Classifier.forceDistributed = false
    val wl = local._2; val wd = dist._2
    assert(wl.length == wd.length)
    wl.zip(wd).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"weights diverged: $a vs $b") }
    val sl = local._1.collect().sortBy(_.getInt(0)).map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    val sd = dist._1.collect().sortBy(_.getInt(0)).map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(sl.length == sd.length)
    sl.zip(sd).foreach { case ((i1, l1, a1), (i2, l2, a2)) =>
      assert(i1 == i2 && math.abs(l1 - l2) <= 1e-6 + 1e-12 && a1 == a2,
        s"stats diverged at iter $i1: ($l1, $a1) vs ($l2, $a2)")
    }
  }

  test("every embedded doc is scored; scores are probabilities") {
    val gate = Classifier.qualityGate(spark, sf)
    val nEmb = graft.operators.TextEmbed.embeddings(spark, sf).count()
    assert(gate.count() == nEmb, "one verdict per embedded document")
    assert(gate.filter(col("score") < 0.0 || col("score") > 1.0).count() == 0)
  }
}
