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

  test("every embedded doc is scored; scores are probabilities") {
    val gate = Classifier.qualityGate(spark, sf)
    val nEmb = graft.operators.TextEmbed.embeddings(spark, sf).count()
    assert(gate.count() == nEmb, "one verdict per embedded document")
    assert(gate.filter(col("score") < 0.0 || col("score") > 1.0).count() == 0)
  }
}
