package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeTrain

/** BPE vocabulary training: deterministic merges on the word-frequency
  * table, anchored by the independently-oracled first-merge decision. */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val merges = BpeTrain.train(spark, sf, merges = 10).collect()

  test("train produces the requested ranked merges with sane shapes") {
    assert(merges.length == 10)
    assert(merges.map(_.getInt(0)).toSeq == (1 to 10))
    merges.foreach { m =>
      val (l, r, merged, cnt) =
        (m.getString(1), m.getString(2), m.getString(3), m.getLong(4))
      assert(merged == l + r, s"merged symbol must concatenate the pair: $m")
      assert(cnt > 0)
    }
    // merge decisions are distinct pairs (re-merging an already-merged
    // pair is impossible — its occurrences were rewritten)
    val pairs = merges.map(m => (m.getString(1), m.getString(2)))
    assert(pairs.distinct.length == pairs.length)
  }

  test("the first trained merge equals the oracled standalone decision") {
    val first = BpeTrain.firstMerge(spark, sf).collect().head
    assert(merges.head.getString(1) == first.getString(0) &&
           merges.head.getString(2) == first.getString(1) &&
           merges.head.getLong(4) == first.getLong(2),
      s"train row 1 ${merges.head} vs firstMerge $first")
  }

  test("training is deterministic across runs") {
    val again = BpeTrain.train(spark, sf, merges = 10).collect()
    assert(merges.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("merge counts reflect the rewritten corpus (non-increasing within a pair family)") {
    // a later merge can never claim a higher count than rank 1's: rank 1
    // was the global argmax on the ORIGINAL table and rewriting can only
    // split/consume pair occurrences, never create more of the same pair
    // than existed for the first decision
    assert(merges.map(_.getLong(4)).max == merges.head.getLong(4))
  }
}
