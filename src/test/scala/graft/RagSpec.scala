package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Rag

class RagSpec extends AnyFunSuite {
  import SparkTestSession._

  test("rag retrieve: contiguous ranks, monotone scores, never the query's own doc") {
    val rows = Rag.ragRetrieve(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("q_doc"))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length),
        s"q$q ranks not contiguous")
      val cosines = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cosines == cosines.sorted.reverse, s"q$q scores not monotone")
      rs.foreach(r => assert(r.getAs[Long]("src_doc") != q,
        s"q$q retrieved its own passage"))
    }
  }

  test("mmr: rank-1 is the relevance winner; later picks trade relevance for diversity") {
    val mmr = Rag.mmrRetrieve(spark, sf).collect()
    val ret = Rag.ragRetrieve(spark, sf, k = 1).collect()
      .map(r => r.getAs[Long]("q_doc") ->
        (r.getAs[Long]("src_doc"), r.getAs[Int]("chunk_pos"))).toMap
    assert(mmr.nonEmpty)
    val byQ = mmr.groupBy(_.getAs[Long]("q_doc"))
    assert(byQ.keySet == ret.keySet)
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length))
      // rank 1 ≡ the plain retrieval's top passage (MMR starts greedy)
      val r1 = sorted.head
      assert((r1.getAs[Long]("src_doc"), r1.getAs[Int]("chunk_pos")) == ret(q))
      // mmr score of every later pick can't exceed λ·its relevance
      sorted.tail.foreach { r =>
        assert(r.getAs[Double]("mmr") <=
          Rag.Lambda * r.getAs[Double]("rel") + 1e-9)
      }
      // the selected set is duplicate-free
      val ids = rs.map(r => (r.getAs[Long]("src_doc"), r.getAs[Int]("chunk_pos")))
      assert(ids.distinct.length == ids.length)
    }
  }

  test("pool exposure audit: gap is exactly min_sel − ceiling; every query reported") {
    val rows = Rag.mmrPoolExposure(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (minSel, ceil, gap) = (r.getDouble(1), r.getDouble(3), r.getDouble(4))
      assert(math.abs(gap - (minSel - ceil)) < 2e-6, r.toString)
      // ceiling must dominate every selected-but-not-first score's rel share
      assert(ceil > 0.0)
    }
  }

  test("rag plan: broadcast queries + bounded-heap top-k, no per-query window sort") {
    val plan = Rag.ragRetrieve(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "queries must broadcast against the chunk vectors")
    assert(!plan.contains("WindowExec") && !plan.contains("window"),
      s"per-query window sort crept into the scoring path:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      "top-k must run through the map-side-combinable heap aggregator")
  }
}
