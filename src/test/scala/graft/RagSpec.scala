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
