package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamPairs
import graft.streaming.StreamPairs.{PEv, PairState}

/** The streamed next-event pair builder equals the batch query, and the
  * emission-on-close contract survives within-watermark reordering. */
class StreamPairsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ev(uid: Long, id: Long, ts: String, t: String): PEv =
    PEv(uid, id, java.sql.Timestamp.valueOf(ts), t)

  test("streamed pairs equal batch pairs on a replayed slice") {
    // replay every event of a handful of users in event-time order through
    // the state function; a far-future sentinel closes each user's last
    // session (it opens a fresh single-event session, which pairs nothing)
    val users = Seq(0L, 1L, 2L, 3L, 4L)
    val evs = Tables.events(spark, sf)
      .filter(col("user_id").isin(users: _*))
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => PEv(r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
      .groupBy(_.user_id)
    val streamed = users.flatMap { u =>
      val sorted = evs.getOrElse(u, Array.empty[PEv])
        .sortBy(e => (e.ts.getTime, e.event_id))
      if (sorted.isEmpty) Nil
      else {
        val sentinel = PEv(u, Long.MaxValue,
          new java.sql.Timestamp(sorted.last.ts.getTime + 36000000L), "zz")
        val state = new TestGroupState(Option.empty[PairState])
        StreamPairs.pairsFn(u, (sorted :+ sentinel).iterator, state).toList
      }
    }
    val batch = graft.operators.Sessionize.trainingPairs(spark, sf)
      .filter(col("user_id").isin(users: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    // align orderings: batch sessions by session_idx, streamed by start ms —
    // both are event-time order, so the (input, target) sequences must match
    val b = batch.sortBy(x => (x._1, x._2, x._3)).map(x => (x._1, x._4, x._5)).toSeq
    val s = streamed.sortBy(p => (p.user_id, p.session_start_ms, p.step))
      .map(p => (p.user_id, p.input_event, p.target_event))
    assert(b.nonEmpty && s == b)
  }

  test("late within-watermark event re-enters the adjacency before close") {
    val state = new TestGroupState(Option.empty[PairState])
    // batch 1: A at 10:00, C at 10:10 — no pairs yet (session open)
    val out1 = StreamPairs.pairsFn(1L, Iterator(
      ev(1L, 1, "2024-01-01 10:00:00", "A"),
      ev(1L, 3, "2024-01-01 10:10:00", "C")), state).toList
    assert(out1.isEmpty)
    // batch 2: LATE B at 10:05 (within watermark) lands between A and C
    val out2 = StreamPairs.pairsFn(1L, Iterator(
      ev(1L, 2, "2024-01-01 10:05:00", "B")), state).toList
    assert(out2.isEmpty)
    // batch 3: a gap event closes the session — pairs are A→B→C, not A→C
    val out3 = StreamPairs.pairsFn(1L, Iterator(
      ev(1L, 4, "2024-01-01 13:00:00", "D")), state).toList
    assert(out3.map(p => (p.step, p.input_event, p.target_event)) ==
      List((1L, "A", "B"), (2L, "B", "C")))
    // the open session now holds only D
    assert(state.getOption.get.evs.map(_._3) == List("D"))
  }

  test("pre-watermark events are dropped; timeout clamps above watermark") {
    val state = new TestGroupState(Option.empty[PairState])
    state.watermarkMs = java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime
    val out = StreamPairs.pairsFn(1L, Iterator(
      ev(1L, 1, "2024-01-01 11:00:00", "A"), // behind watermark: dropped
      ev(1L, 2, "2024-01-01 12:30:00", "B")), state).toList
    assert(out.isEmpty)
    assert(state.getOption.get.evs.map(_._3) == List("B"))
    assert(state.lastTimeout.exists(_ > state.watermarkMs))
  }
}
