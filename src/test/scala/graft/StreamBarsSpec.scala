package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.serve.FinanceQueries
import graft.streaming.StreamBars

/** Streaming OHLC maintenance (§2.10 twin of q_ohlc_bars): the
  * incrementally folded bars must be bit-equal to the batch aggregate —
  * same (ts, event_id) open/close order contract, same rounding and
  * rendering. */
class StreamBarsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("stream_bars").toString + "/events"
    Tables.events(spark, sf).write.parquet(d)
    d
  }

  test("streamed bars equal the batch bars bit-for-bit") {
    val q = StreamBars.barsToMemory(spark, eventsDir, "bars_live")
    q.awaitTermination()
    val streamed = StreamBars.barsFinish(spark.table("bars_live"))
      .collect().map(_.toString).sorted.toSeq
    val batch = FinanceQueries.ohlcBars(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"streamed bars drifted from batch:\n${streamed.take(3)}\nvs\n${batch.take(3)}")
  }

  test("append mode emits exactly the watermark-closed bars, each final") {
    val q = StreamBars.barsAppend(spark, eventsDir, "bars_append")
    q.awaitTermination()
    val emitted = StreamBars.barsFinish(spark.table("bars_append"))
      .collect().map(_.toString).sorted.toSeq
    // the closed prefix: window end <= final watermark = max(ts) - 1 day
    val maxTs = Tables.events(spark, sf)
      .agg(org.apache.spark.sql.functions.max("ts")).collect()(0)
      .getTimestamp(0).toInstant
    val wm = maxTs.minus(java.time.Duration.ofDays(1))
    val closed = FinanceQueries.ohlcBars(spark, sf).collect().filter { r =>
      val dayEnd = java.time.LocalDate.parse(r.getString(1)).plusDays(1)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant
      !dayEnd.isAfter(wm)
    }.map(_.toString).sorted.toSeq
    assert(emitted.nonEmpty, "append twin emitted nothing")
    assert(emitted == closed,
      s"append twin drifted from the closed batch prefix: " +
        s"${emitted.size} emitted vs ${closed.size} closed")
  }

  test("refresh idempotence: a fresh drain of the same source rebuilds the same bars") {
    val q = StreamBars.barsToMemory(spark, eventsDir, "bars_live2")
    q.awaitTermination()
    val refreshed = StreamBars.barsFinish(spark.table("bars_live2"))
      .collect().map(_.toString).sorted.toSeq
    val batch = FinanceQueries.ohlcBars(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(refreshed.nonEmpty && refreshed == batch)
  }
}
