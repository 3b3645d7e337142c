package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.serve.LensQueries
import graft.streaming.StreamLens

/** The live dashboard (§2.10 twin of r8's q_lens_dashboard): streamed
  * day-series plus the read-time finishing pass must be bit-equal to the
  * batch dashboard query — same drill-down filter, same (ts, event_id)
  * last-value order contract, same rendering/rounding. */
class StreamLensSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Stream input staged as a directory of part-files (the live-ingest
    * layout a file stream expects); identical rows to the batch table. */
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("stream_lens").toString + "/events"
    Tables.events(spark, sf).write.parquet(d)
    d
  }

  test("streamed dashboard equals the batch dashboard bit-for-bit") {
    val q = StreamLens.dashboardToMemory(spark, eventsDir, "purchase", "lens_dash")
    q.awaitTermination()
    val streamed = StreamLens.dashboardFinish(spark.table("lens_dash"))
      .collect().map(_.toString).sorted.toSeq
    val batch = LensQueries.lensDashboard(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty, "dashboard series must not be empty")
    assert(streamed == batch,
      s"streamed dashboard drifted from batch:\n${streamed.take(3)}\nvs\n${batch.take(3)}")
  }

  test("a fresh AvailableNow pass over the same data refreshes to the same series") {
    // complete-mode refresh semantics: re-draining the (unchanged) source
    // from a fresh query replaces the table with an identical series — the
    // dashboard's idempotent-refresh contract. Compared against the BATCH
    // dashboard (not the sibling test's memory table) so this test is
    // self-contained under isolated/reordered execution.
    val q = StreamLens.dashboardToMemory(spark, eventsDir, "purchase", "lens_dash2")
    q.awaitTermination()
    val refreshed = StreamLens.dashboardFinish(spark.table("lens_dash2"))
      .collect().map(_.toString).sorted.toSeq
    val batch = LensQueries.lensDashboard(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(refreshed.nonEmpty && refreshed == batch)
  }
}
