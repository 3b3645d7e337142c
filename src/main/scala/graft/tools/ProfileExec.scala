package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Where does the first-execution premium go? For each named query, run 3
  * fresh-plan executions on a warm session and report per-exec: wall, #jobs,
  * #stages, #tasks, summed task time, summed GC time, summed result
  * serialization + scheduler delay — separating "more work ran" from "the
  * same work ran slower" from "driver-side gaps the tasks never saw". */
object ProfileExec {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq else Seq("q_embed_text_pq")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskMs = new AtomicLong
    val gcMs = new AtomicLong; val deserMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
          deserMs.addAndGet(m.executorDeserializeTime + m.resultSerializationTime)
        }
        ()
      }
    })
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, dir).queryExecution.toRdd.count() // session warm
      (1 to 3).foreach { i =>
        jobs.set(0); stages.set(0); tasks.set(0)
        taskMs.set(0); gcMs.set(0); deserMs.set(0)
        val df = fn(spark, dir)
        df.queryExecution.executedPlan // plan outside the timed window
        val cg = org.apache.spark.metrics.source.CodegenMetrics
        val cgT0 = cg.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
        val cgN0 = cg.METRIC_COMPILATION_TIME.getCount
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // listener drain
        val cgMs = cg.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum - cgT0
        val cgN = cg.METRIC_COMPILATION_TIME.getCount - cgN0
        println(f"[exec] $n%-26s run$i wall=$wall%6.3f jobs=${jobs.get}%3d " +
          f"stages=${stages.get}%3d tasks=${tasks.get}%4d taskSec=${taskMs.get / 1e3}%7.2f " +
          f"gcSec=${gcMs.get / 1e3}%6.2f deserSec=${deserMs.get / 1e3}%6.2f " +
          f"cgN=$cgN%3d cgSec=${cgMs / 1e3}%6.2f")
      }
    }
    spark.stop()
  }
}
