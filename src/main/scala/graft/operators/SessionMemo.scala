package graft.operators

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo for materialized artifacts (cluster tables, trained
  * index stats) whose lineage ends in checkpoint blocks — the CacheManager
  * cannot share those by plan identity, so without a memo every consumer
  * re-runs the iteration. Entries are evicted when the owning SparkContext
  * ends; a long-lived JVM cycling sessions therefore does not accumulate
  * stopped sessions' plans and cached blocks (a bare static
  * ConcurrentHashMap would pin them forever — DataFrames reference their
  * session, so weak keys don't work either).
  */
private[graft] final class SessionMemo[K, V] {
  SessionMemo.register(this)
  private val map = new ConcurrentHashMap[(SparkSession, K), V]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  def getOrElseUpdate(spark: SparkSession, key: K)(build: => V): V = {
    if (hooked.add(spark))
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          drop(spark)
          hooked.remove(spark)
        }
      })
    map.computeIfAbsent((spark, key), _ => build)
  }

  /** Forget this session's entries (the artifacts become unreferenced; the
    * ContextCleaner reclaims their checkpoint/cache blocks on GC). */
  private[graft] def drop(spark: SparkSession): Unit =
    map.keySet.removeIf(_._1 eq spark)
}

private[graft] object SessionMemo {
  private val all = new java.util.concurrent.ConcurrentLinkedQueue[SessionMemo[_, _]]()
  private def register(m: SessionMemo[_, _]): Unit = all.add(m)

  /** Drop one session's entries from EVERY memo in the process. */
  private[graft] def dropSession(spark: SparkSession): Unit =
    all.forEach(_.drop(spark))
}
