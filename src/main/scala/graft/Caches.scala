package graft

import org.apache.spark.sql.SparkSession

/** Release the engine's session-lifetime working state.
  *
  * The query library deliberately `cache()`s shared intermediates (the
  * dedup pipeline's shingles/signatures/pair set) and memoizes
  * checkpoint-rooted artifacts (cluster labels, trained IVF stats, the
  * forecast table, the DAG runner's stage counts) for the life of a
  * session — correct for Verify/Bench runs, but a LONG-LIVED server
  * session cycling many corpora would accumulate them. This is the
  * explicit release hook: evict every CacheManager entry and drop the
  * session from every [[graft.operators.SessionMemo]] (their checkpoint
  * and cache blocks become unreferenced and the ContextCleaner reclaims
  * them). The next query simply rebuilds what it needs.
  */
object Caches {

  def clear(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    graft.operators.SessionMemo.dropSession(spark)
  }
}
