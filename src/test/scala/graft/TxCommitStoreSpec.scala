package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.serve.{CommitStore, TxTable}

/** The CommitStore seam driven END TO END on an object-store-shaped
  * primitive (r16 verdict task 6: before this spec only the lost-race leg
  * injected through the seam).
  *
  * [[MemoryConditionalPutStore]] is what an S3/GCS/ADLS deployment would
  * register: a CONDITIONAL PUT — an atomic reservation (the in-memory
  * map's putIfAbsent stands in for `If-None-Match: *` /
  * `ifGenerationMatch=0`) followed by a plain object write — with NO
  * rename and NO hard link anywhere. The spec runs the full table
  * lifecycle through it (write → merges → time travel → change feed →
  * vacuum-with-checkpoints → post-vacuum merge) and then proves the seam
  * was not bypassed: every commit file and every checkpoint the log
  * contains was published by THIS store.
  */
class TxCommitStoreSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Object-store conditional put: reservation via map putIfAbsent (the
    * store's consistency domain, like an object store's metadata service),
    * then an ALL-OR-NOTHING publish. Records every dest it published.
    *
    * Atomic visibility matters: a real conditional PUT makes the object
    * appear complete or not at all — a losing racer can only ever observe
    * fully-committed winners, and a failed PUT leaves no partial object.
    * A plain create→write→close on a filesystem is visible mid-write (the
    * swarm leg below caught a rebasing loser reading a half-written
    * commit of the winner it had just lost to), so the stand-in stages
    * next to dest and atomically moves into place — emulating the PUT
    * semantics the real store provides natively. The PROTOCOL still never
    * renames: TxTable sees only this seam's putIfAbsent, and the
    * completeness assertions below prove no TxTable-side rename path ran. */
  private class MemoryConditionalPutStore extends CommitStore {
    val published = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    private val reserved =
      new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
    override def putIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
        tmp: org.apache.hadoop.fs.Path,
        dest: org.apache.hadoop.fs.Path): Boolean = {
      val key = fs.makeQualified(dest).toString
      if (reserved.putIfAbsent(key, true) != null) false
      else {
        val in = fs.open(tmp)
        val bytes = try {
          val bos = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
          bos.toByteArray
        } finally in.close()
        // staged name ends with neither .txt nor .checkpoint, so log
        // listings never see it pre-publish
        val staged = new org.apache.hadoop.fs.Path(dest.getParent,
          s".${dest.getName}.staging-${java.util.UUID.randomUUID()}")
        val out = fs.create(staged, false)
        try out.write(bytes) finally out.close()
        require(fs.rename(staged, dest), s"atomic publish failed for $dest")
        fs.delete(tmp, false)
        published.add(key)
        true
      }
    }
  }

  /** Caller-level retry of the bounded commit loop ("lost N version
    * races" is a liveness signal to back off and retry, not corruption). */
  private def retryRaces(op: => Long, max: Int = 20): Long = {
    var n = 0
    while (true) {
      try return op
      catch {
        case e: java.io.IOException if e.getMessage != null &&
            e.getMessage.contains("version races") && n < max =>
          n += 1
      }
    }
    -1L // unreachable
  }

  private def fresh(name: String): String = {
    val p = s"/tmp/graft_tx_commitstore/$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(p), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  test("full merge/vacuum/time-travel cycle on a conditional-put store, rename never used") {
    val path = fresh("cycle")
    val store = new MemoryConditionalPutStore
    TxTable.registerCommitStore("file", store)
    try {
      // v0: full write; v1, v2: keyed merges
      TxTable.write(spark,
        spark.range(100).select(col("id"), lit("base").as("txt"))
          .repartition(1), path)
      TxTable.merge(spark, Seq((5L, "v1")).toDF("id", "txt"), path, Seq("id"))
      val v2 = TxTable.merge(spark, Seq((6L, "v2"), (100L, "new")).toDF("id", "txt"),
        path, Seq("id"))
      assert(v2 == 2L)

      // time travel: each snapshot exact
      def txtOf(v: Long, id: Long): String =
        TxTable.read(spark, path, Some(v)).filter(col("id") === id)
          .select("txt").head().getString(0)
      assert(txtOf(0L, 5L) == "base" && txtOf(1L, 5L) == "v1")
      assert(txtOf(2L, 6L) == "v2")
      assert(TxTable.read(spark, path, Some(2L)).count() == 101)

      // change feed across the merges
      val feed = TxTable.changes(spark, path, 1L, 2L, Seq("id"))
      assert(feed.filter(col("change_type") === "insert")
        .filter(col("id") === 100L).count() == 1)

      // vacuum: checkpoints for retained versions publish through the
      // seam too; the dropped version fails loudly afterwards
      TxTable.vacuum(spark, path, keepVersions = 2, retentionMs = 0L)
      val gone = intercept[java.io.FileNotFoundException] {
        TxTable.read(spark, path, Some(0L)).count()
      }
      assert(gone.getMessage.contains("no version 0"), gone.getMessage)
      assert(TxTable.read(spark, path).count() == 101)

      // the table stays writable on the same store after vacuum
      val v3 = TxTable.merge(spark, Seq((7L, "v3")).toDF("id", "txt"), path, Seq("id"))
      assert(v3 == 3L && txtOf(3L, 7L) == "v3")

      // seam completeness: every commit file AND checkpoint in the log was
      // published by this store — no rename/link path was ever taken
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
      val logFiles = fs.listStatus(new org.apache.hadoop.fs.Path(path, "_txlog"))
        .map(st => fs.makeQualified(st.getPath).toString).toSet
      assert(logFiles.nonEmpty && logFiles.subsetOf(
        scala.jdk.CollectionConverters.SetHasAsScala(store.published).asScala.toSet),
        s"log entries not published through the seam: ${logFiles --
          scala.jdk.CollectionConverters.SetHasAsScala(store.published).asScala}")
      assert(logFiles.exists(_.endsWith(".checkpoint")),
        "vacuum's checkpoint materialization must ride the seam too")
    } finally TxTable.unregisterCommitStore("file")
  }

  test("two writers racing one version on the conditional-put store: one rebases, no lost update") {
    val path = fresh("race")
    val store = new MemoryConditionalPutStore
    TxTable.registerCommitStore("file", store)
    try {
      TxTable.write(spark,
        spark.range(50).select(col("id"), lit("base").as("txt"))
          .repartition(1), path)
      // interleave: rival commits v1 from INSIDE this writer's publish
      // attempt (the injected-interleave shape TxStatsSpec pins on the
      // rename store, now proven on the conditional-put store)
      var fired = false
      val racing = new CommitStore {
        override def putIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
            tmp: org.apache.hadoop.fs.Path,
            dest: org.apache.hadoop.fs.Path): Boolean = {
          if (!fired && dest.getName.endsWith(".txt")) {
            fired = true
            TxTable.merge(spark, Seq((1L, "rival")).toDF("id", "txt"), path, Seq("id"))
            fs.delete(tmp, false)
            false
          } else store.putIfAbsent(fs, tmp, dest)
        }
      }
      TxTable.registerCommitStore("file", racing)
      val v = TxTable.merge(spark, Seq((2L, "mine")).toDF("id", "txt"), path, Seq("id"))
      assert(fired && v == 2L, s"beaten writer must rebase to v2, got $v")
      val out = TxTable.read(spark, path)
      assert(out.filter(col("txt") === "rival").count() == 1)
      assert(out.filter(col("txt") === "mine").count() == 1)
    } finally TxTable.unregisterCommitStore("file")
  }

  test("N concurrent committers through the conditional-put store: one winner per version, no lost updates") {
    // r17 verdict task: the lifecycle leg is single-threaded and the race
    // leg injects ONE interleave; this drives GENUINELY concurrent
    // committers — 4 threads × 13 keyed merges = 52 commits racing the
    // same table — and asserts the two properties the commit protocol
    // exists for: (a) the committed version numbers are exactly 1..52
    // with no duplicate and no hole (every putIfAbsent race had exactly
    // one winner and every loser rebased onto the winner's snapshot);
    // (b) every thread's every row survives with its final value (a
    // rebase that replayed against a stale snapshot would drop a rival's
    // already-committed merge — the lost update).
    val path = fresh("swarm")
    val store = new MemoryConditionalPutStore
    TxTable.registerCommitStore("file", store)
    try {
      TxTable.write(spark,
        spark.range(20).select(col("id"), lit("base").as("txt"))
          .repartition(1), path)
      val nThreads = 4; val perThread = 13
      val versions = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until nThreads).map { t =>
        new Thread(() => {
          try {
            var i = 0
            while (i < perThread) {
              // disjoint keys: merges commute, so every row must survive
              // any serialization order — absence IS a lost update
              val key = 1000L + t * 100 + i
              // liveness lives at the CALLER under contention: merge gives
              // up after MaxCommitRetries consecutive lost races (3 rivals
              // can starve a slow writer past 5), and the application
              // retries — idempotent by keyed-merge semantics
              val v = retryRaces(TxTable.merge(spark,
                Seq((key, s"w$t-$i")).toDF("id", "txt"), path, Seq("id")))
              assert(versions.add(v), s"version $v committed twice")
              i += 1
            }
          } catch { case e: Throwable => failures.add(e) }
        }, s"committer-$t")
      }
      threads.foreach(_.start()); threads.foreach(_.join(300000))
      assert(failures.isEmpty, s"committer failed: ${failures.peek()}")
      val vs = scala.jdk.CollectionConverters.SetHasAsScala(versions).asScala
      assert(vs == (1L to (nThreads * perThread)).toSet,
        s"versions not contiguous one-winner-per-slot: ${vs.toSeq.sorted}")
      val out = TxTable.read(spark, path).filter(col("id") >= 1000L)
        .select("id", "txt").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val expected = (for (t <- 0 until nThreads; i <- 0 until perThread)
        yield (1000L + t * 100 + i) -> s"w$t-$i").toMap
      assert(out == expected,
        s"lost updates: missing=${expected.keySet -- out.keySet} " +
          s"wrong=${out.filter { case (k, v) => expected.get(k).exists(_ != v) }}")
      // and the swarm's every commit file rode the seam
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
      val logFiles = fs.listStatus(new org.apache.hadoop.fs.Path(path, "_txlog"))
        .map(st => fs.makeQualified(st.getPath).toString).toSet
      assert(logFiles.subsetOf(
        scala.jdk.CollectionConverters.SetHasAsScala(store.published).asScala.toSet))
    } finally TxTable.unregisterCommitStore("file")
  }
}
