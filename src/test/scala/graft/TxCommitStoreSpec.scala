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
    * then a byte copy — never rename. Records every dest it published. */
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
        val out = fs.create(dest, false)
        try out.write(bytes) finally out.close()
        fs.delete(tmp, false)
        published.add(key)
        true
      }
    }
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
}
