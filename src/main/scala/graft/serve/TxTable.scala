package graft.serve

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A minimal transactional table format on plain parquet — the contract a
  * Delta/Iceberg table provides for the serving layer (the reference names
  * Delta as its own north star, `docs/medium_article.md:233`), built from
  * Spark + Hadoop FS primitives only (this environment ships no table-format
  * jars and the dependency set is frozen).
  *
  * Layout:
  * {{{
  *   table/
  *     _txlog/00000000.txt   // commit v0: line 1 = op, rest = data files
  *     _txlog/00000001.txt   // commit v1 ...
  *     data/<uuid>-part-*.parquet   // immutable, never rewritten
  * }}}
  *
  * The COMMIT POINT is the atomic rename of a staged manifest to
  * `_txlog/<version>.txt`. Hadoop `rename` refuses an existing destination,
  * so two writers racing for the same version produce exactly one winner —
  * the loser re-reads the new snapshot and retries its merge on top
  * (optimistic concurrency, the Delta protocol's conflict rule). Readers
  * resolve a snapshot by manifest, so they never observe a half-written
  * table and can time-travel to any retained version. Data files are
  * immutable; losers' orphans are reclaimed by [[vacuum]].
  *
  * On a rename-less object store (S3) the commit rename needs a
  * put-if-absent or a coordination service — same caveat as Delta's
  * multi-cluster S3 writes.
  */
object TxTable {

  val MaxCommitRetries = 5

  private def hfs(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  private def logDir(path: String) = new Path(path, "_txlog")
  private def commitFile(path: String, v: Long) =
    new Path(logDir(path), f"$v%08d.txt")

  /** Highest committed version, or None for a table that does not exist. */
  def latestVersion(spark: SparkSession, path: String): Option[Long] = {
    val fs = hfs(spark, path)
    if (!fs.exists(logDir(path))) None
    else {
      val vs = fs.listStatus(logDir(path)).toSeq
        .map(_.getPath.getName).filter(_.endsWith(".txt"))
        .map(_.stripSuffix(".txt").toLong)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  private def readManifest(fs: FileSystem, path: String, v: Long): (String, Seq[String]) = {
    val in = fs.open(commitFile(path, v))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    (lines.head, lines.tail)
  }

  /** Snapshot read at the latest (default) or an explicit version —
    * time travel is just "resolve an older manifest". */
  def read(spark: SparkSession, path: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, path)).getOrElse(
      throw new java.io.FileNotFoundException(s"TxTable at $path has no commits"))
    val fs = hfs(spark, path)
    if (!fs.exists(commitFile(path, v)))
      throw new java.io.FileNotFoundException(s"TxTable $path has no version $v")
    val (_, files) = readManifest(fs, path, v)
    if (files.isEmpty) spark.read.parquet(path + "/data") // never: guard only
    else spark.read.parquet(files.map(f => s"$path/$f"): _*)
  }

  /** Stage `df` as immutable files under data/ and return their
    * table-relative names (no commit yet). */
  private def stageData(spark: SparkSession, df: DataFrame, path: String): Seq[String] = {
    val fs = hfs(spark, path)
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(path, s"_staging_$uuid")
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    fs.mkdirs(new Path(path, "data"))
    val parts = fs.listStatus(staging).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val named = parts.zipWithIndex.map { case (p, i) =>
      val rel = f"data/$uuid-part-$i%05d.parquet"
      if (!fs.rename(p, new Path(path, rel)))
        throw new java.io.IOException(s"TxTable: staging rename $p -> $rel failed")
      rel
    }
    fs.delete(staging, true)
    named
  }

  /** Atomically publish `files` as version `v`. False ⇒ someone else won
    * the version race (caller must re-read and retry). */
  private def tryCommit(fs: FileSystem, path: String, v: Long, op: String,
      files: Seq[String]): Boolean = {
    fs.mkdirs(logDir(path))
    val tmp = new Path(logDir(path), s"_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, false)
    try out.write((op +: files).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val won = publish(fs, tmp, commitFile(path, v))
    if (!won) fs.delete(tmp, false)
    won
  }

  /** The fail-if-exists atomic publish, per filesystem. On HDFS, `rename`
    * is atomic AND refuses an existing destination — exactly the primitive
    * needed. On a LOCAL filesystem Hadoop's rename bottoms out in POSIX
    * rename(2), which silently REPLACES an existing destination — an
    * exists()+rename pair would let two racing writers both "win" a
    * version and lose one commit; `link(2)` (hard link) fails with EEXIST
    * atomically, so local publishes link-then-unlink instead. Object
    * stores need put-if-absent (the documented Delta-on-S3 caveat). */
  private def publish(fs: FileSystem, tmp: Path, dest: Path): Boolean = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(fs.makeQualified(dest).toUri.getPath),
          java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath))
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      if (fs.exists(dest)) false
      else fs.rename(tmp, dest)
    }
  }

  /** Full snapshot write (op=write): stage, then commit as the next
    * version. The previous snapshot stays readable (no file is touched). */
  def write(spark: SparkSession, df: DataFrame, path: String): Long = {
    val fs = hfs(spark, path)
    val files = stageData(spark, df, path)
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      val v = latestVersion(spark, path).map(_ + 1).getOrElse(0L)
      if (tryCommit(fs, path, v, "write", files)) return v
      attempt += 1
    }
    throw new java.io.IOException(s"TxTable: lost $MaxCommitRetries version races at $path")
  }

  /** MERGE INTO by key: rows of `updates` replace same-key rows, everything
    * else is retained — `Sink.upsertByKey` semantics as a table-format
    * commit. FILE-PRUNED, the property that makes MERGE affordable at
    * 100 TB: a broadcast semi-join of the update keys against the base
    * snapshot (tagged with `input_file_name`) finds the data files that
    * contain a matched key; only THOSE files are rewritten (non-matching
    * rows preserved, updates unioned in) — every untouched file is carried
    * into the new manifest verbatim, so merge cost scales with the touched
    * fraction, not the table (Delta's matched-file rewrite, minus
    * stats-based pruning). The read-merge-stage phase runs OUTSIDE the
    * commit point; on a version conflict the merge is recomputed against
    * the new snapshot (optimistic concurrency — no lock, no lost update).
    * With a versionCol the latest same-key row wins; re-running the same
    * merge is idempotent (new version, identical rows). */
  def merge(spark: SparkSession, updates: DataFrame, path: String,
      keys: Seq[String], versionCol: Option[String] = None): Long = {
    val fs = hfs(spark, path)
    val deduped = Sink.collapseByKey(updates, keys, versionCol)
    val updKeys = deduped.select(keys.map(col): _*).distinct()
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      val base = latestVersion(spark, path)
      val v = base.map(_ + 1).getOrElse(0L)
      val (carried, rewritten) = base match {
        case Some(bv) =>
          val baseFiles = readManifest(fs, path, bv)._2
          val abs = baseFiles.map(f => s"$path/$f")
          // which files hold a matched key? one scan, keys broadcast
          val touchedNames = spark.read.parquet(abs: _*)
            .withColumn("__file", input_file_name())
            .join(broadcast(updKeys), keys, "left_semi")
            .select("__file").distinct().collect()
            .map(r => new Path(r.getString(0)).getName).toSet
          val (touched, untouched) =
            baseFiles.partition(f => touchedNames.contains(new Path(f).getName))
          val rewrite =
            if (touched.isEmpty) deduped
            else spark.read.parquet(touched.map(f => s"$path/$f"): _*)
              .join(updKeys, keys, "left_anti")
              .unionByName(deduped)
          (untouched, rewrite)
        case None => (Seq.empty[String], deduped)
      }
      val files = carried ++ stageData(spark, rewritten, path)
      if (tryCommit(fs, path, v, "merge", files)) return v
      // lost the race: orphaned staged files are left for vacuum; recompute
      attempt += 1
    }
    throw new java.io.IOException(s"TxTable: lost $MaxCommitRetries version races at $path")
  }

  /** OPTIMIZE-style compaction: rewrite the CURRENT snapshot into
    * `numFiles` files as a new version with identical content. File-pruned
    * merges append a few files per commit; periodic compaction folds the
    * accumulated small files together (vacuum then reclaims the old ones
    * once they age out of retention). Runs through the same optimistic
    * commit loop as any writer. */
  def compact(spark: SparkSession, path: String, numFiles: Int = 1): Long = {
    val fs = hfs(spark, path)
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      val base = latestVersion(spark, path).getOrElse(
        throw new java.io.FileNotFoundException(s"TxTable at $path has no commits"))
      val files = stageData(spark,
        read(spark, path, Some(base)).repartition(numFiles), path)
      if (tryCommit(fs, path, base + 1, "compact", files)) return base + 1
      attempt += 1
    }
    throw new java.io.IOException(s"TxTable: lost $MaxCommitRetries version races at $path")
  }

  /** Commit history (version, op, n_files) — newest first. Lists the
    * manifests actually present (vacuum prunes old ones, so the log need
    * not be contiguous from 0). */
  def history(spark: SparkSession, path: String): Seq[(Long, String, Int)] = {
    val fs = hfs(spark, path)
    if (!fs.exists(logDir(path))) Seq.empty
    else fs.listStatus(logDir(path)).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".txt"))
      .map(_.stripSuffix(".txt").toLong).sorted.reverse
      .map { v =>
        val (op, files) = readManifest(fs, path, v)
        (v, op, files.size)
      }
  }

  /** Drop all but the newest `keepVersions` manifests PRESENT (the log need
    * not be contiguous — earlier vacuums prune it), then delete data files
    * that no retained manifest references AND that are older than
    * `retentionMs`. The age threshold is what makes vacuum safe against a
    * CONCURRENT writer: stageData moves files into data/ before its commit
    * publishes, so a freshly-staged-but-uncommitted file is unreferenced —
    * deleting it would corrupt the commit about to win. Files younger than
    * the retention window are left alone (Delta's retention-threshold
    * rule); pass 0 only when no writer can be in flight. */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 2,
      retentionMs: Long = 60L * 60 * 1000): Unit = {
    val fs = hfs(spark, path)
    val versions = history(spark, path).map(_._1) // newest first, present only
    if (versions.isEmpty) return
    val keep = versions.take(keepVersions)
    versions.drop(keepVersions).foreach(v => fs.delete(commitFile(path, v), false))
    val referenced = keep
      .flatMap(v => readManifest(fs, path, v)._2).map(new Path(path, _).getName).toSet
    val cutoff = System.currentTimeMillis() - retentionMs
    val dataDir = new Path(path, "data")
    if (fs.exists(dataDir))
      fs.listStatus(dataDir).toSeq
        .filter(st => !referenced.contains(st.getPath.getName)
          && st.getModificationTime < cutoff)
        .foreach(st => fs.delete(st.getPath, false))
  }
}
