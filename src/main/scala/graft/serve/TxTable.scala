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
    val dest = commitFile(path, v)
    if (fs.exists(dest)) { fs.delete(tmp, false); false }
    else {
      val ok = fs.rename(tmp, dest) // atomic; refuses existing destination
      if (!ok) fs.delete(tmp, false)
      ok
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
    * commit. The read-merge-stage phase runs OUTSIDE the commit point; on a
    * version conflict the merge is recomputed against the new snapshot
    * (optimistic concurrency — no lock, no lost update, unlike the raw
    * parquet sink's best-effort marker). With a versionCol the latest
    * same-key row wins; re-running the same merge is idempotent (new
    * version, identical rows). */
  def merge(spark: SparkSession, updates: DataFrame, path: String,
      keys: Seq[String], versionCol: Option[String] = None): Long = {
    val fs = hfs(spark, path)
    val deduped = Sink.collapseByKey(updates, keys, versionCol)
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      val base = latestVersion(spark, path)
      val v = base.map(_ + 1).getOrElse(0L)
      val merged = base match {
        case Some(bv) =>
          read(spark, path, Some(bv))
            .join(deduped.select(keys.map(col): _*).distinct(), keys, "left_anti")
            .unionByName(deduped)
        case None => deduped
      }
      val files = stageData(spark, merged, path)
      if (tryCommit(fs, path, v, "merge", files)) return v
      // lost the race: orphaned staged files are left for vacuum; recompute
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

  /** Drop manifests older than the last `keepVersions` and delete data
    * files no retained manifest references (losers' orphans included).
    * Time travel reaches only retained versions afterwards. */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 2): Unit = {
    val fs = hfs(spark, path)
    latestVersion(spark, path).foreach { latest =>
      val keepFrom = math.max(0L, latest - (keepVersions - 1).toLong)
      (0L until keepFrom).foreach { v =>
        fs.delete(commitFile(path, v), false)
      }
      val referenced = (keepFrom to latest)
        .flatMap(v => readManifest(fs, path, v)._2).map(new Path(path, _).getName).toSet
      val dataDir = new Path(path, "data")
      if (fs.exists(dataDir))
        fs.listStatus(dataDir).toSeq.map(_.getPath)
          .filterNot(p => referenced.contains(p.getName))
          .foreach(p => fs.delete(p, false))
    }
  }
}
