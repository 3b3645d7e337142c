package graft.serve

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, GraftBridge, SaveMode, SparkSession}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A minimal transactional table format on plain parquet — the contract a
  * Delta/Iceberg table provides for the serving layer (the reference names
  * Delta as its own north star, `docs/medium_article.md:233`), built from
  * Spark + Hadoop FS primitives only (this environment ships no table-format
  * jars and the dependency set is frozen).
  *
  * Layout:
  * {{{
  *   table/
  *     _txlog/00000000.txt          // commit v0: line 1 = op, rest = delta
  *     _txlog/00000001.txt          //   lines (+add / -remove of data files)
  *     _txlog/00000010.checkpoint   // full manifest at v10 (one per
  *                                  //   CheckpointInterval commits)
  *     data/<uuid>-part-*.parquet   // immutable, never rewritten
  * }}}
  *
  * COMMITS ARE DELTAS, Delta-log-style: a merge records only the files it
  * removed (`-rel`) and added (`+rel<TAB>stats`), so commit cost is
  * O(touched files) — a full-manifest-per-commit log would write O(table
  * files) metadata on EVERY daily merge of a million-file table. Full
  * rewrites (write/compact) are reset commits (adds only). Every
  * [[CheckpointInterval]] commits the winner also writes a `.checkpoint`
  * with the complete manifest, so snapshot resolution reads ONE checkpoint
  * plus at most CheckpointInterval−1 delta commits — O(1) in table
  * history, never a replay from v0. Pre-delta logs (unprefixed lines) are
  * still readable as full-snapshot commits.
  *
  * The COMMIT POINT is the atomic rename of a staged manifest to
  * `_txlog/<version>.txt`. Hadoop `rename` refuses an existing destination,
  * so two writers racing for the same version produce exactly one winner —
  * the loser re-reads the new snapshot and retries its merge on top
  * (optimistic concurrency, the Delta protocol's conflict rule). Readers
  * resolve a snapshot by manifest, so they never observe a half-written
  * table and can time-travel to any retained version. Checkpoints are
  * written AFTER the commit wins, outside the race (idempotent, and purely
  * an optimization: a missing checkpoint only means a longer replay). Data
  * files are immutable; losers' orphans are reclaimed by [[vacuum]].
  *
  * On a rename-less object store (S3) the commit needs a put-if-absent
  * primitive or a coordination service. Since r16 that is a PLUGGABLE
  * seam, not a caveat: every commit-point publish goes through the
  * [[CommitStore]] registered for the table's URI scheme —
  * [[HadoopRenameStore]] (atomic rename / hard-link) serves file and
  * HDFS out of the box; an object-store deployment registers its
  * conditional-put implementation (S3 `If-None-Match: *`, GCS
  * `ifGenerationMatch=0`, ADLS ETag) via [[registerCommitStore]] instead
  * of inheriting a rename that is not atomic there.
  */

/** The put-if-absent commit primitive — the ONLY operation the optimistic
  * concurrency protocol needs from storage. `putIfAbsent` must atomically
  * publish `tmp`'s content as `dest` IFF `dest` does not exist, returning
  * true exactly when this writer created it; an exists()+rename pair is
  * NOT a valid implementation on any store whose rename overwrites (two
  * racing writers would both "win" a version and one commit would vanish
  * — the lost-update TxStatsSpec's injected race pins against). */
trait CommitStore {
  def putIfAbsent(fs: FileSystem, tmp: Path, dest: Path): Boolean
}

/** The filesystem implementation. On HDFS, `rename` is atomic AND refuses
  * an existing destination — exactly the primitive needed. On a LOCAL
  * filesystem Hadoop's rename bottoms out in POSIX rename(2), which
  * silently REPLACES an existing destination, so local publishes
  * `link(2)`-then-unlink instead (hard link fails with EEXIST
  * atomically). */
object HadoopRenameStore extends CommitStore {
  override def putIfAbsent(fs: FileSystem, tmp: Path, dest: Path): Boolean = {
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
}

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

  /** One manifest line: a table-relative file name, optionally with
    * per-file stats (see [[TxStats]]). Manifest lines are
    * `rel<TAB>statsJson`; stats-less lines (pre-stats manifests) stay
    * readable — their files are simply never pruned. */
  case class ManifestEntry(rel: String, stats: Option[TxStats.FileStats]) {
    def line: String = stats match {
      case Some(s) => rel + "\t" + TxStats.toJson(s)
      case None => rel
    }
  }

  private object ManifestEntry {
    def parse(line: String): ManifestEntry = line.indexOf('\t') match {
      case -1 => ManifestEntry(line, None)
      case i => ManifestEntry(line.substring(0, i),
        TxStats.fromJson(line.substring(i + 1)))
    }
  }

  /** Checkpoint every this-many commits. Small here so tests exercise the
    * machinery; a production table would use Delta's default (10). */
  val CheckpointInterval = 10

  private def checkpointFile(path: String, v: Long) =
    new Path(logDir(path), f"$v%08d.checkpoint")

  /** A parsed commit: op + delta actions. `reset` commits (write/compact,
    * and every pre-delta full manifest) replace the whole state with their
    * adds; others remove then add. `meta` carries tab-separated key=value
    * tokens from the header line — today only `txn=appId:batchId`, the
    * Delta idempotent-writer stamp. */
  private case class Commit(op: String, reset: Boolean,
      removes: Seq[String], adds: Seq[ManifestEntry],
      meta: Map[String, String] = Map.empty)

  private def readLines(fs: FileSystem, p: Path): List[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  // --------------------------------------------------- torn-file framing
  /** Every log file (commit + checkpoint) ends with a `#eof <n>` trailer
    * (n = payload line count). The publish rename is atomic on HDFS/local,
    * but on a store without atomic rename (the documented Delta-on-S3
    * caveat) a crashed writer can leave a HALF-WRITTEN file at a committed
    * name. Without framing, a truncated body silently parses as a shorter
    * manifest — wrong data with no error. With it, any truncation removes
    * the trailer (it is the last line) and a mid-line cut breaks the line
    * count, so reads refuse loudly instead.
    *
    * Recovery (documented contract): a torn commit means the writer DIED
    * mid-publish — the version never happened. Delete the torn
    * `_txlog/NNNNNNNN.txt` and the table resolves at the previous version;
    * the version number becomes claimable again. A torn CHECKPOINT is
    * derivable state: delete it and reads fall back to the delta chain. */
  private val EofPrefix = "#eof "

  /** On-disk log format version — bumped when the log format changes
    * incompatibly (v2: the `#eof` torn-file framing; v1 files have no
    * trailer and are indistinguishable from a truncated v2 file, so they
    * must refuse). Long-lived scratch layers (the stored IVF index) key
    * their cache paths by this, so an index persisted by an older format
    * is simply a different path — rebuilt idempotently — never a spurious
    * torn-commit refusal. */
  val LogFormatVersion = 2

  private def framed(lines: Seq[String]): Array[Byte] =
    (lines :+ (EofPrefix + lines.length)).mkString("\n").getBytes("UTF-8")

  private def unframe(lines: List[String], p: Path, what: String): List[String] =
    lines.lastOption match {
      case Some(l) if l == EofPrefix + (lines.length - 1) => lines.init
      case _ =>
        // recovery advice must match what the file IS: a torn checkpoint is
        // derivable state (the version itself committed fine), while a torn
        // commit means the writer died mid-publish and the version never
        // happened — and a table whose WHOLE log lacks trailers is a
        // pre-v2 (trailer-less format) table, where deleting "the torn
        // file" one read at a time would serially destroy a healthy log
        val recovery =
          if (what == "checkpoint")
            s"A checkpoint is derivable state: delete $p and reads fall " +
            "back to the delta chain — the version itself is still committed."
          else
            s"If ONLY this file lacks the trailer, a crashed writer died " +
            s"mid-publish and this version never committed: delete $p and " +
            "the table resolves at the previous version. If EVERY commit " +
            "in the log lacks a trailer, this is a pre-v2 trailer-less " +
            "table — do NOT delete files one by one; migrate or re-ingest it."
        throw new java.io.IOException(
          s"TxTable: $what $p is torn/truncated (bad or missing '#eof' trailer). " +
          recovery)
    }

  /** A table whose EVERY commit lacks the `#eof` trailer is a pre-v2
    * (trailer-less format) table, not a torn one — one crashed writer
    * cannot have torn the whole log. Checked only on an unframe failure
    * (one extra log scan on the error path, nothing on healthy reads). */
  private def preV2Log(fs: FileSystem, path: String): Boolean = {
    val vs = listLog(fs, path, ".txt")
    vs.nonEmpty && vs.forall { v =>
      val lines = readLines(fs, commitFile(path, v))
      !lines.lastOption.contains(EofPrefix + (lines.length - 1))
    }
  }

  private def readCommit(fs: FileSystem, path: String, v: Long): Commit = {
    val lines =
      try unframe(readLines(fs, commitFile(path, v)), commitFile(path, v), "commit")
      catch {
        // distinguish "this table predates the framing format" from "this
        // file is torn" PROGRAMMATICALLY — the torn-commit recovery advice
        // (delete the file) applied one read at a time would serially
        // destroy a healthy pre-v2 log
        case e: java.io.IOException if preV2Log(fs, path) =>
          throw new java.io.IOException(
            s"TxTable: $path is a pre-v$LogFormatVersion trailer-less table " +
            "(NO commit in its log carries an '#eof' trailer). This is a " +
            "format upgrade, not corruption — do not delete commit files; " +
            "migrate by re-writing the table with a current writer, or " +
            "re-ingest it.", e)
      }
    // header = op [\t key=value ...] — metadata rides the header line so
    // pre-meta readers (which take lines.head as the whole op) never see
    // it mixed into the action body; pre-meta FILES parse fine here (no
    // tab → no meta)
    val head = lines.head.split('\t')
    val (op, body) = (head.head, lines.tail)
    val meta = head.tail.flatMap { tok =>
      tok.indexOf('=') match {
        case -1 => None
        case i => Some(tok.substring(0, i) -> tok.substring(i + 1))
      }
    }.toMap
    val legacyFull = body.exists(l => !l.startsWith("+") && !l.startsWith("-"))
    if (legacyFull)
      Commit(op, reset = true, Nil, body.map(ManifestEntry.parse), meta)
    else
      Commit(op, reset = op == "write" || op == "compact",
        body.filter(_.startsWith("-")).map(_.substring(1)),
        body.filter(_.startsWith("+")).map(l => ManifestEntry.parse(l.substring(1))),
        meta)
  }

  private def listLog(fs: FileSystem, path: String, suffix: String): Seq[Long] =
    if (!fs.exists(logDir(path))) Seq.empty
    else fs.listStatus(logDir(path)).toSeq
      .map(_.getPath.getName).filter(_.endsWith(suffix))
      .map(_.stripSuffix(suffix).toLong)

  /** Checkpoint metadata line prefix for retained idempotent-writer stamps
    * (Delta's SetTransaction-in-checkpoint): `#txn appId:batchId`. Kept
    * lexically distinct from the `#eof` framing trailer and filtered out of
    * entry parsing, so a checkpoint stays a plain manifest to the entry
    * resolver. */
  private val TxnPrefix = "#txn "

  /** Parse one checkpoint file: (manifest entries, latest txn stamp per
    * appId as of that checkpoint). Pre-r14 checkpoints simply have no
    * `#txn` lines — their txn map is empty (stamps older than such a
    * checkpoint are invisible, the documented migration caveat). */
  private def checkpointLines(fs: FileSystem, path: String,
      c: Long): (Seq[ManifestEntry], Map[String, Long]) = {
    val f = checkpointFile(path, c)
    val lines = unframe(readLines(fs, f), f, "checkpoint").filter(_.nonEmpty)
    val (txnLines, entryLines) = lines.partition(_.startsWith(TxnPrefix))
    (entryLines.map(ManifestEntry.parse),
      txnLines.flatMap { l =>
        val t = l.substring(TxnPrefix.length)
        val i = t.lastIndexOf(':')
        if (i < 0) None else Some(t.substring(0, i) -> t.substring(i + 1).toLong)
      }.toMap)
  }

  /** The latest txn stamp per appId AS OF version `v`: nearest checkpoint's
    * retained stamps, folded forward over the delta tail (latest wins per
    * app). Unlike file entries, a RESET commit does not clear stamps — a
    * compaction rewrites data, not writer history (Delta keeps
    * SetTransaction across OPTIMIZE for exactly this reason). Same strict
    * contiguity rule as entry resolution: a mid-chain hole could hide a
    * NEWER stamp, and answering with an older one would green-light a
    * double apply — fail loudly instead. */
  private def resolveTxns(fs: FileSystem, path: String, v: Long): Map[String, Long] = {
    val cp = listLog(fs, path, ".checkpoint").filter(_ <= v) match {
      case vs if vs.isEmpty => None
      case vs => Some(vs.max)
    }
    val commits = listLog(fs, path, ".txt")
      .filter(cv => cv > cp.getOrElse(-1L) && cv <= v).sorted
    val root = cp.map(_ + 1L).getOrElse(0L)
    val (base, chain) =
      if (commits == (root to v))
        (cp.map(c => checkpointLines(fs, path, c)._2).getOrElse(Map.empty), commits)
      else if (cp.isEmpty) {
        // Align with resolveEntries' rooting (r14 ADVICE): with no
        // checkpoint, a chain whose history below a RESET commit was
        // pruned out-of-band is still a readable snapshot — entry
        // resolution accepts it, so txn resolution must too, or every
        // stamped merge / lastTxnBatch / writeCheckpoint on such a table
        // fails while reads work. Root at the OLDEST reset commit with a
        // contiguous tail to v — never the newest: a readable stamped
        // commit sitting between an older contiguous reset and a newer one
        // carries a stamp this fold can still know, and discarding it
        // (then persisting the impoverished map via the next checkpoint)
        // would green-light exactly the double apply the docstring above
        // forbids. Only stamps on commits PRUNED below the oldest
        // qualifying root are UNKNOWABLE and treated as absent — the
        // documented migration caveat (a replay of a pre-root batch
        // re-applies). Unreachable through this engine's own maintenance:
        // vacuum checkpoints every kept version before pruning, so only
        // external deletion gets here.
        val resetRoot = commits.find { cv =>
          commits.dropWhile(_ < cv) == (cv to v) &&
            readCommit(fs, path, cv).reset
        }
        resetRoot match {
          case Some(r) => (Map.empty[String, Long], commits.dropWhile(_ < r))
          case None =>
            throw new java.io.FileNotFoundException(
              s"TxTable $path: txn state at version $v is not resolvable " +
                s"(delta chain $root..$v has holes: ${commits.mkString(",")})")
        }
      } else
        throw new java.io.FileNotFoundException(
          s"TxTable $path: txn state at version $v is not resolvable " +
            s"(delta chain $root..$v has holes: ${commits.mkString(",")})")
    chain.foldLeft(base) { (m, cv) =>
      readCommit(fs, path, cv).meta.get("txn") match {
        case Some(t) =>
          val i = t.lastIndexOf(':')
          if (i < 0) m else m + (t.substring(0, i) -> t.substring(i + 1).toLong)
        case None => m
      }
    }
  }

  /** Checkpoints carry BOTH halves of durable state: the manifest AND the
    * retained txn stamps — so vacuum can prune a stamped commit without
    * reopening the idempotent-writer replay window. */
  private def writeCheckpoint(fs: FileSystem, path: String, v: Long,
      entries: Seq[ManifestEntry]): Unit = {
    val txns = resolveTxns(fs, path, v)
    val tmp = new Path(logDir(path), s"_cptmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, false)
    val lines = entries.map(_.line) ++
      txns.toSeq.sortBy(_._1).map { case (a, b) => s"$TxnPrefix$a:$b" }
    try out.write(framed(lines))
    finally out.close()
    if (!publish(fs, tmp, checkpointFile(path, v))) fs.delete(tmp, false)
  }

  /** Post-commit checkpoint hook — fired by every writer after it wins a
    * version on the interval boundary. Failure-safe: the checkpoint is
    * derivable from the log, so best-effort is enough. */
  private def maybeCheckpoint(fs: FileSystem, path: String, v: Long,
      entries: Seq[ManifestEntry]): Unit =
    if (v > 0 && v % CheckpointInterval == 0)
      try writeCheckpoint(fs, path, v, entries)
      catch { case scala.util.control.NonFatal(_) => () }

  /** Resolve the full file list at version `v`: nearest checkpoint ≤ v,
    * then the (≤ CheckpointInterval−1, bounded further by any reset commit)
    * delta tail — never a replay of the whole history. */
  private def resolveEntries(fs: FileSystem, path: String, v: Long): Seq[ManifestEntry] = {
    val cp = listLog(fs, path, ".checkpoint").filter(_ <= v) match {
      case vs if vs.isEmpty => None
      case vs => Some(vs.max)
    }
    val commits = listLog(fs, path, ".txt")
      .filter(cv => cv > cp.getOrElse(-1L) && cv <= v).sorted
      .map(cv => cv -> readCommit(fs, path, cv))
    // a reset commit supersedes everything before it — start there instead
    val lastReset = commits.lastIndexWhere(_._2.reset)
    val (start, tail) =
      if (lastReset >= 0) (Seq.empty[ManifestEntry], commits.drop(lastReset))
      else (cp.map(c => checkpointLines(fs, path, c)._1).getOrElse {
          // with no checkpoint and no reset in range, the delta chain is
          // only sound if it is rooted at the TABLE's first commit (v0) —
          // merely starting at the oldest SURVIVING commit is not enough:
          // out-of-band pruning (or a lost checkpoint) would silently
          // rebuild state over an empty base and report wrong manifests
          if (commits.isEmpty || commits.head._1 != 0L)
            throw new java.io.FileNotFoundException(
              s"TxTable $path: version $v is not resolvable (no checkpoint and no reset in range)")
          Seq.empty
        }, commits)
    // the delta tail must be CONTIGUOUS from its root to v: a mid-log hole
    // (external deletion — vacuum only ever prunes a prefix and
    // checkpoints what it keeps) means unseen removes/adds, and folding
    // across it would silently produce a wrong manifest. Fail loudly
    // instead, like the unrooted-chain case above.
    val root: Long =
      if (lastReset >= 0) tail.head._1
      else cp.map(_ + 1L).getOrElse(0L)
    if (tail.map(_._1) != (root to v).toSeq)
      throw new java.io.FileNotFoundException(
        s"TxTable $path: version $v is not resolvable (delta chain $root..$v has holes: ${tail.map(_._1).mkString(",")})")
    val state = scala.collection.mutable.LinkedHashMap.empty[String, ManifestEntry]
    start.foreach(e => state(e.rel) = e)
    tail.foreach { case (_, c) =>
      if (c.reset) state.clear()
      c.removes.foreach(state.remove)
      c.adds.foreach(e => state(e.rel) = e)
    }
    state.values.toSeq
  }

  /** The snapshot's manifest entries (files + stats) — the metadata surface
    * tests and planners consult without reading any data. */
  def manifest(spark: SparkSession, path: String,
      version: Option[Long] = None): Seq[ManifestEntry] = {
    val v = version.orElse(latestVersion(spark, path)).getOrElse(
      throw new java.io.FileNotFoundException(s"TxTable at $path has no commits"))
    val fs = hfs(spark, path)
    if (!fs.exists(commitFile(path, v)))
      throw new java.io.FileNotFoundException(s"TxTable $path has no version $v")
    resolveEntries(fs, path, v)
  }

  /** The stats-aware file index over a snapshot — also the hook tests use
    * to assert pruning decisions directly. */
  def fileIndex(spark: SparkSession, path: String,
      version: Option[Long] = None): StatsFileIndex =
    new StatsFileIndex(spark, path,
      manifest(spark, path, version).map(e => (e.rel, e.stats)))

  /** Snapshot read at the latest (default) or an explicit version — time
    * travel is just "resolve an older manifest". The scan goes through
    * [[StatsFileIndex]], so any filter Catalyst pushes down prunes whole
    * files from the manifest stats before parquet footers are touched. */
  def read(spark: SparkSession, path: String, version: Option[Long] = None): DataFrame = {
    val entries = manifest(spark, path, version)
    if (entries.isEmpty)
      return spark.read.parquet(path + "/data") // never: guard only
    val index = new StatsFileIndex(spark, path, entries.map(e => (e.rel, e.stats)))
    GraftBridge.relationToDataFrame(spark, HadoopFsRelation(
      index, StructType(Nil), snapshotSchema(spark, path, entries), None,
      new ParquetFileFormat, Map.empty[String, String])(spark))
  }

  /** The snapshot's logical schema under ADDITIVE schema evolution: the
    * ordered union of the field lists across the snapshot's staging
    * generations. A merge that ships a batch with a NEW column rewrites
    * only the touched files, so a snapshot legitimately mixes file
    * schemas; the read schema must be the superset (older files' missing
    * columns surface as null — the standard parquet clipped-schema
    * behavior, same as Delta's mergeSchema) or the new column silently
    * vanishes whenever an old file happens to head the manifest.
    *
    * Cost: one footer per staging GENERATION, not per file — every file
    * of one `stageData` call shares a schema by construction (rel =
    * `data/<uuid>-part-NNNNN.parquet`), and generations are bounded by
    * retained commits (compaction resets to one). Version pinning
    * composes for free: an old version's manifest lists only old
    * generations, so time travel sees the schema AS OF that version.
    *
    * Additive only: a field present in two generations must carry the
    * SAME type — a retype is a corrupt table, refused loudly (Delta's
    * rule; rewriting history is what `compact` is for). */
  private def snapshotSchema(spark: SparkSession, path: String,
      entries: Seq[ManifestEntry]): StructType = {
    // first file of each generation, in MANIFEST order (commit order) so
    // appended columns land after existing ones deterministically — a
    // random-uuid sort would shuffle field order between snapshots
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, String]
    entries.foreach { e =>
      val gen = e.rel.takeWhile(_ != '-')
      if (!seen.contains(gen)) seen(gen) = e.rel
    }
    val schemas = seen.values.toSeq.map(r => spark.read.parquet(s"$path/$r").schema)
    schemas.tail.foldLeft(schemas.head) { (acc, s) =>
      s.fields.foldLeft(acc) { (a, f) =>
        a.fields.find(_.name == f.name) match {
          // structural comparison: parquet footers legitimately disagree on
          // nullability/containsNull across generations (a required column
          // in one file, optional in another) — only a real TYPE change is
          // evolution abuse
          case Some(existing) if org.apache.spark.sql.types.DataType
              .equalsIgnoreNullability(existing.dataType, f.dataType) => a
          case Some(existing) =>
            throw new IllegalStateException(
              s"TxTable $path: column '${f.name}' retyped across commits " +
                s"(${existing.dataType.simpleString} vs ${f.dataType.simpleString}) " +
                "— schema evolution is additive-only")
          case None => StructType(a.fields :+ f.copy(nullable = true))
        }
      }
    }
  }

  /** Stage `df` as immutable files under data/ and return their manifest
    * entries, stats included (no commit yet). Stats cost one column-pruned
    * scan of the just-written files — data still in the page cache; a
    * cluster committer would fold this into the write itself. */
  private def stageData(spark: SparkSession, df: DataFrame, path: String): Seq[ManifestEntry] = {
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
    val collected =
      if (named.isEmpty) Map.empty[String, TxStats.FileStats]
      else TxStats.collect(spark, named.map(r => s"$path/$r"))
    named.map { rel =>
      val name = new Path(rel).getName
      val st = collected.get(name).map { s =>
        val status = fs.getFileStatus(new Path(path, rel))
        s.copy(bytes = status.getLen, mtime = status.getModificationTime)
      }
      ManifestEntry(rel, st)
    }
  }

  /** Atomically publish a DELTA commit as version `v`: `removes` as `-rel`
    * lines, `adds` as `+entry` lines — O(touched), not O(table). False ⇒
    * someone else won the version race (caller must re-read and retry). */
  private def tryCommit(fs: FileSystem, path: String, v: Long, op: String,
      removes: Seq[String], adds: Seq[ManifestEntry],
      meta: Map[String, String] = Map.empty): Boolean = {
    fs.mkdirs(logDir(path))
    val tmp = new Path(logDir(path), s"_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, false)
    val header = (op +: meta.toSeq.sortBy(_._1).map { case (k, vl) => s"$k=$vl" })
      .mkString("\t")
    val body = removes.map("-" + _) ++ adds.map("+" + _.line)
    try out.write(framed(header +: body))
    finally out.close()
    val won = publish(fs, tmp, commitFile(path, v))
    if (!won) fs.delete(tmp, false)
    won
  }

  /** Per-scheme [[CommitStore]] registry. Rename-safe schemes (file,
    * hdfs, …) fall back to [[HadoopRenameStore]]; any other scheme with
    * no registered store fails FAST at publish time — see
    * [[RenameSafeSchemes]]. */
  private val commitStores =
    new java.util.concurrent.ConcurrentHashMap[String, CommitStore]()

  /** Register the commit primitive for a URI scheme (e.g. "s3a" → a
    * conditional-put store). Returns any store it replaced. */
  def registerCommitStore(scheme: String, store: CommitStore): Option[CommitStore] =
    Option(commitStores.put(scheme, store))

  /** Remove a scheme's registered store (falls back to rename/link). */
  def unregisterCommitStore(scheme: String): Unit = commitStores.remove(scheme)

  /** Schemes whose Hadoop rename already IS the needed primitive (atomic,
    * refuses an existing destination) — plus "file", which
    * [[HadoopRenameStore]] serves via hard links. Everything else MUST
    * register: falling back to exists()+rename on an overwriting-rename
    * store is precisely the non-atomic pair the trait contract forbids,
    * and it would fail as SILENT LOST COMMITS under writer races, not as
    * an error. */
  private val RenameSafeSchemes = Set("file", "hdfs", "viewfs", "webhdfs")

  /** Every commit-point publish — version commits AND checkpoints — goes
    * through the registered seam; the protocol above never calls rename
    * directly. Unregistered non-rename-safe schemes fail FAST at the
    * first commit instead of losing updates under concurrency. */
  private def publish(fs: FileSystem, tmp: Path, dest: Path): Boolean = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    val store = commitStores.get(scheme)
    if (store != null) store.putIfAbsent(fs, tmp, dest)
    else {
      require(RenameSafeSchemes.contains(scheme),
        s"TxTable: no CommitStore registered for scheme '$scheme' and its " +
        "rename is not fail-if-exists atomic — register a conditional-put " +
        s"implementation via TxTable.registerCommitStore(\"$scheme\", ...) " +
        "before writing (an exists()+rename fallback would lose commits " +
        "silently under writer races)")
      HadoopRenameStore.putIfAbsent(fs, tmp, dest)
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
      if (tryCommit(fs, path, v, "write", Nil, files)) {
        maybeCheckpoint(fs, path, v, files)
        return v
      }
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
  /** Test seam: invoked once after a merge stages its rewrite, before its
    * first commit attempt — lets specs interleave a racing writer at the
    * exact window optimistic concurrency must survive. No-op in production. */
  private[graft] var onMergeStaged: () => Unit = () => ()

  /** Test seam: invoked at the top of every RETRY iteration (after a lost
    * race, before the snapshot re-read) — lets specs land a second racing
    * commit in the window the revalidation watermark must cover. */
  private[graft] var onMergeRetry: () => Unit = () => ()

  /** Test telemetry: how many times merge() has recomputed its
    * read-merge-stage phase (a lost race that fails logical conflict
    * detection). */
  private[graft] val mergeRecomputes = new java.util.concurrent.atomic.AtomicLong

  /** Latest batch id committed under `appId`'s `txn=` stamp — the read
    * half of the Delta txnAppId/txnVersion recipe. Resolved like a
    * manifest (nearest checkpoint's retained stamps + the delta tail), so
    * the answer survives vacuum pruning the stamped commit itself: without
    * checkpoint retention, "crash → external compactions/vacuum before the
    * stream restarts → replay of the stamped batch" would double-apply.
    * Metadata-scale: one checkpoint + ≤ CheckpointInterval commit reads. */
  def lastTxnBatch(spark: SparkSession, path: String, appId: String): Option[Long] = {
    val fs = hfs(spark, path)
    latestVersion(spark, path)
      .flatMap(v => resolveTxns(fs, path, v).get(appId))
  }

  /** `expectedBase = Some(v)` turns the merge into a compare-and-swap: it
    * commits ONLY as version v+1, throwing `ConcurrentModificationException`
    * if any other writer claimed a version since the caller read its
    * snapshot at v. The optimistic retry loop inside merge recomputes only
    * the FILE rewrite — it cannot know that the caller's `updates` frame
    * embeds state read from an earlier snapshot (a read-modify-write fold
    * like [[FinanceMv.maintainDailyCloseMv]] bakes n_old/s_old into the
    * batch), so a lost race there must abort the WHOLE fold, not re-stage
    * stale deltas. Callers catch the CME, re-read, recompute, retry. */
  def merge(spark: SparkSession, updates: DataFrame, path: String,
      keys: Seq[String], versionCol: Option[String] = None,
      txn: Option[(String, Long)] = None,
      expectedBase: Option[Long] = None): Long = {
    val fs = hfs(spark, path)
    // Idempotent-writer guard (Delta's txnAppId:txnVersion): a merge
    // stamped with a (appId, batchId) it has already committed is a
    // REPLAY — the crash-between-table-commit-and-checkpoint-commit
    // window of a streaming fold — and must be a no-op, not a double
    // apply. One writer per appId is the contract (a streaming query per
    // checkpoint), so the entry check races only against itself.
    txn.foreach { case (appId, _) =>
      require(!appId.exists(c => c == '\t' || c == '=' || c == ':' || c == '\n'),
        s"TxTable: txn appId '$appId' must not contain tab/'='/':'/newline")
    }
    for ((appId, batchId) <- txn; last <- lastTxnBatch(spark, path, appId))
      if (batchId <= last)
        return latestVersion(spark, path).getOrElse(
          throw new java.io.FileNotFoundException(s"TxTable at $path has no commits"))
    val deduped = Sink.collapseByKey(updates, keys, versionCol)
    val updKeys = deduped.select(keys.map(col): _*).distinct()
    // bounds of the update batch's first key, for the stats pre-filter
    // below (one tiny agg; multi-key merges still prune soundly on the
    // leading key alone)
    val keyBoundsRow = updKeys.agg(
      min(col(keys.head)).as("lo"), max(col(keys.head)).as("hi")).first()
    val (updLo, updHi) =
      (TxStats.toComparable(keyBoundsRow.get(0)), TxStats.toComparable(keyBoundsRow.get(1)))
    var attempt = 0
    var firstStage = true
    // the staged rewrite (and what it depends on) survives across LOGICALLY
    // DISJOINT races — Delta's conflict rule: losing the version race only
    // forces a recompute when a racing commit actually invalidated what we
    // read or could contain one of our keys
    var staged: Seq[ManifestEntry] = Seq.empty
    var touchedRels: Seq[String] = Seq.empty
    var readRels: Set[String] = Set.empty
    var stagedValid = false
    // highest version the staged rewrite has been validated against — a
    // commit attempt may only reuse staged files after EVERY commit above
    // this watermark passed the disjointness check (checking only at
    // lost-race time would miss a commit landing between that sample and
    // the next tryCommit: classic lost update)
    var validatedThrough = -1L
    def disjointFrom(rv: Long): Boolean = {
      val c = readCommit(fs, path, rv)
      !c.reset &&
        !c.removes.exists(readRels.contains) &&
        !c.adds.exists(e => e.stats.flatMap(_.cols.get(keys.head)) match {
          case Some(cs) => TxStats.rangesOverlap(cs, updLo, updHi)
          case None => true
        })
    }
    while (attempt < MaxCommitRetries) {
      if (attempt > 0) onMergeRetry()
      val base = latestVersion(spark, path)
      // CAS contract: the caller's updates embed state read at
      // expectedBase — any interleaved commit (even a key-disjoint one:
      // the fold's arithmetic, not just its files, may be stale) aborts
      // the merge back to the caller for a full re-read + recompute
      expectedBase.foreach { e =>
        if (!base.contains(e))
          throw new java.util.ConcurrentModificationException(
            s"TxTable $path: expected base version $e but found " +
              s"${base.getOrElse(-1L)} — the caller's read-modify-write " +
              "fold is stale; re-read and retry the whole fold")
      }
      val v = base.map(_ + 1).getOrElse(0L)
      // logical conflict detection (Delta's rule): before REUSING the
      // staged rewrite, every commit that appeared since we last validated
      // must be a non-reset that removed none of the files we read and
      // added no file whose leading-key range can contain one of our
      // update keys (stats-less adds are conservatively conflicting).
      // Disjoint-key writers therefore re-commit the SAME staged files at
      // the next version — no re-scan, no re-stage; orphans only on true
      // conflicts.
      if (stagedValid && base.exists(_ > validatedThrough)) {
        stagedValid = (validatedThrough + 1 to base.get).forall(disjointFrom)
        if (stagedValid) validatedThrough = base.get
      }
      if (!stagedValid) {
        if (attempt > 0) mergeRecomputes.incrementAndGet()
        val (tr, rr, rewritten) = base match {
          case Some(bv) =>
            val baseFiles = resolveEntries(fs, path, bv)
            // fail-fast additive-evolution guard: a retyped column must be
            // refused BEFORE the commit poisons the table (the read-side
            // snapshotSchema check is the safety net, not the gate)
            val current = snapshotSchema(spark, path, baseFiles)
            deduped.schema.fields.foreach { f =>
              current.fields.find(_.name == f.name).foreach { existing =>
                if (!org.apache.spark.sql.types.DataType
                    .equalsIgnoreNullability(existing.dataType, f.dataType))
                  throw new IllegalArgumentException(
                    s"TxTable $path: merge batch retypes column '${f.name}' " +
                      s"(${existing.dataType.simpleString} -> ${f.dataType.simpleString}) " +
                      "— schema evolution is additive-only")
              }
            }
            // stats pre-filter: a file whose key range cannot intersect the
            // update batch cannot hold a matched key — skip it in the scan
            // AND carry it verbatim. At 100 TB this is what bounds merge cost
            // by the touched region, not the table: the matched-file scan
            // reads only range-overlapping candidates.
            val (candidates, _) = baseFiles.partition { e =>
              e.stats.flatMap(_.cols.get(keys.head)) match {
                case Some(cs) => TxStats.rangesOverlap(cs, updLo, updHi)
                case None => true // no stats: must scan
              }
            }
            // which candidate files hold a matched key? one scan, keys broadcast
            val touchedNames =
              if (candidates.isEmpty) Set.empty[String]
              else spark.read.parquet(candidates.map(e => s"$path/${e.rel}"): _*)
                .withColumn("__file", input_file_name())
                .join(broadcast(updKeys), keys, "left_semi")
                .select("__file").distinct().collect()
                .map(r => new Path(r.getString(0)).getName).toSet
            val (touched, _) = candidates.partition(
              e => touchedNames.contains(new Path(e.rel).getName))
            // mergeSchema on the touched read + allowMissingColumns on the
            // union: an update batch may ADD columns (additive schema
            // evolution — retained rows of rewritten files get null, the
            // snapshotSchema contract); without these a first evolving
            // merge crashes, and a mixed-schema touched set would silently
            // clip to its first file's fields
            val rewrite =
              if (touched.isEmpty) deduped
              else spark.read.option("mergeSchema", "true")
                .parquet(touched.map(e => s"$path/${e.rel}"): _*)
                .join(updKeys, keys, "left_anti")
                .unionByName(deduped, allowMissingColumns = true)
            (touched.map(_.rel), candidates.map(_.rel).toSet, rewrite)
          case None => (Seq.empty[String], Set.empty[String], deduped)
        }
        touchedRels = tr
        readRels = rr
        staged = stageData(spark, rewritten, path)
        stagedValid = true
        validatedThrough = base.getOrElse(-1L) // staged against this snapshot
        if (firstStage) { firstStage = false; onMergeStaged() }
      }
      // the commit is the DELTA (removed touched files, added staged ones);
      // carried files are implicit — O(touched) metadata per merge
      if (tryCommit(fs, path, v, "merge", touchedRels, staged,
          txn.map { case (a, b) => "txn" -> s"$a:$b" }.toMap)) {
        // checkpoint needs the FULL manifest — resolve it from the log we
        // just extended (disjoint racers may have changed carried files)
        if (v > 0 && v % CheckpointInterval == 0)
          maybeCheckpoint(fs, path, v, resolveEntries(fs, path, v))
        return v
      }
      // lost the race: loop — the watermark check above revalidates every
      // commit that landed since, INCLUDING ones racing in after the last
      // check, before staged files are reused
      attempt += 1
    }
    throw new java.io.IOException(s"TxTable: lost $MaxCommitRetries version races at $path")
  }

  /** OPTIMIZE-style compaction: rewrite the CURRENT snapshot into
    * `numFiles` files as a new version with identical content. File-pruned
    * merges append a few files per commit; periodic compaction folds the
    * accumulated small files together (vacuum then reclaims the old ones
    * once they age out of retention). Runs through the same optimistic
    * commit loop as any writer.
    *
    * `zorderBy = Some((x, y))` is OPTIMIZE ZORDER: the snapshot is
    * redistributed into contiguous Morton-key ranges before the rewrite,
    * so each new file covers a tight (lo, hi) box on BOTH columns — the
    * manifest stats recorded at commit then let [[StatsFileIndex]] prune
    * point/range filters on either column to a few files, where the
    * merge-accumulated layout satisfied almost none. */
  /** Test seam: invoked once after compact stages its rewrite, before its
    * first commit attempt — the window where a racing MERGE's commit must
    * make the compaction re-read and re-stage (a reset commit of the STALE
    * snapshot would silently undo the merge). No-op in production. */
  private[graft] var onCompactStaged: () => Unit = () => ()

  def compact(spark: SparkSession, path: String, numFiles: Int = 1,
      zorderBy: Option[(String, String)] = None): Long = {
    val fs = hfs(spark, path)
    var attempt = 0
    var firstStage = true
    while (attempt < MaxCommitRetries) {
      val base = latestVersion(spark, path).getOrElse(
        throw new java.io.FileNotFoundException(s"TxTable at $path has no commits"))
      val snapshot = read(spark, path, Some(base))
      val arranged = zorderBy match {
        case Some((x, y)) =>
          graft.operators.Layout.zorderCluster(snapshot, x, y, numFiles)
        case None => snapshot.repartition(numFiles)
      }
      val files = stageData(spark, arranged, path)
      if (firstStage) { firstStage = false; onCompactStaged() }
      if (tryCommit(fs, path, base + 1, "compact", Nil, files)) {
        maybeCheckpoint(fs, path, base + 1, files)
        return base + 1
      }
      attempt += 1
    }
    throw new java.io.IOException(s"TxTable: lost $MaxCommitRetries version races at $path")
  }

  /** Delta-CDF-style change feed: row-level changes between two committed
    * versions, derived from the commit DELTAS — for a delta commit only
    * its removed/added files are read, so feed cost is O(touched files)
    * per commit, not O(table). This is what lets downstream consumers
    * (incremental indexers, cache invalidation, replication) follow a
    * 100 TB table by reading megabytes per merge.
    *
    * Per commit in `(fromV, toV]`, rows are classified by `keys`:
    *  - key only in the removed files            → `delete`
    *  - key only in the added files              → `insert`
    *  - key in both, any non-key column differs  → `update_preimage` (old
    *    row) + `update_postimage` (new row) — Delta's CDF naming
    *  - key in both, payload identical           → carried rewrite
    *    traffic, NOT a change (suppressed; a merge rewrites whole files,
    *    so most rows in a touched file are carries)
    * Reset commits (write/compact) diff the full previous snapshot
    * against the new one — correct, with the honest full-scan cost a
    * whole-table replacement implies (compact yields an empty feed).
    * Output: `change_type`, `commit_version`, then the table columns. */
  def changes(spark: SparkSession, path: String, fromV: Long, toV: Long,
      keys: Seq[String]): DataFrame = {
    val fs = hfs(spark, path)
    val versions = listLog(fs, path, ".txt").filter(v => v > fromV && v <= toV).sorted
    if (versions.map(_ - fromV) != (1L to (toV - fromV)).toSeq)
      throw new java.io.FileNotFoundException(
        s"TxTable $path: change feed ($fromV, $toV] has missing commits: ${versions.mkString(",")}")
    def readRels(rels: Seq[String], schemaOf: => StructType): DataFrame =
      if (rels.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schemaOf)
      else spark.read.parquet(rels.map(r => s"$path/$r"): _*)
    // the CDC schema with zero change rows — the shape of the feed's most
    // common polling state (no commits since `fromV`, or only no-op
    // commits in the window); must be a valid empty frame, not a crash
    def emptyFeed: DataFrame = {
      val snap = read(spark, path, Some(toV))
      val nonKey = snap.columns.filterNot(keys.contains).toSeq
      snap.limit(0).select(
        Seq(lit("").as("change_type"), lit(0).cast("int").as("commit_version"))
          ++ (keys ++ nonKey).map(col): _*)
    }
    val frames = versions.flatMap { v =>
      val c = readCommit(fs, path, v)
      val (oldRels, newRels) =
        if (c.reset) (resolveEntries(fs, path, v - 1).map(_.rel), c.adds.map(_.rel))
        else (c.removes, c.adds.map(_.rel))
      // a commit touching no files (e.g. a merge of an empty batch) is an
      // empty diff, not an error — it must not poison every window
      // spanning it
      if (oldRels.isEmpty && newRels.isEmpty) None else Some {
      lazy val newDf = readRels(newRels, throw new IllegalStateException(
        s"TxTable $path: commit $v unreachable schema thunk"))
      val oldDf0 = readRels(oldRels, newDf.schema)
      val nw0 = if (newRels.isEmpty) readRels(Nil, oldDf0.schema) else newDf
      // additive schema evolution can land INSIDE a change window: the
      // commit's removed files carry the pre-evolution schema while its
      // adds carry the superset. Null-pad both sides to the column union
      // (types taken from whichever side has the field) so the diff joins
      // resolve — a pre-evolution row's new column reads null, exactly
      // what the snapshot read reports for it.
      val fieldType = (nw0.schema.fields ++ oldDf0.schema.fields)
        .map(f => f.name -> f.dataType).toMap
      val allCols = (nw0.columns ++ oldDf0.columns).distinct.toSeq
      def pad(df: DataFrame): DataFrame = df.select(allCols.map(c0 =>
        if (df.columns.contains(c0)) col(c0)
        else lit(null).cast(fieldType(c0)).as(c0)): _*)
      val oldDf = pad(oldDf0)
      val nw = pad(nw0)
      val nonKey = nw.columns.filterNot(keys.contains).toSeq
      val cols = (keys ++ nonKey).map(col)
      def stamp(t: String) = Seq(lit(t).as("change_type"),
        lit(v).cast("int").as("commit_version"))
      def tag(df: DataFrame, t: String) = df.select(stamp(t) ++ cols: _*)
      val deletes = tag(oldDf.join(nw, keys, "left_anti"), "delete")
      val inserts = tag(nw.join(oldDf, keys, "left_anti"), "insert")
      val o = oldDf.as("o"); val n = nw.as("n")
      val differs = nonKey.map(c0 => !(col(s"o.$c0") <=> col(s"n.$c0")))
        .reduceOption(_ || _).getOrElse(lit(false))
      val both = o.join(n, keys).filter(differs)
      def side(alias: String, t: String) = both.select(
        stamp(t) ++ keys.map(col) ++ nonKey.map(c0 => col(s"$alias.$c0").as(c0)): _*)
      deletes.unionByName(inserts)
        .unionByName(side("o", "update_preimage"))
        .unionByName(side("n", "update_postimage"))
      }
    }
    // allowMissingColumns: commits BEFORE an in-window evolution emit
    // narrower frames — their missing columns are null by definition
    if (frames.isEmpty) emptyFeed
    else frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** DELETE FROM by predicate — the table-format verb a right-to-be-
    * forgotten request needs (a training-data lake must be able to purge
    * a document set; Delta's DELETE): files that cannot contain a
    * matching row are carried verbatim into the new manifest, files with
    * at least one match are rewritten WITHOUT the matching rows, one
    * atomic delta commit. File discovery goes through the stats-pruned
    * snapshot read, so the scan (and therefore the rewrite candidate set)
    * is bounded by the predicate's key range when stats cover it — delete
    * cost scales with the touched region, not the table. Physical removal
    * completes when [[vacuum]] ages out the superseded files (the purge
    * contract: logical immediately, physical after retention).
    *
    * SQL ternary semantics: rows where `condition` is NULL are NOT
    * matched (kept), exactly like `DELETE FROM t WHERE c`. Returns the
    * new version — or the CURRENT version unchanged when nothing
    * matched (an empty delete must not burn a commit: replaying it is
    * then idempotent by construction). Change feeds over the commit
    * emit the removed rows as `delete` rows for free (the manifest diff
    * IS the CDC source). */
  /** Test seam: invoked once after a delete stages its rewrite, before its
    * first commit attempt — the interleave window where a racing writer's
    * commit must force the delete to lose the version race and recompute
    * its touched set against the new snapshot. No-op in production. */
  private[graft] var onDeleteStaged: () => Unit = () => ()

  def delete(spark: SparkSession, path: String,
      condition: org.apache.spark.sql.Column): Long = {
    val fs = hfs(spark, path)
    var firstStage = true
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      val base = latestVersion(spark, path).getOrElse(
        throw new java.io.FileNotFoundException(s"TxTable at $path has no commits"))
      // stats-pruned match scan: the snapshot read's FileIndex drops files
      // whose ranges cannot satisfy pushed-down predicate fragments
      val touchedNames = read(spark, path, Some(base))
        .filter(condition)
        .select(input_file_name().as("__file")).distinct().collect()
        .map(r => new Path(r.getString(0)).getName).toSet
      if (touchedNames.isEmpty) return base
      val entries = resolveEntries(fs, path, base)
      val touched = entries.filter(e => touchedNames.contains(new Path(e.rel).getName))
      // The rewrite-side read must present the SNAPSHOT schema, not just
      // the union of the touched files': the match scan above ran over the
      // snapshot (old files null-padded), so a predicate referencing a
      // post-evolution column can match rows in pre-evolution files whose
      // footers lack that column — filtering the narrower mergeSchema read
      // with it would throw AnalysisException and fail the delete. Pad the
      // touched read to the snapshot schema (the changeFeed pad) first.
      val snapSchema = snapshotSchema(spark, path, entries)
      val raw = spark.read.option("mergeSchema", "true")
        .parquet(touched.map(e => s"$path/${e.rel}"): _*)
      val present = raw.columns.toSet
      val kept = raw.select(snapSchema.fields.toSeq.map(f =>
          if (present(f.name)) col(f.name)
          else lit(null).cast(f.dataType).as(f.name)): _*)
        .filter(!coalesce(condition, lit(false)))
      val staged = stageData(spark, kept, path)
      if (firstStage) { firstStage = false; onDeleteStaged() }
      if (tryCommit(fs, path, base + 1, "delete", touched.map(_.rel), staged)) {
        if ((base + 1) % CheckpointInterval == 0)
          maybeCheckpoint(fs, path, base + 1, resolveEntries(fs, path, base + 1))
        return base + 1
      }
      attempt += 1
    }
    throw new java.io.IOException(s"TxTable: lost $MaxCommitRetries version races at $path")
  }

  /** Commit history (version, op, n_files) — newest first. Lists the
    * manifests actually present (vacuum prunes old ones, so the log need
    * not be contiguous from 0). */
  def history(spark: SparkSession, path: String): Seq[(Long, String, Int)] = {
    val fs = hfs(spark, path)
    // ONE log listing + one read per commit, resolving incrementally —
    // per-version resolveEntries would re-list and re-read O(interval)
    // commits for every row (O(V·interval) I/O on an object store). Only
    // the first present version (whose delta ancestry may be vacuumed)
    // goes through checkpoint-based resolution.
    val versions = listLog(fs, path, ".txt").sorted
    var state: Option[scala.collection.mutable.LinkedHashMap[String, ManifestEntry]] = None
    var prev = -1L
    val rows = versions.map { v =>
      val c = readCommit(fs, path, v)
      state match {
        // incremental folding is only sound across CONTIGUOUS versions —
        // a mid-log gap (external deletion; vacuum prunes only a prefix)
        // means unseen deltas, so re-resolve from a checkpoint/reset root
        // exactly as for the first version
        case Some(m) if v == prev + 1 =>
          if (c.reset) m.clear()
          c.removes.foreach(m.remove)
          c.adds.foreach(e => m(e.rel) = e)
        case _ =>
          val m = scala.collection.mutable.LinkedHashMap.empty[String, ManifestEntry]
          if (c.reset) { c.adds.foreach(e => m(e.rel) = e); state = Some(m) }
          else
            // a version whose delta ancestry has a hole (external mid-log
            // deletion) has no knowable manifest — report it as -1 files
            // rather than a silently-wrong fold; resolution re-roots at
            // the next reset/checkpointed version
            try {
              resolveEntries(fs, path, v).foreach(e => m(e.rel) = e)
              state = Some(m)
            } catch {
              case _: java.io.FileNotFoundException => state = None
            }
      }
      prev = v
      (v, c.op, state.map(_.size).getOrElse(-1))
    }
    rows.reverse
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
    val versions = listLog(fs, path, ".txt").sorted.reverse // newest first
    if (versions.isEmpty) return
    val keep = versions.take(keepVersions)
    // kept versions must stay resolvable after their delta ancestry is
    // dropped: materialize a checkpoint for each BEFORE deleting anything
    val resolved = keep.map(v => v -> resolveEntries(fs, path, v))
    resolved.foreach { case (v, entries) =>
      if (!fs.exists(checkpointFile(path, v))) writeCheckpoint(fs, path, v, entries)
    }
    versions.drop(keepVersions).foreach(v => fs.delete(commitFile(path, v), false))
    listLog(fs, path, ".checkpoint").filter(_ < keep.min)
      .foreach(v => fs.delete(checkpointFile(path, v), false))
    val referenced = resolved.flatMap(_._2)
      .map(e => new Path(path, e.rel).getName).toSet
    val cutoff = System.currentTimeMillis() - retentionMs
    val dataDir = new Path(path, "data")
    if (fs.exists(dataDir))
      fs.listStatus(dataDir).toSeq
        .filter(st => !referenced.contains(st.getPath.getName)
          && st.getModificationTime < cutoff)
        .foreach(st => fs.delete(st.getPath, false))
  }
}
