package graft.serve

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] over one TxTable snapshot that answers Spark's file
  * listing from the MANIFEST (no directory walk — the snapshot IS the file
  * list) and prunes files with [[TxStats.mightMatch]] against the data
  * filters Catalyst pushes down. Plugging in here makes data skipping
  * transparent: `TxTable.read(...).filter(col("k") === v)` reaches
  * FileSourceScanExec, which hands the pushed filters to `listFiles`, and
  * files whose manifest bounds exclude `v` are never opened — the same
  * mechanism partition pruning uses, driven by stats instead of directory
  * values. Unprunable filters and stat-less files (old manifests) simply
  * keep every file: pruning is an optimization, never a semantics change.
  *
  * FileStatus is reconstructed from manifest-recorded (bytes, mtime) when
  * present, so resolving a snapshot costs ZERO filesystem calls per data
  * file — at a million files the difference between a driver-side stall
  * and instant planning. */
class StatsFileIndex(spark: SparkSession,
    private val tablePath: String,
    private val entries: Seq[(String, Option[TxStats.FileStats])])
  extends FileIndex {

  /** Two snapshot indexes are the SAME data source iff they cover the same
    * table path and the same manifest entry list (rel + stats). Spark's
    * CacheManager keys cache entries by canonicalized-plan equality, and a
    * FileIndex without value equality compares by reference — so every
    * re-read of the SAME snapshot version built a plan-unequal relation,
    * silently defeating any `.cache()` above a TxTable read (the r18
    * stored-LM finding: each scoring call re-registered its four model
    * caches unpopulated and re-materialized them). The manifest entry list
    * carries the version implicitly — any commit changes the rel list, so
    * distinct versions never compare equal. `spark` is excluded: the index
    * is session-scoped by construction (one CacheManager per session). */
  override def equals(other: Any): Boolean = other match {
    case o: StatsFileIndex => tablePath == o.tablePath && entries == o.entries
    case _ => false
  }
  override def hashCode(): Int = (tablePath, entries).##

  private val resolved: Seq[(FileStatus, Option[TxStats.FileStats])] = {
    lazy val fs = new Path(tablePath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    entries.map { case (rel, st) =>
      val p = new Path(tablePath, rel)
      val status = st match {
        case Some(s) if s.bytes > 0 =>
          new FileStatus(s.bytes, false, 1, 32 * 1024 * 1024, s.mtime, p)
        case _ => fs.getFileStatus(p) // stat-less manifest line: one RPC
      }
      (status, st)
    }
  }

  override def rootPaths: Seq[Path] = Seq(new Path(tablePath))

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = resolved.filter { case (_, st) =>
      st.forall(s => dataFilters.forall(f => TxStats.mightMatch(f, s)))
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_._1).toArray))
  }

  /** Files a given filter set leaves unpruned — exposed for tests and for
    * the MERGE planner. */
  def survivingFiles(dataFilters: Seq[Expression]): Seq[Path] =
    listFiles(Nil, dataFilters).flatMap(_.files.map(_.getPath))

  override def inputFiles: Array[String] =
    resolved.map(_._1.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = resolved.map(_._1.getLen).sum

  override def partitionSchema: StructType = StructType(Nil)
}
