package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.serve.TxTable

/** Additive schema evolution on the TxTable (the Delta mergeSchema
  * contract): a merge may ADD columns; readers see the ordered superset
  * schema with nulls for rows written before the column existed;
  * time travel sees the schema AS OF the pinned version; compaction
  * normalizes the mixed-schema snapshot; a retype is refused loudly. */
class SchemaEvolutionSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def fresh(name: String): String = {
    val p = s"/tmp/graft_schema_evo/$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(p), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  test("added column: superset read, old rows null, version-pinned schema") {
    val path = fresh("add_col")
    TxTable.write(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    // evolving merge: touches key 2, adds column `w`
    TxTable.merge(spark,
      Seq((2L, "b2", 20.0), (3L, "c", 30.0)).toDF("k", "v", "w"),
      path, Seq("k"))
    val now = TxTable.read(spark, path)
    assert(now.columns.toSeq == Seq("k", "v", "w"),
      s"superset schema in commit order, got ${now.columns.toSeq}")
    val rows = now.collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.get(2)))).toMap
    assert(rows(1L) == ("a", None), "pre-evolution row must read null w")
    assert(rows(2L) == ("b2", Some(20.0)) && rows(3L) == ("c", Some(30.0)))
    // time travel: version 0 predates the column
    assert(TxTable.read(spark, path, Some(0L)).columns.toSeq == Seq("k", "v"))
  }

  test("evolving merge preserves untouched old-file rows; compaction normalizes") {
    val path = fresh("compact")
    // two base files so the evolving merge leaves one untouched
    TxTable.write(spark,
      Seq((1L, "a"), (100L, "z")).toDF("k", "v").repartition(2, col("k")), path)
    TxTable.merge(spark, Seq((100L, "z2", 1.5)).toDF("k", "v", "w"),
      path, Seq("k"))
    val before = TxTable.read(spark, path).collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(before(1L).isEmpty && before(100L).contains(1.5))
    val cv = TxTable.compact(spark, path)
    val after = TxTable.read(spark, path, Some(cv))
    assert(after.columns.toSeq == Seq("k", "v", "w"))
    assert(after.collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
      == before, "compaction must preserve the evolved rows")
  }

  test("change feed across an evolution boundary: pre/postimages null-pad the new column") {
    val path = fresh("cdc_evo")
    TxTable.write(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    // v1: update key 2 AND add column w in the same commit
    TxTable.merge(spark, Seq((2L, "b2", 9.0), (3L, "c", 3.0)).toDF("k", "v", "w"),
      path, Seq("k"))
    val feed = TxTable.changes(spark, path, 0L, 1L, Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        (r.getString(3), Option(r.get(4)))).toMap
    assert(feed(("update_preimage", 2L)) == ("b", None),
      "preimage predates the column: w must be null")
    assert(feed(("update_postimage", 2L)) == ("b2", Some(9.0)))
    assert(feed(("insert", 3L)) == ("c", Some(3.0)))
    assert(!feed.contains(("delete", 1L)), "untouched key must not appear")
  }

  test("retyped column is refused at merge time, before it can poison the table") {
    val path = fresh("retype")
    TxTable.write(spark, Seq((1L, 10)).toDF("k", "n"), path)
    val e = intercept[IllegalArgumentException] {
      TxTable.merge(spark, Seq((2L, "oops")).toDF("k", "n"), path, Seq("k"))
    }
    assert(e.getMessage.contains("additive"), e.getMessage)
    // the refused merge left no commit behind — the table still reads clean
    val rows = TxTable.read(spark, path).collect()
    assert(rows.length == 1 && rows(0).getInt(1) == 10)
  }
}
