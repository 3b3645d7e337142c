package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Testdata physical-schema drift detection (r7 post-mortem).
  *
  * The driver regenerated `/root/testdata` between r6 and r7 and flipped
  * `events.ts` from INT64 TIMESTAMP(NANOS) to TIMESTAMP(MICROS,
  * isAdjustedToUTC=false). The reader assumed the old layout, so the drift
  * surfaced as 30 opaque query crashes instead of one named failure. This
  * spec pins the LOGICAL contract each query family relies on — column name
  * plus a tolerant type class — at the reader boundary, so the next
  * physical-layout change fails HERE, by table name, first.
  */
class SchemaDriftSpec extends AnyFunSuite {
  import SparkTestSession._

  // --- tolerant type classes: the semantics queries need, not the layout --
  private val integral: DataType => Boolean = {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _ => false
  }
  private val fractional: DataType => Boolean = {
    case _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }
  private val str: DataType => Boolean = { case _: StringType => true; case _ => false }
  /** Anything the date/window functions accept: queries over these columns
    * only date_trunc/date_format/compare, which work identically on all
    * three (under the UTC session timezone pinned in SparkTestSession). */
  private val timeish: DataType => Boolean = {
    case _: TimestampType | _: TimestampNTZType | _: DateType => true
    case _ => false
  }
  /** events.ts is STRICT TimestampType: Tables.events normalizes every
    * physical layout to one logical type so unix_timestamp /
    * to_utc_timestamp semantics never shift under the queries. */
  private val utcTimestamp: DataType => Boolean = {
    case _: TimestampType => true; case _ => false
  }
  private val floatArray: DataType => Boolean = {
    case ArrayType(et, _) => fractional(et); case _ => false
  }

  private val contract: Map[String, Seq[(String, DataType => Boolean, String)]] = Map(
    "region" -> Seq(
      ("r_regionkey", integral, "integral"), ("r_name", str, "string")),
    "nation" -> Seq(
      ("n_nationkey", integral, "integral"), ("n_name", str, "string"),
      ("n_regionkey", integral, "integral")),
    "customer" -> Seq(
      ("c_custkey", integral, "integral"), ("c_name", str, "string"),
      ("c_nationkey", integral, "integral"), ("c_acctbal", fractional, "fractional"),
      ("c_mktsegment", str, "string")),
    "supplier" -> Seq(
      ("s_suppkey", integral, "integral"), ("s_name", str, "string"),
      ("s_nationkey", integral, "integral"), ("s_acctbal", fractional, "fractional")),
    "part" -> Seq(
      ("p_partkey", integral, "integral"), ("p_name", str, "string"),
      ("p_brand", str, "string"), ("p_type", str, "string"),
      ("p_size", integral, "integral"), ("p_retailprice", fractional, "fractional")),
    "orders" -> Seq(
      ("o_orderkey", integral, "integral"), ("o_custkey", integral, "integral"),
      ("o_orderstatus", str, "string"), ("o_totalprice", fractional, "fractional"),
      ("o_orderdate", timeish, "timestamp-like"), ("o_orderpriority", str, "string")),
    "lineitem" -> Seq(
      ("l_orderkey", integral, "integral"), ("l_partkey", integral, "integral"),
      ("l_suppkey", integral, "integral"), ("l_linenumber", integral, "integral"),
      ("l_quantity", fractional, "fractional"),
      ("l_extendedprice", fractional, "fractional"),
      ("l_discount", fractional, "fractional"), ("l_tax", fractional, "fractional"),
      ("l_returnflag", str, "string"), ("l_linestatus", str, "string"),
      ("l_shipdate", timeish, "timestamp-like")),
    "events" -> Seq(
      ("event_id", integral, "integral"), ("ts", utcTimestamp, "TIMESTAMP (strict)"),
      ("user_id", integral, "integral"), ("event_type", str, "string"),
      ("value", fractional, "fractional"), ("props", str, "string")),
    "documents" -> Seq(
      ("doc_id", integral, "integral"), ("text", str, "string"),
      ("lang", str, "string"), ("source", str, "string"),
      ("n_chars", integral, "integral")),
    "embeddings" -> Seq(
      ("vec_id", integral, "integral"), ("embedding", floatArray, "array<fractional>"),
      ("label", integral, "integral")))

  private def reader(name: String): DataFrame = name match {
    case "events" => Tables.events(spark, sf)
    case other    => Tables.t(spark, sf, other)
  }

  test("the batch events reader matches the shared streaming schema exactly") {
    // Tables.EventsSchemaDdl is the explicit schema the file-source stream
    // MUST be given (streams silently null-fill on drift instead of
    // failing); equality with the batch reader's output schema is what
    // makes this spec the drift detector for the streaming path too
    val want = org.apache.spark.sql.types.StructType.fromDDL(Tables.EventsSchemaDdl)
    val got = Tables.events(spark, sf).schema
    assert(got == want,
      s"events logical schema drifted from Tables.EventsSchemaDdl:\n$got\nvs\n$want")
  }

  test("ingest-gate stream schemas conform to the table readers") {
    // the drop-stream DDLs the gates read with (streams null-fill on
    // drift) must stay a projection of the actual reader output
    def conforms(ddl: String, table: org.apache.spark.sql.DataFrame,
        rename: Map[String, String] = Map.empty): Unit =
      org.apache.spark.sql.types.StructType.fromDDL(ddl).fields.foreach { f =>
        val src = rename.getOrElse(f.name, f.name)
        val actual = table.schema.fields.find(_.name == src)
        assert(actual.isDefined, s"$src missing from table for DDL '$ddl'")
        // the ONLY sanctioned divergence: the embedding stream carries
        // double vectors while the table stores float (the documented
        // cast at the gate boundary) — any OTHER drift of emb must fail
        val sanctionedEmb = f.name == "emb" &&
          f.dataType == ArrayType(DoubleType) &&
          actual.get.dataType == ArrayType(FloatType)
        assert(actual.get.dataType == f.dataType || sanctionedEmb,
          s"$src: table ${actual.get.dataType} vs stream ${f.dataType}")
      }
    conforms(Tables.DocTextSchemaDdl, Tables.t(spark, sf, "documents"))
    conforms(Tables.VecSchemaDdl, Tables.t(spark, sf, "embeddings"),
      Map("emb" -> "embedding"))
  }

  test("testdata physical schema drift is detected at the reader") {
    assert(contract.keySet == Tables.All.toSet,
      "every Tables.All table needs a pinned logical contract")
    val violations = Tables.All.flatMap { table =>
      val schema = reader(table).schema
      contract(table).flatMap { case (col, ok, want) =>
        schema.fields.find(_.name == col) match {
          case None => Some(s"$table.$col: column MISSING (schema: ${schema.simpleString})")
          case Some(f) if !ok(f.dataType) =>
            Some(s"$table.$col: read as ${f.dataType.simpleString}, queries need $want")
          case _ => None
        }
      }
    }
    assert(violations.isEmpty,
      "testdata drifted under the readers:\n  " + violations.mkString("\n  "))
  }

  // --- both branches of the events reader, exercised with fixtures --------

  /** One instant, two physical layouts. 2023-11-14T22:13:20.123456Z. */
  private val micros = 1700000000123456L

  private def fixtureDir(sub: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-drift-$sub")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def eventsRow(tsCol: org.apache.spark.sql.Column): DataFrame =
    spark.range(1).select(
      col("id").as("event_id"), tsCol.as("ts"), lit(7L).as("user_id"),
      lit("click").as("event_type"), lit(1.5).as("value"), lit("{}").as("props"))

  test("events normalization: LongType (legacy nanos-as-long) arm converts ns to timestamp") {
    // a real TIMESTAMP(NANOS) file can't be written from Spark; a LongType
    // ns column IS what the legacy nanosAsLong conf surfaces, so driving
    // the normalization arm directly is exact
    val out = Tables.normalizeEventsTs(eventsRow(lit(micros * 1000L + 789L)))
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select(unix_micros(col("ts"))).head.getLong(0)
    assert(got == micros, s"ns→µs integer division must floor to $micros, got $got")
  }

  test("events normalization: TIMESTAMP_NTZ arm casts 1:1 under UTC") {
    val ntz = eventsRow(timestamp_micros(lit(micros)).cast(TimestampNTZType))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val out = Tables.normalizeEventsTs(ntz)
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select(unix_micros(col("ts"))).head.getLong(0)
    assert(got == micros,
      s"NTZ wall-clock must map to the same UTC instant, got $got want $micros")
  }

  test("events reader: micros parquet reads as native TimestampType (pushdown-capable)") {
    // with inferTimestampNTZ disabled at the reader, the regenerated
    // TIMESTAMP(MICROS, isAdjustedToUTC=false) layout surfaces directly as
    // TimestampType — no cast between a ts predicate and the parquet scan
    val dir = fixtureDir("micros")
    eventsRow(timestamp_micros(lit(micros)).cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Tables.events(spark, dir)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("timestamp range predicates reach the parquet scan as PushedFilters") {
    // the point of reading timestamps natively (inferTimestampNTZ=false)
    // instead of casting: a cast between predicate and scan kills pushdown,
    // which at lake scale is row-group pruning vs a full-table read. Pin
    // the plan so a reader change cannot silently regress it.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scanOf(q: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
      val plan = q.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      plan.collectLeaves().collectFirst { case s: FileSourceScanExec => s }.get
    }
    // lineitem: the registered range-scan query (P3/P6)
    val li = scanOf(graft.serve.LensQueries.filterRangeProject(spark, sf))
    val liPushed = li.metadata("PushedFilters")
    assert(liPushed.contains("GreaterThanOrEqual(l_shipdate") &&
           liPushed.contains("LessThan(l_shipdate"),
      s"l_shipdate range must push into the scan, got: $liPushed")
    // events: a ts predicate through the normalizing reader
    val ev = scanOf(Tables.events(spark, sf)
      .filter(col("ts") >= lit("2024-01-02").cast(TimestampType))
      .select("event_id", "ts"))
    val evPushed = ev.metadata("PushedFilters")
    assert(evPushed.contains("GreaterThanOrEqual(ts"),
      s"ts range must push into the events scan, got: $evPushed")
  }

  test("events reader: both branches yield the identical logical row") {
    val d1 = fixtureDir("eq-long"); val d2 = fixtureDir("eq-ntz")
    eventsRow(lit(micros * 1000L)).write.mode("overwrite")
      .parquet(s"$d1/events.parquet")
    eventsRow(timestamp_micros(lit(micros)).cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$d2/events.parquet")
    val a = Tables.events(spark, d1).collect().toSeq
    val b = Tables.events(spark, d2).collect().toSeq
    assert(a == b, s"physical layout must be invisible downstream: $a vs $b")
  }
}
