package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Not, Or}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Per-file column statistics for [[TxTable]] manifests — the metadata that
  * makes data skipping possible: a reader (or a MERGE writer) consults the
  * manifest's (lo, hi, nulls) per column and skips every file whose range
  * cannot satisfy the filter, before any parquet footer is opened. This is
  * the table-format half of pruning; parquet row-group stats still prune
  * WITHIN the files that survive. At 100 TB the manifest is the only
  * metadata small enough to consult per query — file listings and footer
  * reads of a million data files are themselves a distributed job.
  *
  * Values are stored in ORDER-FAITHFUL comparable form: numerics, dates
  * (epoch days), timestamps (epoch micros) and booleans as decimals;
  * strings verbatim and compared with UTF8String's unsigned-byte order —
  * the SAME order Spark's min/max aggregates and binary-collation
  * comparisons use, so a pruning decision can never disagree with row-level
  * evaluation. Non-finite float bounds (NaN/Inf) are dropped rather than
  * approximated — a file without a bound is always read (pruning here must
  * be conservative: a skipped file must be PROVABLY irrelevant).
  */
object TxStats {

  /** Bounds collected per column: lo/hi over non-null values (None when the
    * file has no non-null value — which itself prunes: an equality filter
    * cannot match an all-null file), plus the null count for IS [NOT] NULL. */
  case class ColStats(lo: Option[Any], hi: Option[Any], nulls: Long)

  /** Per-file stats: row count, file length + mtime (so the reader can build
    * a FileStatus without touching the filesystem), column bounds. */
  case class FileStats(rows: Long, bytes: Long, mtime: Long,
      cols: Map[String, ColStats])

  /** Stats are collected for the first [[MaxStatsCols]] supported columns —
    * the same bounded-metadata rule real table formats apply (manifest size
    * must stay O(files), not O(files × width)). */
  val MaxStatsCols = 16

  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType | DateType | TimestampType | TimestampNTZType |
        BooleanType => true
    case _: DecimalType => true
    case st: StringType => st == StringType // binary collation only
    case _ => false
  }

  // ---------------------------------------------------------- collection

  /** One aggregate scan over freshly staged files: per file, row count and
    * min/max/nulls for each supported column. Column pruning means the scan
    * reads only the stat columns; at cluster scale this piggybacks on the
    * write (the committer records stats as it writes) — here it is an
    * explicit second pass over data that is still in the page cache. */
  def collect(spark: SparkSession, absFiles: Seq[String]): Map[String, FileStats] = {
    val df = spark.read.parquet(absFiles: _*)
    val statFields = df.schema.fields.filter(f => supported(f.dataType)).take(MaxStatsCols)
    val aggs = count(lit(1)).as("__rows") +: statFields.zipWithIndex.flatMap {
      case (f, i) => Seq(
        min(col(f.name)).as(s"__lo$i"),
        max(col(f.name)).as(s"__hi$i"),
        sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"__nulls$i"))
    }.toSeq
    df.groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        val name = new org.apache.hadoop.fs.Path(r.getString(0)).getName
        val cols = statFields.zipWithIndex.map { case (f, i) =>
          f.name -> ColStats(
            toComparable(r.get(r.fieldIndex(s"__lo$i"))),
            toComparable(r.get(r.fieldIndex(s"__hi$i"))),
            r.getLong(r.fieldIndex(s"__nulls$i")))
        }.toMap
        // bytes/mtime are stamped by the caller, which knows the FileStatus
        name -> FileStats(r.getLong(r.fieldIndex("__rows")), 0L, 0L, cols)
      }.toMap
  }

  /** External (collected Row) value → comparable form. Returns None for
    * values whose order we refuse to encode (NaN/Inf). */
  def toComparable(v: Any): Option[Any] = v match {
    case null => None
    case b: java.lang.Boolean => Some(BigDecimal(if (b) 1 else 0))
    case n: java.lang.Byte => Some(BigDecimal(n.longValue))
    case n: java.lang.Short => Some(BigDecimal(n.longValue))
    case n: java.lang.Integer => Some(BigDecimal(n.longValue))
    case n: java.lang.Long => Some(BigDecimal(n.longValue))
    case f: java.lang.Float =>
      if (java.lang.Float.isFinite(f)) Some(BigDecimal(f.doubleValue)) else None
    case d: java.lang.Double =>
      if (java.lang.Double.isFinite(d)) Some(BigDecimal(d.doubleValue)) else None
    case d: java.math.BigDecimal => Some(BigDecimal(d))
    case s: String => Some(s)
    case d: java.sql.Date => Some(BigDecimal(d.toLocalDate.toEpochDay))
    case d: java.time.LocalDate => Some(BigDecimal(d.toEpochDay))
    case t: java.sql.Timestamp => Some(BigDecimal(DateTimeUtils.fromJavaTimestamp(t)))
    case i: java.time.Instant => Some(BigDecimal(DateTimeUtils.instantToMicros(i)))
    case l: java.time.LocalDateTime => Some(BigDecimal(DateTimeUtils.localDateTimeToMicros(l)))
    case _ => None
  }

  /** Catalyst literal (internal representation) → comparable form. */
  private def litComparable(value: Any, dt: DataType): Option[Any] =
    if (value == null) None
    else dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(BigDecimal(value.asInstanceOf[Number].longValue))
      case FloatType =>
        val f = value.asInstanceOf[Float]
        if (java.lang.Float.isFinite(f)) Some(BigDecimal(f.toDouble)) else None
      case DoubleType =>
        val d = value.asInstanceOf[Double]
        if (java.lang.Double.isFinite(d)) Some(BigDecimal(d)) else None
      case _: DecimalType => Some(value.asInstanceOf[Decimal].toBigDecimal)
      case st: StringType if st == StringType => Some(value.toString)
      case DateType => Some(BigDecimal(value.asInstanceOf[Int].toLong))
      case TimestampType | TimestampNTZType =>
        Some(BigDecimal(value.asInstanceOf[Long]))
      case BooleanType =>
        Some(BigDecimal(if (value.asInstanceOf[Boolean]) 1 else 0))
      case _ => None
    }

  /** Total order on comparable forms; None when the two are not of the same
    * kind (never prune on a comparison we do not understand). */
  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => Some(x.compare(y))
    case (x: String, y: String) =>
      Some(UTF8String.fromString(x).compareTo(UTF8String.fromString(y)))
    case _ => None
  }

  // ------------------------------------------------------------- pruning

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute => Some(u.name)
    case _ => None
  }

  /** Conservative "could any row of this file satisfy the filter" check.
    * TRUE whenever we cannot prove otherwise (unknown expression shapes,
    * missing stats, foreign types); FALSE only when the bounds prove no row
    * matches. And/Or recurse; everything else is leaf-evaluated. */
  def mightMatch(filter: Expression, stats: FileStats): Boolean = filter match {
    case And(l, r) => mightMatch(l, stats) && mightMatch(r, stats)
    case Or(l, r) => mightMatch(l, stats) || mightMatch(r, stats)
    case Not(IsNull(a)) => mightMatch(IsNotNull(a), stats)
    case Not(IsNotNull(a)) => mightMatch(IsNull(a), stats)

    case IsNull(a) =>
      lookup(a, stats).forall(_.nulls > 0)
    case IsNotNull(a) =>
      lookup(a, stats).forall(cs => stats.rows > cs.nulls)

    case EqualTo(a, Literal(v, dt)) => boundsContain(a, v, dt, stats)
    case EqualTo(Literal(v, dt), a) => boundsContain(a, v, dt, stats)
    case EqualNullSafe(a, Literal(null, _)) =>
      lookup(a, stats).forall(_.nulls > 0)
    case EqualNullSafe(Literal(null, _), a) =>
      lookup(a, stats).forall(_.nulls > 0)
    case EqualNullSafe(a, Literal(v, dt)) => boundsContain(a, v, dt, stats)
    case EqualNullSafe(Literal(v, dt), a) => boundsContain(a, v, dt, stats)

    // a > v: some row can be > v iff hi > v (and symmetric forms)
    case GreaterThan(a, Literal(v, dt)) => boundCmp(a, v, dt, stats, _.hi, c => c > 0)
    case GreaterThan(Literal(v, dt), a) => boundCmp(a, v, dt, stats, _.lo, c => c < 0)
    case GreaterThanOrEqual(a, Literal(v, dt)) => boundCmp(a, v, dt, stats, _.hi, c => c >= 0)
    case GreaterThanOrEqual(Literal(v, dt), a) => boundCmp(a, v, dt, stats, _.lo, c => c <= 0)
    case LessThan(a, Literal(v, dt)) => boundCmp(a, v, dt, stats, _.lo, c => c < 0)
    case LessThan(Literal(v, dt), a) => boundCmp(a, v, dt, stats, _.hi, c => c > 0)
    case LessThanOrEqual(a, Literal(v, dt)) => boundCmp(a, v, dt, stats, _.lo, c => c <= 0)
    case LessThanOrEqual(Literal(v, dt), a) => boundCmp(a, v, dt, stats, _.hi, c => c >= 0)

    case In(a, elems) if elems.forall(_.isInstanceOf[Literal]) =>
      elems.exists { case Literal(v, dt) => boundsContain(a, v, dt, stats) }

    case _ => true
  }

  /** Stats for the attribute a leaf references: None ⇒ not collected ⇒
    * never prune on it. */
  private def lookup(e: Expression, stats: FileStats): Option[ColStats] =
    attrName(e).flatMap(stats.cols.get)

  /** Could v lie within the file's [lo, hi]? All-null columns (lo/hi None
    * with stats PRESENT) prove it cannot. */
  private def boundsContain(a: Expression, v: Any, dt: DataType,
      stats: FileStats): Boolean =
    lookup(a, stats) match {
      case None => true
      case Some(cs) =>
        litComparable(v, dt) match {
          case None => true // null literal / foreign type: never prune
          case Some(x) =>
            (cs.lo, cs.hi) match {
              case (Some(lo), Some(hi)) =>
                (cmp(x, lo), cmp(x, hi)) match {
                  case (Some(cl), Some(ch)) => cl >= 0 && ch <= 0
                  case _ => true
                }
              case _ => false // stats exist but no non-null value: no match
            }
        }
    }

  /** Compare one bound (lo or hi) against the literal: keep the file when
    * the bound satisfies `ok`, or when anything needed is missing. */
  private def boundCmp(a: Expression, v: Any, dt: DataType, stats: FileStats,
      bound: ColStats => Option[Any], ok: Int => Boolean): Boolean =
    lookup(a, stats) match {
      case None => true
      case Some(cs) =>
        litComparable(v, dt) match {
          case None => true
          case Some(x) => bound(cs) match {
            case None => false // all-null column cannot satisfy a comparison
            case Some(b) => cmp(b, x).map(ok).getOrElse(true)
          }
        }
    }

  /** Could a file with bounds `cs` contain a key in [qlo, qhi]? Used by the
    * MERGE matched-file scan to skip base files whose key range cannot
    * intersect the update batch. */
  def rangesOverlap(cs: ColStats, qlo: Option[Any], qhi: Option[Any]): Boolean =
    (cs.lo, cs.hi) match {
      case (Some(lo), Some(hi)) =>
        val belowAll = qhi.flatMap(q => cmp(q, lo)).exists(_ < 0)
        val aboveAll = qlo.flatMap(q => cmp(q, hi)).exists(_ > 0)
        !(belowAll || aboveAll)
      case (None, None) => false // all-null key column: no joinable key
      case _ => true
    }

  // ---------------------------------------------------------------- JSON

  private def jval(a: Any): JValue = a match {
    case s: String => JString(s)
    case d: BigDecimal => JDecimal(d)
    case other => JString(other.toString)
  }

  def toJson(fs: FileStats): String = {
    val cols = JObject(fs.cols.toList.sortBy(_._1).map { case (n, c) =>
      n -> (JObject(List[(String, JValue)]("nulls" -> JLong(c.nulls)) ++
        c.lo.map(x => "lo" -> jval(x)).toList ++
        c.hi.map(x => "hi" -> jval(x)).toList): JValue)
    })
    JsonMethods.compact(JsonMethods.render(JObject(
      "rows" -> JLong(fs.rows), "bytes" -> JLong(fs.bytes),
      "mtime" -> JLong(fs.mtime), "cols" -> cols)))
  }

  private def fromJval(v: JValue): Option[Any] = v match {
    case JString(s) => Some(s)
    case JDecimal(d) => Some(d)
    case JInt(i) => Some(BigDecimal(i))
    case JLong(l) => Some(BigDecimal(l))
    case JDouble(d) => Some(BigDecimal(d))
    case _ => None
  }

  private def asLong(v: JValue): Long = v match {
    case JInt(i) => i.toLong
    case JLong(l) => l
    case JDecimal(d) => d.toLong
    case _ => 0L
  }

  def fromJson(s: String): Option[FileStats] =
    try {
      val j = JsonMethods.parse(s, useBigDecimalForDouble = true)
      val cols = (j \ "cols") match {
        case JObject(fields) => fields.map { case (n, cv) =>
          n -> ColStats(fromJval(cv \ "lo"), fromJval(cv \ "hi"),
            asLong(cv \ "nulls"))
        }.toMap
        case _ => Map.empty[String, ColStats]
      }
      Some(FileStats(asLong(j \ "rows"), asLong(j \ "bytes"),
        asLong(j \ "mtime"), cols))
    } catch { case scala.util.control.NonFatal(_) => None }
}
