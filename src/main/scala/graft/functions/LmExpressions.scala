package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local kernel behind [[BigramCounts]], shared verbatim by eval and
  * generated code (the `IvfKernels.nearestCells` channel). */
object LmKernels {
  /** Per-string bigram multiplicities as array<struct<_1 string, _2 long>>
    * in first-occurrence order. A bigram is a pair of ADJACENT CODE POINTS
    * — exactly the `substr(i, 2)` strings over `sequence(1, length(s)-1)`
    * (Spark's substr/length count code points; surrogate pairs are one
    * character on both routes). The walk steps RAW UTF-8 byte offsets
    * (`numBytesForFirstByte` per code point, the same decode table Spark's
    * own UTF8String uses), and each bigram is a zero-copy slice of the
    * input's byte array — no UTF-16 decode in, no per-string
    * CatalystConverter re-encode out, which is what the ScalaUDF form of
    * this kernel paid on every row (r19; LmScoreSpec pins kernel ≡
    * explode+groupBy corpus-wide plus adversarial unicode legs). */
  def bigramCounts(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val m = new java.util.LinkedHashMap[UTF8String, Long]
    var i = 0
    var j = math.min(i + UTF8String.numBytesForFirstByte(bytes(0)), len)
    while (j < len) {
      var k = j + UTF8String.numBytesForFirstByte(bytes(j))
      if (k > len) k = len // malformed-tail guard: never slice past the end
      val bg = UTF8String.fromBytes(bytes, i, k - i)
      m.merge(bg, 1L, (a, b) => a + b)
      i = j
      j = k
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var r = 0
    while (it.hasNext) {
      val e = it.next()
      out(r) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue))
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct code points of a string in first-occurrence order —
    * bit-identical to `array_distinct(split(s, ""))` (pinned empirically
    * and by LmScoreSpec's unicode leg): Spark's split("") yields one
    * element per CODE POINT with no trailing empty, and the empty string
    * yields `[""]`. Same zero-copy byte-walk as [[bigramCounts]]; the set
    * is per-doc-distinct-scale, never doc-length-scale. */
  def distinctChars(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    if (len == 0)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val set = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    while (i < len) {
      var j = i + UTF8String.numBytesForFirstByte(bytes(i))
      if (j > len) j = len // malformed-tail guard: never slice past the end
      set.add(UTF8String.fromBytes(bytes, i, j - i))
      i = j
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var r = 0
    while (it.hasNext) { out(r) = it.next(); r += 1 }
    new GenericArrayData(out)
  }
}

/** Fused row-local bigram counting: s (string) → the compressed
  * (bigram, count) pairs as array<struct<_1 string, _2 long>>.
  *
  * Why an expression (guide §4 — built-ins/expressions over opaque
  * closures): the r18 ScalaUDF form already deleted the corpus-keyed
  * instance exchange, but every evaluation still paid the
  * UTF8String→String decode on the way in and a CatalystTypeConverter
  * re-encode of every produced (String, Long) pair on the way out, and the
  * opaque closure capped the WholeStageCodegen span at that projection.
  * This expression runs the same O(doc length) walk on the raw UTF-8
  * bytes with zero-copy bigram slices, inside codegen. Field names _1/_2
  * match the tuple schema the UDF produced, so consumers and the
  * LmScoreSpec pins read identically. Null-intolerant: a null string
  * yields null, which `explode` drops exactly like the UDF's empty Seq. */
case class BigramCounts(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(
    new StructType().add("_1", StringType, nullable = false)
      .add("_2", LongType, nullable = false), containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def prettyName: String = "bigram_counts"

  override def nullSafeEval(s: Any): Any =
    LmKernels.bigramCounts(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e =>
      s"${ev.value} = graft.functions.LmKernels.bigramCounts($e);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused per-doc character-set extraction: s (string) → its distinct code
  * points as array<string>, replacing `array_distinct(split(s, ""))` in the
  * vocabulary aggregate (guide §4): the regex split allocated one
  * single-char String per CHARACTER of the corpus (Σ doc-lengths regex
  * zero-width matches) before array_distinct shrank it; this walks the raw
  * UTF-8 bytes once and emits only the per-doc-distinct set, inside
  * codegen. Null-intolerant like split: null in → null out. */
case class DistinctChars(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def prettyName: String = "distinct_chars"

  override def nullSafeEval(s: Any): Any =
    LmKernels.distinctChars(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e =>
      s"${ev.value} = graft.functions.LmKernels.distinctChars($e);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LmExpressions {
  /** Column API for the fused bigram-count kernel. */
  def bigram_counts(s: Column): Column =
    GraftBridge.column(BigramCounts(GraftBridge.expression(s)))

  /** Column API for the fused distinct-character kernel. */
  def distinct_chars(s: Column): Column =
    GraftBridge.column(DistinctChars(GraftBridge.expression(s)))
}
