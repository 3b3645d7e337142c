package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** HyperLogLog distinct-count sketch as a native `TypedImperativeAggregate`
  * — the one justified custom aggregate (SURVEY §4): a MERGEABLE sketch whose
  * fixed-size register buffer flows through Spark's standard partial/final
  * aggregation, so a 100 TB distinct-count shuffles `m` bytes per group
  * instead of the key universe. Semantics mirror the reference's ES
  * `cardinality` aggregation (also HLL — the Lens "unique count" metric,
  * `kibana/kibana_saved_objects.ndjson:8`).
  *
  * Classic dense HLL (Flajolet et al. 2007): p index bits → m = 2^p 1-byte
  * registers, register = max rank (leading-zeros+1) of the remaining 64−p
  * hash bits; estimate = α·m²/Σ2^(−reg) with the small-range linear-counting
  * correction. Standard error ≈ 1.04/√m (p=12 → ~1.6%).
  *
  * Spark's built-in `approx_count_distinct` is the production form; this
  * exists to demonstrate the custom-sketch extension point (cf. Misra-Gries
  * in `operators/Sketches.scala`) and is verified against exact counts in
  * HllSpec within the published error bound.
  */
case class HyperLogLog(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"precision $p outside [4,16]")
  private val m = 1 << p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      val idx = (h >>> (64 - p)).toInt
      val rest = h << p
      val rank = if (rest == 0L) 64 - p + 1
        else java.lang.Long.numberOfLeadingZeros(rest) + 1
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    // published per-m constants for small m; the closed form is only
    // specified for m >= 128 (Flajolet et al. 2007, Fig. 3)
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.pow(2.0, -buf(i).toDouble)
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.rint(est).toLong
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"
  override def withNewMutableAggBufferOffset(offset: Int): HyperLogLog =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HyperLogLog =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HyperLogLog =
    copy(child = newChild)
}

object HllAggregate {
  /** DataFrame-side entry point: `df.agg(hll_distinct(col("user_id")))`. */
  def hll_distinct(c: Column, p: Int = 12): Column =
    GraftBridge.column(
      HyperLogLog(GraftBridge.expression(c), p).toAggregateExpression())

  /** SQL API: after `register(spark)`, `spark.sql("SELECT hll_distinct(x)
    * FROM t GROUP BY ...")` (optionally `hll_distinct(x, p)` with an
    * integer-literal precision) resolves to the same native aggregate.
    * Idempotent (createOrReplace). */
  /** SQL builder — shared by session-local [[register]] and the
    * [[graft.GraftExtensions]] injection path. */
  private[graft] val sqlBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => org.apache.spark.sql.catalyst.expressions.Expression = {
    case Seq(child) => HyperLogLog(child).toAggregateExpression()
    case Seq(child, p) =>
      val prec = p match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"hll_distinct: precision must be an integer literal, got $other")
      }
      HyperLogLog(child, prec).toAggregateExpression()
    case exprs => throw new IllegalArgumentException(
      s"hll_distinct expects 1 or 2 arguments, got ${exprs.length}")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftBridge.registerFunction(spark, "hll_distinct", sqlBuilder)
}
