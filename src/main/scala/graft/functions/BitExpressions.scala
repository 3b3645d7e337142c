package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton/Z-order bit interleaving as a native codegen'd expression.
  *
  * z(x, y) interleaves the low 32 bits of two non-negative ints into one
  * long (x on even bit positions, y on odd), the classic space-filling
  * curve key: sorting by z clusters rows that are close in BOTH dimensions,
  * so a range-partitioned parquet layout gets tight per-file min/max on
  * each dimension and box predicates prune files on either column — the
  * data-layout half of "filters reach the scan" at 100 TB, where a sort on
  * one column leaves the other unclustered.
  *
  * Bit spreading uses the standard magic-mask doubling (Morton codes /
  * "Interleave bits by Binary Magic Numbers", public bit-twiddling
  * folklore), five mask-shift rounds per operand instead of a 32-step
  * bit loop. Callers bucketize to non-negative ints first (negative inputs
  * would interleave two's-complement high bits and break monotonicity).
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"
  // declared input types matter doubly now that the SQL surface exposes
  // this: without them a BIGINT argument passes analysis and the codegen
  // silently truncates to 32 bits (while the interpreted path would throw
  // ClassCastException). Implicit casts widen narrow ints; a BIGINT is an
  // analysis error, never a silent wrap.
  override def inputTypes: Seq[DataType] = Seq(IntegerType, IntegerType)

  private def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Int].toLong) |
      (spread(b.asInstanceOf[Int].toLong) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      def spreadCode(in: String, out: String): String =
        s"""
           |long $out = ((long) $in) & 0xFFFFFFFFL;
           |$out = ($out | ($out << 16)) & 0x0000FFFF0000FFFFL;
           |$out = ($out | ($out << 8)) & 0x00FF00FF00FF00FFL;
           |$out = ($out | ($out << 4)) & 0x0F0F0F0F0F0F0F0FL;
           |$out = ($out | ($out << 2)) & 0x3333333333333333L;
           |$out = ($out | ($out << 1)) & 0x5555555555555555L;
         """.stripMargin
      spreadCode(a, sx) + spreadCode(b, sy) +
        s"${ev.value} = $sx | ($sy << 1);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object BitExpressions {
  def interleave_bits(x: Column, y: Column): Column =
    GraftBridge.column(InterleaveBits(
      GraftBridge.expression(x), GraftBridge.expression(y)))
}
