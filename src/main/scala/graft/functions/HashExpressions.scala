package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Native Catalyst expression for the engine's portable polynomial hash
  * (`TextFunctions.polyHash`: h = h·1000000007 + charAt(i), natural Long
  * wraparound, optional ×0x2545F4914F6CDD1D golden-ratio finisher =
  * `Dedup.portableTokenHash`).
  *
  * Motivation: wraparound Long arithmetic cannot be written as SQL column
  * expressions under ANSI mode (overflow throws), so the hash lived in
  * Scala UDFs — a serde boundary + closure dispatch on the engine's
  * hottest per-token paths (SimHash bit votes, feature-hash embeddings:
  * one call per TOKEN of the corpus). This expression generates the same
  * fold as a primitive Java loop inside WholeStageCodegen; Java `long`
  * arithmetic wraps natively, and `charAt` iterates UTF-16 units exactly
  * like the UDF did, so hash values are bit-identical — every downstream
  * DuckDB HUGEINT mod-2^64 oracle keeps matching.
  *
  * Null-intolerant (null in → null out), like the hash built-ins.
  */
case class PolyHash(child: Expression, mixed: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = if (mixed) "poly_token_hash" else "poly_hash"
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * 1000000007L + s.charAt(i); i += 1 }
    if (mixed) h * 0x2545F4914F6CDD1DL else h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val finisher = if (mixed) s"$h * 0x2545F4914F6CDD1DL" else h
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = $h * 1000000007L + (long) $s.charAt($i);
         |}
         |${ev.value} = $finisher;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExpressions {
  /** Column API: the bare polynomial fold (`TextFunctions.polyHash`). */
  def poly_hash(c: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(c), mixed = false))

  /** Column API: fold × golden-ratio finisher
    * (`Dedup.portableTokenHash`). */
  def poly_token_hash(c: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(c), mixed = true))
}
