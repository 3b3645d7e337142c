package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
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

/** One step of the portable polynomial fold over LONG values:
  * acc·1000000007 + x with natural Long wraparound — the same recurrence
  * [[PolyHash]] runs over characters, lifted to 64-bit inputs so hashes
  * can be COMBINED (shingle hash from token hashes, slot hash from
  * (shingle, slot), band signature from 4 slot values) without ever
  * building intermediate strings. Wraparound lives here because ANSI mode
  * throws on Long overflow in SQL arithmetic; the DuckDB mirror is exact
  * HUGEINT mod-2^64 arithmetic over the UNSIGNED reinterpretation
  * (`TextFunctions.polyStepSql`) — bit-identical, which is what lets the
  * whole MinHash-LSH family hash-oracle (r16; xxhash64 before). */
case class PolyStep(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_step"
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def nullSafeEval(a: Any, b: Any): Any =
    a.asInstanceOf[Long] * 1000000007L + b.asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $a * 1000000007L + $b;")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The ×0x2545F4914F6CDD1D golden-ratio finisher as its own expression —
  * applied once after a [[PolyStep]] chain (mirrors [[PolyHash]]'s
  * `mixed = true` tail; DuckDB twin `TextFunctions.polyFinishSql`). */
case class PolyFinish(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_finish"
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def nullSafeEval(input: Any): Any =
    input.asInstanceOf[Long] * 0x2545F4914F6CDD1DL

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $c * 0x2545F4914F6CDD1DL;")

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

  /** Column API: one fold step over longs (acc·B + x, wraparound). */
  def poly_step(a: Column, b: Column): Column =
    GraftBridge.column(PolyStep(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API: the golden-ratio finisher over a long. */
  def poly_finish(c: Column): Column =
    GraftBridge.column(PolyFinish(GraftBridge.expression(c)))

  /** Fold-then-finish over ≥1 long columns: the portable hash COMBINER —
    * finish(step(…step(step(c1, c2), c3)…, cn)). A single value combines
    * to finish(c1) (fold from zero: 0·B + c1 = c1). */
  def poly_combine(cs: Column*): Column = {
    require(cs.nonEmpty, "poly_combine needs at least one column")
    poly_finish(cs.reduceLeft(poly_step))
  }
}
