package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns, with whole-stage codegen.
  *
  * Motivation (SURVEY §7.3 escape-hatch ladder, measured): the
  * `zip_with`+`aggregate` higher-order formulation is evaluated through
  * Catalyst's lambda interpreter — per-element closure dispatch — which
  * costs ~50× a fused loop on 64-dim vectors. This expression generates a
  * primitive Java loop inline in the WholeStageCodegen stage: no virtual
  * calls, no boxing, no Python/serialization boundary.
  *
  * Semantics: cosine(a, b) ∈ [-1, 1]; 0.0 when either norm is zero;
  * null-intolerant (null in → null out); a LENGTH MISMATCH yields null —
  * the same answer the `zip_with`+`aggregate` form gives (its null
  * padding poisons the fold), so a truncated/corrupt embedding falls out
  * of every ranking comparison instead of scoring on a prefix.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"
  // declared input types: the SQL surface would otherwise accept int
  // arrays and reinterpret their slots via getDouble (garbage results);
  // with these, analysis casts array<int> up or rejects outright
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = $a.getDouble($i);
         |    double $yv = $b.getDouble($i);
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |  ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Native codegen'd squared Euclidean distance over two `array<double>`
  * columns — same motivation and contract as [[CosineSimilarity]] (the
  * interpreted `zip_with`+`aggregate` form pays per-element lambda dispatch;
  * this fuses to a primitive loop inside WholeStageCodegen). Used by the
  * Lloyd k-means assignment step, where it runs corpus × centroids times per
  * iteration. Null-intolerant; length mismatch → null (the zip_with
  * form's answer — see [[CosineSimilarity]]). */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def prettyName: String = "squared_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Native codegen'd dot product over two `array<double>` columns — the
  * plain inner product [[CosineSimilarity]] computes as its numerator.
  * Motivation is the same measured ~50× interpreted-HOF penalty; this is
  * the kernel of the learned quality gate (w·x per doc per GD pass, w
  * folded in as an array literal) and of the PQ tier's ADC scoring
  * (query-slice · looked-up codeword, nsub times per corpus row). The
  * left-to-right accumulation order matches the `aggregate(zip_with(·,·,
  * _*_), 0.0, _+_)` fold exactly, so swapping a lambda dot for this one
  * is bit-identical, not just close — INCLUDING on malformed input: a
  * length mismatch yields null exactly as the zip_with null-padding
  * does, so corrupt rows drop out of rankings rather than contributing
  * a prefix dot. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Native codegen'd INTEGER dot product over two `array<int>` columns,
  * accumulating in Long — the int8-quantized ANN tier's stage-1 kernel
  * (code · code over the whole corpus per query). Exact integer
  * arithmetic: no accumulation-order caveat at all. Null-intolerant;
  * length mismatch → null (see [[CosineSimilarity]]). */
case class DotProductInt(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(org.apache.spark.sql.types.IntegerType),
      ArrayType(org.apache.spark.sql.types.IntegerType))
  override def prettyName: String = "dot_product_int"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L
    var i = 0
    while (i < n) { dot += x.getInt(i).toLong * y.getInt(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (long) $a.getInt($i) * (long) $b.getInt($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** The fused logistic-GD row kernel: for features `x`, weights `w`
  * (same length) and label `y` ∈ {0, 1}, emits the length-(n+2) array
  *
  *   [ x₀·(p−y), …, xₙ₋₁·(p−y),  loss,  hit ]
  *
  * where m = w·x, p = σ(m), `hit` = 1 when sign-thresholded p agrees
  * with y, and `loss` is the logistic loss in the numerically STABLE
  * form `max(m,0) − m·y + log1p(exp(−|m|))` — the direct
  * `−y·log p − (1−y)·log(1−p)` underflows to −∞ once |m| ≳ 37
  * (1−p rounds to exactly 0), so a more separable corpus or a hotter
  * step size would crash the monotone-loss oracle; the stable form is
  * algebraically identical and finite for every float m.
  *
  * One expression replaces the pass body's three interpreted HOF
  * subtrees (dot, per-element transform, concat) with a single fused
  * primitive loop inside WholeStageCodegen — the per-pass cost of
  * distributed GD at 100 TB is exactly this row kernel, and the
  * interpreted form pays the measured ~50× lambda-dispatch penalty on
  * every element of every row of every pass. Null-intolerant; an x/w
  * length mismatch yields null (a truncated feature row must drop out
  * of the gradient sum, not contribute a prefix gradient). */
case class LogisticGradient(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), DoubleType)
  override def prettyName: String = "logistic_grad"

  override def nullSafeEval(xa: Any, wa: Any, ya: Any): Any = {
    val x = xa.asInstanceOf[ArrayData]
    val w = wa.asInstanceOf[ArrayData]
    val y = ya.asInstanceOf[Double]
    val n = x.numElements()
    if (n != w.numElements()) return null
    var m = 0.0
    var i = 0
    while (i < n) { m += x.getDouble(i) * w.getDouble(i); i += 1 }
    val p = 1.0 / (1.0 + math.exp(-m))
    val out = new Array[Double](n + 2)
    val d = p - y
    i = 0
    while (i < n) { out(i) = x.getDouble(i) * d; i += 1 }
    out(n) = math.max(m, 0.0) - m * y + math.log1p(math.exp(-math.abs(m)))
    out(n + 1) = if ((p >= 0.5) == (y == 1.0)) 1.0 else 0.0
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, wa, ya) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val out = ctx.freshName("out")
      s"""
         |int $n = $xa.numElements();
         |if ($n != $wa.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $m = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $m += $xa.getDouble($i) * $wa.getDouble($i);
         |  }
         |  double $p = 1.0 / (1.0 + java.lang.Math.exp(-$m));
         |  double[] $out = new double[$n + 2];
         |  double $d = $p - $ya;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = $xa.getDouble($i) * $d;
         |  }
         |  $out[$n] = java.lang.Math.max($m, 0.0) - $m * $ya
         |    + java.lang.Math.log1p(java.lang.Math.exp(-java.lang.Math.abs($m)));
         |  $out[$n + 1] = (($p >= 0.5) == ($ya == 1.0)) ? 1.0 : 0.0;
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object VectorExpressions {
  /** Column API for the native cosine expression. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API for the native squared-distance expression. */
  def squared_dist(a: Column, b: Column): Column =
    GraftBridge.column(SquaredDistance(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API for the native dot-product expression. */
  def dot_product(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API for the native integer dot-product expression. */
  def dot_product_int(a: Column, b: Column): Column =
    GraftBridge.column(DotProductInt(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API for the fused logistic-GD row kernel. */
  def logistic_grad(x: Column, w: Column, y: Column): Column =
    GraftBridge.column(LogisticGradient(
      GraftBridge.expression(x), GraftBridge.expression(w),
      GraftBridge.expression(y)))

  /** SQL API: after `register(spark)`, `spark.sql("SELECT cosine_sim(a,b)")`
    * resolves to the same native expression. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftBridge.registerFunction(spark, "cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)))
}
