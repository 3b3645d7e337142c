package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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
  * null-intolerant (null in → null out); arrays must be equal length
  * (shorter length used defensively).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // declared input types: the SQL surface would otherwise accept int
  // arrays and reinterpret their slots via getDouble (garbage results);
  // with these, analysis casts array<int> up or rejects outright
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
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
  * iteration. Null-intolerant; shorter length used defensively. */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def prettyName: String = "squared_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
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

  /** SQL API: after `register(spark)`, `spark.sql("SELECT cosine_sim(a,b)")`
    * resolves to the same native expression. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftBridge.registerFunction(spark, "cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)))
}
