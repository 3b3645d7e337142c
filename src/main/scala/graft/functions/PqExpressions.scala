package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Shared kernels for the fused product-quantizer expressions. `round6`
  * replicates Catalyst `round(x, 6)` on DoubleType EXACTLY
  * (`RoundBase`: BigDecimal.valueOf → setScale(HALF_UP) → toDouble;
  * NaN/Inf pass through) — the PQ chain's argmin compares ROUNDED
  * distances so the grid stays stable across engines, and the fused
  * encode must make the identical decisions the compositional
  * `round(squared_dist(...), 6)` form made (PqExprSpec pins bit
  * equality over the whole fixture corpus; the DuckDB oracle is the
  * final arbiter). */
object PqKernels {
  def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}

/** Fused product-quantizer ENCODE: emb (array<double>, dim = nsub·sub) →
  * array<int> of nsub codes, code_s = argmin over ci of
  * round(‖emb_slice_s − cb(s)(ci)‖², 6), ties to the LOWER code index —
  * the same decision rule as the compositional
  * `array_min(array(struct(round(squared_dist(slice, lit-array)), ci)))`
  * form, in ONE expression.
  *
  * Why fused: the compositional form folds nsub × ncode literal-array
  * subtrees (160 at the defaults) into the projection — the generated
  * code is huge, and the Janino compile of it was the dominant constant
  * of every PQ bench entry (~2-5 s per distinct plan; SCALE.md r10
  * adjudication). Here the codebooks travel as ONE reference object
  * (`references[...]`, the standard Catalyst literal-object channel) and
  * the generated code is a three-level primitive loop — compact to
  * compile, and the inner accumulation order (slice-ascending) is
  * IDENTICAL to squared_dist's, so every rounded distance is
  * bit-identical. Null-intolerant; an embedding whose length ≠ nsub·sub
  * yields null — on UnsafeArrayData an unguarded `getDouble` past the
  * end is an unchecked off-heap read (silent garbage codes), where the
  * compositional slice form degraded to null. */
case class PqEncode(child: Expression,
    cb: Seq[Seq[Seq[Double]]]) extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def prettyName: String = "pq_encode"

  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    cb.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(e: Any): Any = {
    val emb = e.asInstanceOf[ArrayData]
    val nsub = cbArr.length
    val ncode = cbArr(0).length
    val sub = cbArr(0)(0).length
    if (emb.numElements() != nsub * sub) return null
    val codes = new Array[Int](nsub)
    var s = 0
    while (s < nsub) {
      var bestD = Double.PositiveInfinity
      var bestCi = 0
      var ci = 0
      while (ci < ncode) {
        var d2 = 0.0
        var i = 0
        while (i < sub) {
          val d = emb.getDouble(s * sub + i) - cbArr(s)(ci)(i)
          d2 += d * d
          i += 1
        }
        val d2r = PqKernels.round6(d2)
        if (d2r < bestD) { bestD = d2r; bestCi = ci }
        ci += 1
      }
      codes(s) = bestCi
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cbArr, "double[][][]")
    nullSafeCodeGen(ctx, ev, e => {
      val nsub = ctx.freshName("nsub")
      val ncode = ctx.freshName("ncode")
      val sub = ctx.freshName("sub")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val ci = ctx.freshName("ci")
      val i = ctx.freshName("i")
      val d2 = ctx.freshName("d2")
      val d = ctx.freshName("d")
      val d2r = ctx.freshName("d2r")
      val bestD = ctx.freshName("bestD")
      val bestCi = ctx.freshName("bestCi")
      s"""
         |int $nsub = $cbRef.length;
         |int $ncode = $cbRef[0].length;
         |int $sub = $cbRef[0][0].length;
         |if ($e.numElements() != $nsub * $sub) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$nsub];
         |  for (int $s = 0; $s < $nsub; $s++) {
         |    double $bestD = Double.POSITIVE_INFINITY;
         |    int $bestCi = 0;
         |    for (int $ci = 0; $ci < $ncode; $ci++) {
         |      double $d2 = 0.0;
         |      for (int $i = 0; $i < $sub; $i++) {
         |        double $d = $e.getDouble($s * $sub + $i) - $cbRef[$s][$ci][$i];
         |        $d2 += $d * $d;
         |      }
         |      double $d2r = graft.functions.PqKernels.round6($d2);
         |      if ($d2r < $bestD) { $bestD = $d2r; $bestCi = $ci; }
         |    }
         |    $codes[$s] = $bestCi;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused ADC (asymmetric distance computation) score: query floats ×
  * looked-up codewords, Σ_s dot(q_slice_s, cb(s)(codes_s)) — the same
  * per-subspace-dot-then-sum order as the compositional
  * `dot_product(slice, element_at(lit-table, code+1)).reduce(+)` form,
  * so scores are bit-identical; same fused-vs-160-subtree compile
  * rationale as [[PqEncode]]. left = q_emb (array<double>), right =
  * codes (array<int>). Null-intolerant; null when the query's length ≠
  * nsub·sub, the code array is shorter than nsub, or any code value is
  * outside [0, ncode) (unchecked off-heap reads / AIOOBE inside
  * generated code otherwise — a stored or streamed code table read
  * against RETRAINED codebooks with a smaller ncode must degrade to a
  * null score exactly like the compositional `element_at` form did,
  * not throw mid-stage — see [[PqEncode]]). */
case class PqAdc(left: Expression, right: Expression,
    cb: Seq[Seq[Seq[Double]]]) extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(IntegerType))
  override def prettyName: String = "pq_adc"

  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    cb.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(q: Any, c: Any): Any = {
    val qe = q.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    val nsub = cbArr.length
    val ncode = cbArr(0).length
    val sub = cbArr(0)(0).length
    if (qe.numElements() != nsub * sub || codes.numElements() < nsub) return null
    var total = 0.0
    var s = 0
    while (s < nsub) {
      val code = codes.getInt(s)
      if (code < 0 || code >= ncode) return null
      val cw = cbArr(s)(code)
      var ds = 0.0
      var i = 0
      while (i < sub) { ds += qe.getDouble(s * sub + i) * cw(i); i += 1 }
      total += ds
      s += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cbArr, "double[][][]")
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val nsub = ctx.freshName("nsub")
      val ncode = ctx.freshName("ncode")
      val sub = ctx.freshName("sub")
      val total = ctx.freshName("total")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val ds = ctx.freshName("ds")
      val cw = ctx.freshName("cw")
      val code = ctx.freshName("code")
      val bad = ctx.freshName("bad")
      s"""
         |int $nsub = $cbRef.length;
         |int $ncode = $cbRef[0].length;
         |int $sub = $cbRef[0][0].length;
         |if ($q.numElements() != $nsub * $sub || $c.numElements() < $nsub) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $bad = false;
         |  double $total = 0.0;
         |  for (int $s = 0; $s < $nsub; $s++) {
         |    int $code = $c.getInt($s);
         |    if ($code < 0 || $code >= $ncode) { $bad = true; break; }
         |    double[] $cw = $cbRef[$s][$code];
         |    double $ds = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      $ds += $q.getDouble($s * $sub + $i) * $cw[$i];
         |    }
         |    $total += $ds;
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $total; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Fused Lloyd ASSIGNMENT for PQ training: emb → array<double> of length
  * 2·nsub, positions [0, nsub) the nearest-codeword index per subspace
  * (as exact small-integer doubles) and [nsub, 2·nsub) the corresponding
  * UNROUNDED squared distances. Training assigns on raw d2 (the search
  * encode rounds to keep the oracle grid portable; Lloyd never leaves
  * the JVM, so it keeps full precision — this matches the historical
  * `min(struct(d2, ci))` aggregate bit-for-bit: strict `<` keeps the
  * lower code index on ties). Replaces the corpus × nsub × ncode
  * broadcast-join + groupBy-min round shape with one projection — 160×
  * less intermediate volume per round at the default geometry, the
  * difference between a scan and a wide shuffle at 100 TB.
  * Null-intolerant; length ≠ nsub·sub → null (see [[PqEncode]]). */
case class PqAssign(child: Expression,
    cb: Seq[Seq[Seq[Double]]]) extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def prettyName: String = "pq_assign"

  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    cb.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(e: Any): Any = {
    val emb = e.asInstanceOf[ArrayData]
    val nsub = cbArr.length
    val ncode = cbArr(0).length
    val sub = cbArr(0)(0).length
    if (emb.numElements() != nsub * sub) return null
    val out = new Array[Double](2 * nsub)
    var s = 0
    while (s < nsub) {
      var bestD = Double.PositiveInfinity
      var bestCi = 0
      var ci = 0
      while (ci < ncode) {
        var d2 = 0.0
        var i = 0
        while (i < sub) {
          val d = emb.getDouble(s * sub + i) - cbArr(s)(ci)(i)
          d2 += d * d
          i += 1
        }
        if (d2 < bestD) { bestD = d2; bestCi = ci }
        ci += 1
      }
      out(s) = bestCi.toDouble
      out(nsub + s) = bestD
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cbArr, "double[][][]")
    nullSafeCodeGen(ctx, ev, e => {
      val nsub = ctx.freshName("nsub")
      val ncode = ctx.freshName("ncode")
      val sub = ctx.freshName("sub")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val ci = ctx.freshName("ci")
      val i = ctx.freshName("i")
      val d2 = ctx.freshName("d2")
      val d = ctx.freshName("d")
      val bestD = ctx.freshName("bestD")
      val bestCi = ctx.freshName("bestCi")
      s"""
         |int $nsub = $cbRef.length;
         |int $ncode = $cbRef[0].length;
         |int $sub = $cbRef[0][0].length;
         |if ($e.numElements() != $nsub * $sub) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[2 * $nsub];
         |  for (int $s = 0; $s < $nsub; $s++) {
         |    double $bestD = Double.POSITIVE_INFINITY;
         |    int $bestCi = 0;
         |    for (int $ci = 0; $ci < $ncode; $ci++) {
         |      double $d2 = 0.0;
         |      for (int $i = 0; $i < $sub; $i++) {
         |        double $d = $e.getDouble($s * $sub + $i) - $cbRef[$s][$ci][$i];
         |        $d2 += $d * $d;
         |      }
         |      if ($d2 < $bestD) { $bestD = $d2; $bestCi = $ci; }
         |    }
         |    $out[$s] = (double) $bestCi;
         |    $out[$nsub + $s] = $bestD;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqExpressions {
  /** Column API for the fused PQ encode. */
  def pq_encode(emb: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(emb), cb))

  /** Column API for the fused ADC score. */
  def pq_adc(qEmb: Column, codes: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(PqAdc(
      GraftBridge.expression(qEmb), GraftBridge.expression(codes), cb))

  /** Column API for the fused Lloyd assignment. */
  def pq_assign(emb: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(PqAssign(GraftBridge.expression(emb), cb))
}
