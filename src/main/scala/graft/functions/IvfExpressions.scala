package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructType}

/** Row-local kernel behind [[NearestCellsRank]], shared verbatim by eval
  * and generated code (the `PqKernels.round6` channel). */
object IvfKernels {
  /** Top-`nprobe` centroids of `emb` by (round(cosine, 6) DESC, centroid
    * index ASC), as array<struct<ci int, cos_c double>> sorted by rank.
    * `norms` carries sqrt(Σ c²) per centroid precomputed once at plan
    * build — `sqrt(nx) * norms(ci)` is bit-identical to
    * [[CosineSimilarity]]'s `sqrt(nx) * sqrt(ny)` denominator, and the
    * dot loop accumulates in the same j-ascending order, so every rounded
    * cosine equals the compositional `round(cosine_sim(emb, centroid), 6)`
    * exactly. Ties keep the LOWER centroid index (strict `>` on a
    * candidate scanned in ci-ascending order), which is the
    * `ORDER BY cos DESC, label ASC` decision when the centroid array is
    * label-sorted. Returns null on a dimension mismatch (the PqEncode
    * contract: a truncated embedding must drop out, not rank on a
    * prefix); an empty centroid set yields an empty array. */
  def nearestCells(emb: ArrayData, cents: Array[Array[Double]],
      norms: Array[Double], nprobe: Int): ArrayData = {
    val k = cents.length
    if (k == 0) return new GenericArrayData(Array.empty[Any])
    val dim = cents(0).length
    if (emb.numElements() != dim) return null
    var nx = 0.0
    var j = 0
    while (j < dim) { val v = emb.getDouble(j); nx += v * v; j += 1 }
    val sx = math.sqrt(nx)
    val m = math.min(nprobe, k)
    val bestCos = new Array[Double](m)
    val bestCi = new Array[Int](m)
    var cnt = 0
    var ci = 0
    while (ci < k) {
      val c = cents(ci)
      var dot = 0.0
      j = 0
      while (j < dim) { dot += emb.getDouble(j) * c(j); j += 1 }
      val denom = sx * norms(ci)
      val cos = PqKernels.round6(if (denom == 0.0) 0.0 else dot / denom)
      if (cnt < m) {
        var p = cnt
        while (p > 0 && bestCos(p - 1) < cos) {
          bestCos(p) = bestCos(p - 1); bestCi(p) = bestCi(p - 1); p -= 1
        }
        bestCos(p) = cos; bestCi(p) = ci
        cnt += 1
      } else if (cos > bestCos(m - 1)) {
        var p = m - 1
        while (p > 0 && bestCos(p - 1) < cos) {
          bestCos(p) = bestCos(p - 1); bestCi(p) = bestCi(p - 1); p -= 1
        }
        bestCos(p) = cos; bestCi(p) = ci
      }
      ci += 1
    }
    val out = new Array[Any](cnt)
    var r = 0
    while (r < cnt) {
      out(r) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bestCi(r), bestCos(r)))
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** Fused nearest-cells ranking: emb (array<double>) → the `nprobe` best
  * centroids as array<struct<ci int, cos_c double>>, rank order =
  * (rounded cosine DESC, centroid index ASC).
  *
  * Why fused (guide §2.4 — remove shuffles outright): the compositional
  * form was `vecs CROSS JOIN broadcast(cents)` + `row_number() OVER
  * (PARTITION BY vec_id ORDER BY cos_c DESC, c_label ASC)` — the window
  * shuffles corpus × k rows and sorts every group for a decision that is
  * ROW-LOCAL given broadcast centroids. This expression makes the whole
  * assignment one projection: no Exchange, no Sort, corpus-scan shape at
  * any scale. Centroids travel as ONE reference object (the [[PqEncode]]
  * channel) pre-sorted by label, so the index-ASC tiebreak reproduces the
  * label-ASC tiebreak; callers re-attach the label via `element_at` on a
  * tiny literal array. Per-centroid norms are precomputed once at plan
  * build — `sqrt(nx)·norm(ci)` is bit-identical to [[CosineSimilarity]]'s
  * two-sqrt denominator. Null-intolerant; a dimension mismatch yields
  * null (PqEncode contract — the window form instead ranked such rows on
  * null cosines; no fixture or production embedding is dimension-mixed,
  * and the oracle gate fails loudly by name if one ever is). */
case class NearestCellsRank(child: Expression, cents: Seq[Seq[Double]],
    nprobe: Int) extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(
    new StructType().add("ci", IntegerType, nullable = false)
      .add("cos_c", DoubleType, nullable = false), containsNull = false)
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def prettyName: String = "nearest_cells"

  @transient private lazy val centArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val normArr: Array[Double] =
    centArr.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  override def nullSafeEval(e: Any): Any =
    IvfKernels.nearestCells(e.asInstanceOf[ArrayData], centArr, normArr, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfCents", centArr, "double[][]")
    val normsRef = ctx.addReferenceObj("ivfNorms", normArr, "double[]")
    nullSafeCodeGen(ctx, ev, e => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.IvfKernels.nearestCells($e, $centsRef, $normsRef, $nprobe);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IvfExpressions {
  /** Column API for the fused nearest-cells ranking. */
  def nearest_cells(emb: Column, cents: Seq[Seq[Double]], nprobe: Int): Column =
    GraftBridge.column(NearestCellsRank(GraftBridge.expression(emb), cents, nprobe))
}
