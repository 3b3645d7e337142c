package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, DotProduct, DotProductInt, HllAggregate, InterleaveBits, LogisticGradient, PolyHash, SquaredDistance}

/** Session-extensions entry point: a cluster admin sets
  * `spark.sql.extensions=graft.GraftExtensions` (or a notebook builder
  * calls `.withExtensions(new GraftExtensions)`) and every session gets
  * graft's native expressions as first-class SQL functions — no per-session
  * `register(spark)` call, catalogs and views included. This is the
  * standard deployment path for third-party Catalyst extensions; the
  * per-session `GraftBridge.registerFunction` helpers remain for ad-hoc
  * use on sessions built without the config.
  *
  * Injected: `cosine_sim(a, b)`, `squared_dist(a, b)`, `dot_product(a,
  * b)`, `dot_product_int(a, b)`, `logistic_grad(x, w, y)` (codegen'd
  * vector kernels), `interleave_bits(x, y)` (Morton key), `hll_distinct(x[, p])`
  * (mergeable HLL aggregate); plus the [[graft.plans.BinnedRangeJoinRule]]
  * optimizer rule, which rewrites pure interval-containment joins (no
  * equi-key ⇒ Spark would nested-loop) into binned equi-joins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", classOf[CosineSimilarity]),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("squared_dist"),
      info("squared_dist", classOf[SquaredDistance]),
      (exprs: Seq[Expression]) => SquaredDistance(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", classOf[DotProduct]),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("dot_product_int"),
      info("dot_product_int", classOf[DotProductInt]),
      (exprs: Seq[Expression]) => DotProductInt(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("logistic_grad"),
      info("logistic_grad", classOf[LogisticGradient]),
      (exprs: Seq[Expression]) => LogisticGradient(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((FunctionIdentifier("interleave_bits"),
      info("interleave_bits", classOf[InterleaveBits]),
      (exprs: Seq[Expression]) => InterleaveBits(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("poly_hash"),
      info("poly_hash", classOf[PolyHash]),
      (exprs: Seq[Expression]) => PolyHash(exprs(0), mixed = false)))
    ext.injectFunction((FunctionIdentifier("poly_token_hash"),
      info("poly_token_hash", classOf[PolyHash]),
      (exprs: Seq[Expression]) => PolyHash(exprs(0), mixed = true)))
    ext.injectFunction((FunctionIdentifier("hll_distinct"),
      info("hll_distinct", HllAggregate.getClass),
      HllAggregate.sqlBuilder))
    ext.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
