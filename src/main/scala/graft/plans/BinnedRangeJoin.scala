package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a pure range (interval-containment) join into a
  * binned equi-join.
  *
  * A join whose only cross-side predicates are `lo <= t` and `t <= hi` has
  * no equi-key for Catalyst to extract, so Spark plans it as a
  * BroadcastNestedLoopJoin (or a cartesian product) — O(|L|·|R|) compares,
  * the classic scale-killer for "which interval contains this event"
  * queries. The scalable formulation quantizes both sides to fixed-width
  * bins: the point side computes `floor(t / W)`, the interval side explodes
  * into every bin it overlaps, the join becomes an equi-join on the bin
  * (hash-partitionable, AQE-skew-splittable) and the original predicate is
  * re-applied as the residual condition. Identical semantics for ANY bin
  * width; W only tunes the bins-per-interval × rows-per-bin trade-off
  * (`graft.operators.RangeJoin` documents the same construction as a manual
  * API — this rule applies it to plans the user wrote declaratively).
  *
  * Fires only when ALL hold (conservative by construction):
  *  - inner join whose condition contains NO cross-side equality
  *    (if one exists, Catalyst already plans a hash/sort-merge join);
  *  - some expression `t` evaluable on one side alone is bounded both
  *    below and above by deterministic expressions evaluable on the other
  *    side alone (any mix of strict/non-strict bounds);
  *  - `t`, `lo`, `hi` are all timestamps or numerics.
  *
  * Correctness notes baked into the rewrite:
  *  - intervals with `lo > hi` or a NULL bound match nothing in the
  *    original join; a `Filter(lo <= hi)` guards the interval side so
  *    `sequence(...)` never sees a descending range (it would throw);
  *  - a NULL `t` maps to a NULL bin and is dropped by the equi-join,
  *    matching the original NULL-comparison semantics;
  *  - the full original condition is kept as residual, so the rewrite can
  *    never emit a row the original join would not have;
  *  - bin exprs use the same `floor(seconds / W)` on both sides, and
  *    `floor` is monotone, so every `t ∈ [lo, hi]` lands in a bin the
  *    interval emitted — no row the original join emits is lost.
  *
  * Session wiring: `spark.sql.extensions=graft.GraftExtensions` (cluster
  * deployment) or [[BinnedRangeJoinRule.install]] (ad-hoc session). Confs:
  * `spark.graft.rangeJoin.enabled` (default true),
  * `spark.graft.rangeJoin.binSize` — bin width in seconds for timestamps /
  * value units for numerics (default 3600).
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledConf = "spark.graft.rangeJoin.enabled"
  val BinSizeConf = "spark.graft.rangeJoin.binSize"

  /** Idempotently add the rule to a session built without the extensions
    * static conf (`spark.experimental` is the sanctioned post-hoc hook). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled =
      try conf.getConfString(EnabledConf, "true").toBoolean
      catch { case _: IllegalArgumentException => true }
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) => rewrite(j).getOrElse(j)
    }
  }

  /** Seconds-scale double view of a timestamp/numeric expression; None for
    * unsupported types. ANSI-safe: timestamps go through UnixMicros (cast
    * timestamp→numeric is an ANSI error), numerics widen to double. */
  private def seconds(e: Expression): Option[Expression] = e.dataType match {
    case TimestampType => Some(Divide(Cast(UnixMicros(e), DoubleType), Literal(1e6)))
    case _: NumericType => Some(Cast(e, DoubleType))
    case _ => None
  }

  private def bin(e: Expression, w: Double): Expression =
    Floor(Divide(seconds(e).get, Literal(w)))

  /** One comparison read both ways: `a >= b` is a lower bound on point `a`
    * AND an upper bound on point `b`. (point, bound, isLower) */
  private def boundViews(p: Expression): Seq[(Expression, Expression, Boolean)] =
    p match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
      case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
      case _                        => Seq.empty
    }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val cond = j.condition.get
    val preds = splitConjunctivePredicates(cond)

    def sided(e: Expression): Option[Boolean] = { // Some(true) = left-only
      val l = canEvaluate(e, j.left); val r = canEvaluate(e, j.right)
      if (l && !r) Some(true) else if (r && !l) Some(false) else None
    }

    // an extractable cross-side equality means Catalyst already has an
    // equi-join — never touch those plans
    val hasEqui = preds.exists {
      case EqualTo(a, b) => (for (sa <- sided(a); sb <- sided(b)) yield sa != sb).getOrElse(false)
      case EqualNullSafe(a, b) => (for (sa <- sided(a); sb <- sided(b)) yield sa != sb).getOrElse(false)
      case _ => false
    }
    if (hasEqui) return None

    // candidate bounds: point entirely from one side, bound entirely from
    // the other, all deterministic, all binnable types
    val candidates = preds.flatMap(boundViews).flatMap {
      case (point, bound, isLower) =>
        for {
          ps <- sided(point); bs <- sided(bound)
          if ps != bs && point.deterministic && bound.deterministic
          if seconds(point).isDefined && seconds(bound).isDefined
        } yield (point, bound, isLower, ps)
    }
    val (lowers, uppers) = candidates.partition(_._3)
    val pair = lowers.flatMap { case (p, lo, _, side) =>
      uppers.find { case (p2, _, _, side2) => side == side2 && p.semanticEquals(p2) }
        .map { case (_, hi, _, _) => (p, lo, hi, side) }
    }.headOption
    pair.map { case (point, lo, hi, pointOnLeft) =>
      val w = {
        val parsed =
          try conf.getConfString(BinSizeConf, "3600").toDouble
          catch { case _: NumberFormatException => 3600.0 }
        // w <= 0 would divide-by-zero into NULL bins (silently dropping
        // every row in non-ANSI mode) or hand Sequence a descending range
        if (parsed.isNaN || parsed <= 0) 3600.0 else parsed
      }
      val (pointPlan, rangePlan) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

      val binP = Alias(bin(point, w), "__graft_bin_p")()
      val newPointSide = Project(pointPlan.output :+ binP, pointPlan)

      // inverted/NULL intervals match nothing originally; the guard also
      // keeps sequence() ascending (it throws on a descending range)
      val guarded = Filter(LessThanOrEqual(seconds(lo).get, seconds(hi).get), rangePlan)
      val seqE = Sequence(bin(lo, w), bin(hi, w), Some(Literal(1L)),
        Some(conf.sessionLocalTimeZone))
      val elemNullable = seqE.dataType.asInstanceOf[ArrayType].containsNull
      val binR = AttributeReference("__graft_bin_r", LongType, nullable = elemNullable)()
      val exploded = Generate(Explode(seqE), Nil, outer = false, None, Seq(binR), guarded)

      val newCond = And(EqualTo(binP.toAttribute, binR), cond)
      val (nl, nr) = if (pointOnLeft) (newPointSide, exploded) else (exploded, newPointSide)
      Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))
    }
  }
}
