package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of (backward) join: the whole-operator form of
  * `graft.operators.AsOfJoin`, taken down the last rung of the custom-op
  * ladder — a custom LogicalPlan node, planned by an injected Strategy into
  * a custom SparkPlan whose `doExecute` is a per-partition merge sweep.
  *
  * Why a physical operator when the union-window composition already works:
  * the composition pays one window sort over |L|+|R| UNIONED rows and
  * carries every probe column through the union (nulls on the state side
  * and vice versa). The native operator declares its real requirements to
  * the planner instead —
  *
  *   - `requiredChildDistribution`: both children hash-clustered on the
  *     key (EnsureRequirements co-partitions them exactly like a
  *     sort-merge join — same-key rows meet in the same partition);
  *   - `requiredChildOrdering`: each child sorted by (key, time) — the
  *     planner inserts the sorts, and PLANS AROUND them (an already-sorted
  *     child, e.g. a bucketed+sorted table, skips its sort entirely);
  *
  * and then `doExecute` is a single forward pass with O(1) state: for each
  * probe row, advance the state iterator while (key, time) ≤ the probe's,
  * remembering the last same-key row seen. No union row-widening, no
  * window buffer, no shuffle beyond the two key exchanges.
  *
  * Semantics (matches DuckDB `ASOF LEFT JOIN` and the composition): each
  * left row gets the payload of the LATEST right row with equal non-null
  * key and right.time ≤ left.time (ties: the same-timestamp state row IS
  * visible); left rows with no such state row get null payload. NULL keys
  * and NULL times never match. Output = left columns ++ payload columns.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute],
    forward: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  /** Everything this node consumes from its children: the whole left row
    * (it passes through) + key/time/payload on the right. ColumnPruning
    * uses this — the right child is prunable to exactly these columns. */
  override def references: AttributeSet =
    AttributeSet(left.output) ++ AttributeSet(
      Seq(leftKey, rightKey, leftTime, rightTime) ++ payload)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]; inject via
  * `GraftExtensions` (cluster conf) or [[AsOfJoinNative.install]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, payload, fwd) =>
      AsOfJoinExec(lk, rk, lt, rt, payload, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute],
    forward: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  // forward = earliest state with time ≥ probe time: the identical merge
  // sweep run in reverse time order (key order stays ascending)
  private def timeDir: SortDirection = if (forward) Descending else Ascending

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  // the same contract SortMergeJoin declares: cluster both children on the
  // key (EnsureRequirements makes the two hash partitionings compatible)
  // and sort each by (key, time) — sorts the planner can elide when a
  // child is already bucketed+sorted
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, timeDir)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, timeDir)))

  // probe rows stream through unchanged → left's partitioning and ordering
  // survive (a downstream op keyed the same way plans no new exchange)
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, timeDir))

  protected override def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val payloadAttrs = payload.map(_.withNullability(true))
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      // nulls-first, matching the Ascending child ordering we required
      def cmp(a: Any, b: Any, ord: Ordering[Any]): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else ord.compare(a, b)
      // time comparison in SWEEP order: backward sweeps time ascending
      // (nulls first), forward descending (nulls last — Descending's
      // default null ordering, matching requiredChildOrdering)
      def tcmp(a: Any, b: Any): Int =
        if (!forward) cmp(a, b, timeOrd)
        else if (a == null && b == null) 0
        else if (a == null) 1
        else if (b == null) -1
        else -timeOrd.compare(a, b)

      val lKeyTime = UnsafeProjection.create(Seq[Expression](leftKey, leftTime), left.output)
      // state rows projected to (key, time, payload...) once; candidates
      // are copied from this buffer when remembered
      val rView = UnsafeProjection.create(
        Seq[Expression](rightKey, rightTime) ++ payload, right.output)
      val pView = UnsafeProjection.create(
        payload.zipWithIndex.map { case (a, i) =>
          BoundReference(2 + i, a.dataType, nullable = true): Expression })
      val nullPayload = InternalRow.fromSeq(payloadAttrs.map(_ => null))
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(output, left.output ++ payloadAttrs)

      var rHead: UnsafeRow = null // rView's reusable buffer — copy to retain
      def advance(): Unit =
        rHead = if (rIter.hasNext) rView(rIter.next()) else null
      advance()
      var lastMatch: UnsafeRow = null // copy; valid only while keys equal

      lIter.map { lRow =>
        val lkt = lKeyTime(lRow)
        val lk = lkt.get(0, keyType)
        val lt = lkt.get(1, timeType)
        // consume state while (key, time) ≤ (lk, lt) in sweep order
        var go = rHead != null
        while (go) {
          val rk = rHead.get(0, keyType)
          val kc = cmp(rk, lk, keyOrd)
          if (kc < 0) advance()
          else if (kc == 0) {
            val rt = rHead.get(1, timeType)
            if (tcmp(rt, lt) <= 0) {
              if (rk != null && rt != null) lastMatch = rHead.copy()
              advance()
            } else go = false
          } else go = false
          if (rHead == null) go = false
        }
        // lt != null: NULL probe times never match. Backward order puts
        // null times first so no state is consumed for them, but forward
        // order (nulls last) consumes same-key state before a null-time
        // probe — without this guard it would take the earliest payload.
        val matched = lastMatch != null && lk != null && lt != null &&
          cmp(lastMatch.get(0, keyType), lk, keyOrd) == 0
        outProj(joined(lRow, if (matched) pView(lastMatch) else nullPayload))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinNative {

  /** Idempotently add the strategy to a session built without
    * `spark.sql.extensions=graft.GraftExtensions`. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** Native-operator twin of `AsOfJoin.backward` — same signature, same
    * output schema (left columns ++ `asof_<payload>` columns).
    * Requires key and time dataTypes to match across sides; left and right
    * must not share attribute ids (alias a self-joined side first). */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String]): DataFrame =
    join(left, right, keyCol, timeCol, payloadCols, forward = false)

  /** Forward as-of: each left row gets the EARLIEST right row with equal
    * key and right.time ≥ left.time (the "next quote after the trade"
    * direction DuckDB expresses as ASOF on negated time). */
  def forward(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String]): DataFrame =
    join(left, right, keyCol, timeCol, payloadCols, forward = true)

  private def join(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String], forward: Boolean): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
    val (lk, rk) = (attr(lPlan, keyCol), attr(rPlan, keyCol))
    val (lt, rt) = (attr(lPlan, timeCol), attr(rPlan, timeCol))
    require(lk.dataType == rk.dataType, s"key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType, s"time types differ: ${lt.dataType} vs ${rt.dataType}")
    require(lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "left and right share attribute ids (self-join?) — alias one side " +
        "(df.select(df.columns.map(c => col(c).as(c)): _*)) before joining")
    val node = AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt,
      payloadCols.map(attr(rPlan, _)), forward)
    GraftBridge.ofRows(spark, node)
      .toDF(left.columns ++ payloadCols.map("asof_" + _): _*)
  }
}
