package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Bounded-memory top-k per group as a typed `Aggregator`.
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy(ord))
  * <= k`) shuffles EVERY row of every group and sorts whole groups — at
  * 100 TB, a group with 10⁹ rows pays a 10⁹ sort for a k=5 answer. This
  * aggregator keeps a k-bounded buffer, is partial-aggregable (map-side
  * combine), and therefore shuffles at most k rows per partition per group:
  * cost O(n log k) scan + O(parts·k) shuffle, independent of group size.
  *
  * Ordering: (ts desc, id desc) — matches `LensQueries.tailNPerKey`, so the
  * same DuckDB window oracle verifies this implementation.
  */
object TopK {

  val K = 5

  /** The one bounded-top-k Aggregator, generic in the row type and order.
    * Buffer is a ≤k sorted list; reduce/merge re-sort a ≤k+1 / ≤2k list —
    * O(k log k) per row with tiny constants at the k this engine uses.
    * Both concrete orders below share this single implementation so an
    * encoder or insertion fix can never be applied to one and missed on
    * the other. */
  class BoundedTopK[T: scala.reflect.runtime.universe.TypeTag](
      k: Int, ord: Ordering[T]) extends Aggregator[T, List[T], Seq[T]] {
    override def zero: List[T] = Nil
    // Short-circuit (r19, the BoundedKth pattern): a row sorting STRICTLY
    // after a full buffer's worst can never enter the top-k — most rows of
    // a large group exit on this one comparison instead of paying the
    // O(k log k) re-sort (the sort was ~half the ANN tiers' task time).
    // STRICT, not lteq: on a tie with the worst, the stable sort path
    // keeps the NEW element (prepended) — rows tying the boundary must
    // still take that path so results stay bit-identical.
    override def reduce(b: List[T], a: T): List[T] =
      if (b.lengthCompare(k) >= 0 && ord.compare(b.last, a) < 0) b
      else (a :: b).sorted(ord).take(k)
    override def merge(x: List[T], y: List[T]): List[T] =
      (x ++ y).sorted(ord).take(k)
    override def finish(b: List[T]): Seq[T] = b.sorted(ord)
    override def bufferEncoder: Encoder[List[T]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[T]]()
    override def outputEncoder: Encoder[Seq[T]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[T]]()
  }

  /** The k-th BEST element under `ord` (the boundary of the top-k set), as
    * a single row instead of k collected rows — the shape a selection
    * threshold wants: "keep the top ⌈frac·N⌉" becomes one bounded-heap
    * aggregate, one collected scalar, one broadcast filter — no global
    * sort, no single-partition window, no k-row driver collect. Same
    * bounded buffer and map-side combine as [[BoundedTopK]], plus a
    * short-circuit: a row no better than the current k-th never touches
    * the buffer, so the common-case reduce is one comparison.
    *
    * `finish` on fewer than k total rows returns the WORST row seen — a
    * threshold that admits everything, which is exactly right when
    * ⌈frac·N⌉ ≥ N. Callers guard the zero-row case (no threshold exists).
    * Buffers are O(k): for large selections, bracket the boundary with a
    * rank-guaranteed quantile sketch first and run this heap over the
    * narrow refine band only — `Curation.dsirWeights` is the pattern
    * (sketch brackets ⇒ k′ = k − definitely-selected ≈ εN seats). */
  class BoundedKth[T: scala.reflect.runtime.universe.TypeTag](
      k: Int, ord: Ordering[T]) extends Aggregator[T, List[T], T] {
    require(k >= 1, s"k must be >= 1, got $k")
    override def zero: List[T] = Nil
    override def reduce(b: List[T], a: T): List[T] =
      if (b.lengthCompare(k) >= 0 && ord.lteq(b.last, a)) b
      else (a :: b).sorted(ord).take(k)
    override def merge(x: List[T], y: List[T]): List[T] =
      (x ++ y).sorted(ord).take(k)
    override def finish(b: List[T]): T = b.last
    override def bufferEncoder: Encoder[List[T]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[T]]()
    override def outputEncoder: Encoder[T] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[T]()
  }

  /** (hash, doc_id) ascending — the deterministic sample-rank order the
    * stratified/cluster samplers draw with: the k smallest
    * (xxhash64(doc_id, seed), doc_id) per group IS the membership the
    * window form `row_number().over(orderBy(h, doc_id)) <= k` selects,
    * without ever sorting a whole group in one task. */
  case class DocH(h: Long, doc_id: Long)
  object DocH {
    val ord: Ordering[DocH] = Ordering.by(d => (d.h, d.doc_id))
  }

  class DocHTopKAgg(k: Int) extends BoundedTopK[DocH](k, DocH.ord)

  /** (log-weight, doc_id) — DSIR's selection order: weight DESC, doc_id
    * ASC tiebreak (identical to the oracle's ROW_NUMBER ordering). */
  case class DocW(lw: Double, doc_id: Long)
  object DocW {
    val ord: Ordering[DocW] = Ordering.by(d => (-d.lw, d.doc_id))
  }

  class DocKthAgg(k: Int) extends BoundedKth[DocW](k, DocW.ord)

  /** (sortTs, id, payload) — the id doubles as the deterministic tiebreak. */
  case class Item(ts: Long, id: Long, value: Double)

  class TopKAgg(k: Int)
    extends BoundedTopK[Item](k, Ordering.by(i => (-i.ts, -i.id)))

  /** (score DESC, id ASC) bounded top-k — the ANN tiers' re-rank order.
    * The brute tier's old `row_number() over (partition by q_id)` re-rank
    * put ALL N scored rows of a query into one partition for a full sort —
    * at 100× scale, nQueries single-task full-corpus sorts; this keeps the
    * scan distributed and the shuffle k-bounded. Field names match the ANN
    * output schema so consumers project the exploded struct directly. */
  case class Scored(vec_id: Long, cosine: Double)

  class ScoreTopKAgg(k: Int)
    extends BoundedTopK[Scored](k, Ordering.by(s => (-s.cosine, s.vec_id)))

  /** Candidate row of the fused two-stage re-rank (r19): the stage-1
    * approximate score (ADC / int8 dot) AND the exact rounded cosine ride
    * together as three primitive scalars. The first fused form carried the
    * candidate's float embedding through the heap instead (ScoredEmb) and
    * computed cosine on the m survivors — identical decisions, but every
    * scored row paid the encoder's array→Seq conversion on a dim-sized
    * payload and the survivors paid a second udaf aggregation pass.
    * Computing the cosine INLINE (same `round(cosine_sim, 6)` expression,
    * same emb values — exact same numbers) makes the scored row 24 bytes
    * and the whole tail ONE bounded aggregation. */
  case class Scored2(vec_id: Long, qscore: Double, cosine: Double)

  /** The fused tail: keep the top-m candidates per query by stage-1 score
    * — exactly [[ScoreTopKAgg]]'s (score DESC, vec_id ASC) decisions —
    * then finish by re-ranking those m survivors by exact cosine through
    * the SAME (cosine DESC, vec_id ASC) order the old second-stage heap
    * used, cut to k. One ObjectHashAggregate, one exchange, buffer
    * m-bounded (3 scalars per entry). */
  class RerankTopKAgg(m: Int, k: Int)
      extends Aggregator[Scored2, List[Scored2], Seq[Scored]] {
    private val stage1: Ordering[Scored2] = Ordering.by(s => (-s.qscore, s.vec_id))
    override def zero: List[Scored2] = Nil
    // same strict short-circuit as [[BoundedTopK]]: losers exit on one
    // comparison, boundary ties still take the stable-sort path
    override def reduce(b: List[Scored2], a: Scored2): List[Scored2] =
      if (b.lengthCompare(m) >= 0 && stage1.compare(b.last, a) < 0) b
      else (a :: b).sorted(stage1).take(m)
    override def merge(x: List[Scored2], y: List[Scored2]): List[Scored2] =
      (x ++ y).sorted(stage1).take(m)
    override def finish(b: List[Scored2]): Seq[Scored] =
      b.sortBy(s => (-s.cosine, s.vec_id)).take(k)
        .map(s => Scored(s.vec_id, s.cosine))
    override def bufferEncoder: Encoder[List[Scored2]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored2]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Scored neighbor with its label riding as an order-inert payload —
    * the label-noise audit's fused shape (r19). Labels keep the
    * embeddings table's native INT type so the vote tiebreak is the same
    * integer order the relational form used. */
  case class ScoredLab(vec_id: Long, cosine: Double, nbr_label: Int,
      q_label: Int)

  /** The label-vote result of one anchor's k nearest neighbors. */
  case class LabelVote(majority_label: Int, majority_count: Long,
      n_agree: Long)

  /** Fused kNN + majority vote (r19): keep the k nearest neighbors per
    * anchor through [[ScoreTopKAgg]]'s exact (cosine DESC, vec_id ASC)
    * heap order — the labels are payload — then finish() runs the vote the
    * old plan spelled as a second corpus scan + broadcast join + two keyed
    * aggregations: count per neighbor label, majority = max count with
    * smallest-label tiebreak (native int order — exactly what
    * min(struct(-cnt, nbr_label)) selected), n_agree = neighbors sharing
    * the anchor's own label. */
  class LabelVoteAgg(k: Int)
      extends Aggregator[ScoredLab, List[ScoredLab], LabelVote] {
    private val ord: Ordering[ScoredLab] = Ordering.by(s => (-s.cosine, s.vec_id))
    override def zero: List[ScoredLab] = Nil
    override def reduce(b: List[ScoredLab], a: ScoredLab): List[ScoredLab] =
      if (b.lengthCompare(k) >= 0 && ord.compare(b.last, a) < 0) b
      else (a :: b).sorted(ord).take(k)
    override def merge(x: List[ScoredLab], y: List[ScoredLab]): List[ScoredLab] =
      (x ++ y).sorted(ord).take(k)
    override def finish(b: List[ScoredLab]): LabelVote = {
      val cnts = b.groupBy(_.nbr_label).view.mapValues(_.size.toLong).toSeq
      val (mjLabel, mjCnt) = cnts.reduceLeft { (a, c) =>
        if (c._2 > a._2 || (c._2 == a._2 && c._1 < a._1)) c else a
      }
      val qLabel = b.head.q_label // constant within the group
      LabelVote(mjLabel, mjCnt,
        cnts.collectFirst { case (l, n) if l == qLabel => n }.getOrElse(0L))
    }
    override def bufferEncoder: Encoder[List[ScoredLab]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[ScoredLab]]()
    override def outputEncoder: Encoder[LabelVote] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[LabelVote]()
  }

  /** (value ASC, event_id ASC) bounded top-k with the row's coarse key
    * riding as payload — the rank-battery's heap (r19): the first 8 rows
    * of the total (value, event_id) order per type, without sorting the
    * whole partition in one task. */
  case class RankItem(event_id: Long, value: Double, f: Long)

  class RankTopKAgg(k: Int)
    extends BoundedTopK[RankItem](k, Ordering.by(i => (i.value, i.event_id)))

  /** Latest-K events per event_type — identical semantics (and oracle) to
    * the window-based `q_tail_n_per_key`, different physics. */
  def tailKHeap(spark: SparkSession, dir: String, k: Int = K): DataFrame = {
    val topk = udaf(new TopKAgg(k), Encoders.product[Item])
    Tables.events(spark, dir)
      .select(col("event_type"),
        struct(
          unix_micros(col("ts")).as("ts"),
          col("event_id").as("id"),
          col("value").as("value")).as("item"))
      .groupBy("event_type")
      .agg(topk(col("item.ts"), col("item.id"), col("item.value")).as("top"))
      .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "it")))
      .select(col("event_type"), col("it.id").as("event_id"),
        (col("pos") + 1).cast("int").as("rn"),
        date_format(timestamp_micros(col("it.ts")), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        col("it.value").as("value"))
  }
}
