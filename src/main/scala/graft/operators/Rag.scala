package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.functions.VectorExpressions.cosine_sim

/** Passage retrieval end-to-end — the RAG indexing/query path composed
  * from the repo's own stages: sliding-window chunking ([[Packing]]'s
  * kernel) → feature-hash chunk embeddings ([[TextEmbed]]'s kernel) →
  * exact cosine top-k over passages (the [[Similarity]] contract), with
  * chunk provenance (source doc, window position, content digest) carried
  * to the result. Queries are each query doc's OPENING chunk (chunk 0),
  * so one embed chain serves both sides; a query's own passages are
  * excluded (they'd trivially top-rank).
  *
  * Chunk identity is arithmetic — chunk_id = doc_id·4096 + chunk_pos — so
  * provenance needs no join on the scoring path (src_doc = chunk_id//4096
  * is a projection); only the nQueries×k winners join back to the chunk
  * table for the digest. The 12-bit position field bounds docs at 4096
  * chunks (window 32 / stride 16 ⇒ ~65k tokens) and doc ids at 2^51; a
  * longer-doc deployment widens the shift or keys by struct.
  *
  * At 100 TB: chunking and embedding are row-local (no shuffle until the
  * per-chunk aggregate inside the embed kernel, keyed by chunk); queries
  * are broadcast; scoring feeds the bounded-heap top-k (map-side
  * combined, ≤ k rows per partition per query — never a per-query window
  * sort); the winner join is a broadcast semi join. Swapping the exact
  * scan for the IVF/PQ tiers is the documented sub-linear path — the
  * chunk vectors satisfy the same (vec_id, emb) contract those tiers
  * already index and store. */
object Rag {

  val ChunkShift = 4096L

  private def chunkTable(spark: SparkSession, dir: String,
      window: Int, stride: Int): DataFrame = {
    val toked = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
    Packing.chunkRows(toked, window, stride)
      .select((col("doc_id") * ChunkShift + col("chunk_pos")).as("chunk_id"),
        col("doc_id").as("src_doc"), col("chunk_pos"),
        concat_ws(" ", col("chunk")).as("text"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_sig"))
  }

  /** (q_doc, rank, src_doc, chunk_pos, cosine, chunk_sig): the k best
    * passages outside each query doc, ranked by rounded cosine with the
    * chunk-id tiebreak. Fully hash-oracled end to end. */
  def ragRetrieve(spark: SparkSession, dir: String, nQueries: Int = 5,
      k: Int = 3, window: Int = 32, stride: Int = 16): DataFrame = {
    val chunks = chunkTable(spark, dir, window, stride)
    val vecs = TextEmbed.embedDocs(
        chunks.select(col("chunk_id").as("doc_id"), col("text")))
      .select(col("doc_id").as("vec_id"), col("emb"))
    val q = vecs
      .filter(col("vec_id") % ChunkShift === 0 &&
        col("vec_id") < nQueries * ChunkShift)
      .select((col("vec_id") / ChunkShift).cast("long").as("q_doc"),
        col("emb").as("q_emb"))
    val topk = udaf(new TopK.ScoreTopKAgg(k),
      org.apache.spark.sql.Encoders.product[TopK.Scored])
    val winners = vecs.crossJoin(broadcast(q))
      .filter((col("vec_id") / ChunkShift).cast("long") =!= col("q_doc"))
      .withColumn("cosine", round(cosine_sim(col("emb"), col("q_emb")), 6))
      .groupBy("q_doc")
      .agg(topk(col("vec_id"), col("cosine")).as("top"))
      .select(col("q_doc"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("q_doc"), (col("pos") + 1).cast("int").as("rank"),
        col("s.vec_id").as("chunk_id"), col("s.cosine").as("cosine"))
    chunks.join(broadcast(winners), "chunk_id")
      .select(col("q_doc"), col("rank"), col("src_doc"), col("chunk_pos"),
        col("cosine"), col("chunk_sig"))
  }

  /** DuckDB mirror: the chunk chain (the [[Packing.chunkDocumentsSql]]
    * spelling, kept as text), the embed chain over the chunk relation
    * ([[TextEmbed.embedSqlCtesOver]]), the brute-force window ranking,
    * and the provenance join. */
  def ragRetrieveSql(nQueries: Int = 5, k: Int = 3, window: Int = 32,
      stride: Int = 16): String =
    raw"""WITH tk AS (
      |  SELECT doc_id,
      |    list_filter(str_split(lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g'))), ' '),
      |                x -> x <> '') AS t
      |  FROM documents),
      |grid AS (
      |  SELECT doc_id, t, len(t) AS n,
      |    greatest(1, len(t) - ${window - 1}) AS anchor,
      |    range(1, greatest(1, len(t) - ${window - 1}) + 1, $stride) AS base
      |  FROM tk),
      |stt AS (
      |  SELECT doc_id, t,
      |    CASE WHEN list_contains(base, anchor) THEN base
      |         ELSE list_append(base, anchor) END AS starts
      |  FROM grid),
      |ex AS (
      |  SELECT doc_id, t,
      |    UNNEST(list_transform(range(len(starts)),
      |      i -> struct_pack(pos := i, s := starts[i + 1]))) AS u
      |  FROM stt),
      |ch AS (
      |  SELECT doc_id * $ChunkShift + u.pos AS chunk_id,
      |    doc_id AS src_doc, CAST(u.pos AS INT) AS chunk_pos,
      |    array_to_string(list_slice(t, u.s, u.s + ${window - 1}), ' ') AS text,
      |    md5(array_to_string(list_slice(t, u.s, u.s + ${window - 1}), ' ')) AS chunk_sig
      |  FROM ex),
      |csrc AS (SELECT chunk_id AS doc_id, text FROM ch),
      |${TextEmbed.embedSqlCtesOver("csrc")},
      |c AS (
      |  SELECT doc_id AS vec_id, list(val ORDER BY pos) AS emb
      |  FROM coords GROUP BY doc_id),
      |q AS (
      |  SELECT vec_id // $ChunkShift AS q_doc, emb AS q_emb
      |  FROM c WHERE vec_id % $ChunkShift = 0 AND vec_id < $nQueries * $ChunkShift),
      |cos AS (
      |  SELECT q.q_doc, c.vec_id,
      |    ROUND(${Similarity.cosSqlExpr("c.emb", "q.q_emb")}, 6) AS cosine
      |  FROM c CROSS JOIN q WHERE c.vec_id // $ChunkShift <> q.q_doc),
      |win AS (
      |  SELECT q_doc, vec_id, cosine,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_doc
      |      ORDER BY cosine DESC NULLS LAST, vec_id ASC) AS INT) AS rank
      |  FROM cos)
      |SELECT w.q_doc, w.rank, ch.src_doc, ch.chunk_pos, w.cosine, ch.chunk_sig
      |FROM win w JOIN ch ON ch.chunk_id = w.vec_id
      |WHERE w.rank <= $k""".stripMargin
}
