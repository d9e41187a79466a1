package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.cosine

/** Vector similarity search over `embeddings` (SURVEY.md §2.6).
  *
  * q30 is the brute-force baseline: a broadcast of the (small) query set
  * against every vector, ranked per query — at scale this is the exact
  * scatter-gather top-k, one pass over the corpus, no corpus self-join.
  *
  * q31 is the scale path: IVF (inverted-file) bucketing. Vectors are
  * assigned to their nearest seed centroid once (a broadcast join against
  * K seeds), and each query probes only its own centroid's bucket. The
  * corpus-side work drops from O(|Q|·N) to O(|Q|·N/K); the assignment is
  * a deterministic argmax so the DuckDB oracle reproduces it exactly.
  *
  * Cosine is the double-precision left-fold from TextFunctions — bitwise
  * equal across engines, so ranking on the raw (unrounded) value is stable.
  */
object Similarity {

  private val TopK = 5
  private val NumQueries = 10
  /** IVF: seed centroids are the first NumSeeds vectors (deterministic). */
  private val NumSeeds = 16

  // ---- q30: brute-force cosine top-k ----------------------------------------
  private def q30(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("c").desc, col("neighbor_id"))
    broadcast(queries).join(corpus, col("query_id") =!= col("neighbor_id"))
      .withColumn("c", cosine(col("qe"), col("ne")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("c"), 6).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }
  private val q30Sql =
    s"""WITH sims AS (
         SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(q.embedding) + 1),
             k -> q.embedding[k]::DOUBLE * n.embedding[k]::DOUBLE))
           / (sqrt(list_sum(list_transform(q.embedding, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(n.embedding, x -> x::DOUBLE * x::DOUBLE))))
             AS c
         FROM embeddings q JOIN embeddings n ON q.vec_id != n.vec_id
         WHERE q.vec_id < $NumQueries),
       ranked AS (
         SELECT query_id, neighbor_id, c,
           row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id)
             AS rank
         FROM sims)
       SELECT query_id, rank::INT AS rank, neighbor_id, round(c, 6) AS cos_sim
       FROM ranked WHERE rank <= $TopK ORDER BY query_id, rank"""

  // ---- q31: IVF-bucketed approximate top-k ----------------------------------
  private def q31(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val seeds = e.filter(col("vec_id") < NumSeeds)
      .select(col("vec_id").as("seed_id"), col("embedding").as("se"))
    // One broadcast pass assigns every vector to its nearest seed.
    val aw = Window.partitionBy(col("vec_id"))
      .orderBy(col("sc").desc, col("seed_id"))
    val assigned = e.join(broadcast(seeds))
      .withColumn("sc", cosine(col("embedding"), col("se")))
      .withColumn("arn", row_number().over(aw))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("seed_id").as("cluster"))
    val queries = assigned.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("cluster"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("c").desc, col("neighbor_id"))
    // Probe only the query's own bucket (single-probe IVF).
    broadcast(queries).join(
        assigned.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("ne"), col("cluster")),
        Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("c", cosine(col("qe"), col("ne")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("c"), 6).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }
  private val q31Sql =
    s"""WITH cos AS (
         SELECT a.vec_id, a.embedding, s.vec_id AS seed_id,
           list_sum(list_transform(range(1, len(a.embedding) + 1),
             k -> a.embedding[k]::DOUBLE * s.embedding[k]::DOUBLE))
           / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(s.embedding, x -> x::DOUBLE * x::DOUBLE))))
             AS sc
         FROM embeddings a JOIN embeddings s ON s.vec_id < $NumSeeds),
       assigned AS (
         SELECT vec_id, embedding, seed_id AS cluster FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY sc DESC, seed_id) AS arn FROM cos) t
         WHERE arn = 1),
       sims AS (
         SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(q.embedding) + 1),
             k -> q.embedding[k]::DOUBLE * n.embedding[k]::DOUBLE))
           / (sqrt(list_sum(list_transform(q.embedding, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(n.embedding, x -> x::DOUBLE * x::DOUBLE))))
             AS c
         FROM assigned q JOIN assigned n
           ON q.cluster = n.cluster AND q.vec_id != n.vec_id
         WHERE q.vec_id < $NumQueries),
       ranked AS (
         SELECT query_id, neighbor_id, c,
           row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id)
             AS rank
         FROM sims)
       SELECT query_id, rank::INT AS rank, neighbor_id, round(c, 6) AS cos_sim
       FROM ranked WHERE rank <= $TopK ORDER BY query_id, rank"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q30_cosine_topk", q30, Some(q30Sql), headline = true),
    QueryDef("q31_ann_ivf", q31, Some(q31Sql)))
}
