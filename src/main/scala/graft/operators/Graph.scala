package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph propagation — the execution class behind influence /
  * centrality scoring of a link or interaction graph (which sources are
  * load-bearing, which users anchor the event graph). Complements the
  * min-label propagation already in [[Dedup.dedupClusters]]: that is the
  * idempotent fixpoint (min), this is the weighted-accumulation fixpoint
  * (sum) — together they cover the two aggregation families Pregel-style
  * algorithms reduce to.
  *
  * Scale design: each iteration is ONE shuffle of the edge relation keyed
  * by dst with map-side partial sums (the contribution of a partition's
  * edges to a node collapses before the exchange); the rank relation is
  * |V|-sized and joins the |E|-sized edge list on src. Lineage is
  * truncated per iteration (`localCheckpoint`) so N iterations never
  * re-execute iteration 1 — the same discipline as dedupClusters. At
  * 100 TB pre-partition the edge list by src (bucketing) so the
  * rank⨝edges join is exchange-free on the big side; iterations then
  * reuse that layout.
  *
  * Cross-engine determinism: ranks are BIGINT micro-units. Each node
  * starts at 1,000,000; an iteration sends `rank div out_degree` along
  * every out-edge (integer floor division) and settles
  * `(1e6·(100−d))/100 + (d · Σ incoming) div 100` with damping d an
  * integer percent — every operation is exact BIGINT algebra, so the
  * result is bit-identical regardless of partitioning, parallelism, or
  * engine (floating-point PageRank would diverge in the last ulp by
  * summation order alone).
  */
object Graph {

  /** Integer-micro PageRank over a directed edge list. Every node must
    * have at least one out-edge (feed an undirected graph as both edge
    * directions — the q159 shape — or pre-drop dangling nodes: with
    * integer redistribution their mass is a corpus-wide constant shift).
    */
  /** `checkpoint = false` keeps the full lineage (plan inspection, tiny
    * graphs); leave it on for real runs so iteration N never re-executes
    * iteration 1. */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, dampingPct: Int = 85,
      checkpoint: Boolean = true): DataFrame = {
    require(iterations >= 1, "pagerank needs at least one iteration")
    require(dampingPct >= 0 && dampingPct <= 100, "damping is a percent")
    // Materialize the edge list (and degrees) ONCE — every iteration joins
    // it, and without this the upstream edge derivation (often itself a
    // join+distinct) re-executes per iteration.
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val e = if (checkpoint) e0.localCheckpoint() else e0
    val deg0 = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val deg = if (checkpoint) deg0.localCheckpoint() else deg0
    val base = 1000000L * (100 - dampingPct) / 100
    var ranks = deg.select(col("src").as("id"), lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iterations) {
      val contrib = ranks.join(deg, col("id") === col("src"))
        .select(col("id").as("cid"), expr("rank_micro div deg").as("c"))
      ranks = e.join(contrib, col("src") === col("cid"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("in_sum"))
      ranks = ranks.select(col("dst").as("id"),
        (lit(base) + expr(s"($dampingPct * in_sum) div 100")).as("rank_micro"))
      if (checkpoint) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("id").as("node_id"), col("rank_micro"))
  }

  // ---- q159: PageRank centrality of the customer–supplier graph ---------------
  // Bipartite interaction graph from the order book: an edge per distinct
  // (customer, supplier) trading pair, taken undirected (both directions)
  // so every node has out-degree and the rank mass stays closed. Node ids
  // disambiguate the two key spaces arithmetically: customers even
  // (2·custkey), suppliers odd (2·suppkey+1). Three damped iterations,
  // top 20 by rank (node id breaks ties).
  private def q159(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val und = pairs.union(pairs.select(col("b").as("a"), col("a").as("b")))
    pagerank(und, "a", "b", iterations = 3)
      .orderBy(col("rank_micro").desc, col("node_id"))
      .limit(20)
  }
  private val q159Sql =
    """WITH eo AS (
         SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       e AS (SELECT src, dst FROM eo
             UNION ALL SELECT dst, src FROM eo),
       deg AS (SELECT src AS id, count(*)::BIGINT AS d FROM e GROUP BY 1),
       r0 AS (SELECT id, 1000000::BIGINT AS r FROM deg),
       r1 AS (SELECT e.dst AS id,
                (150000 + (85 * sum(r.r // d.d)) // 100)::BIGINT AS r
              FROM e JOIN r0 r ON r.id = e.src JOIN deg d ON d.id = e.src
              GROUP BY 1),
       r2 AS (SELECT e.dst AS id,
                (150000 + (85 * sum(r.r // d.d)) // 100)::BIGINT AS r
              FROM e JOIN r1 r ON r.id = e.src JOIN deg d ON d.id = e.src
              GROUP BY 1),
       r3 AS (SELECT e.dst AS id,
                (150000 + (85 * sum(r.r // d.d)) // 100)::BIGINT AS r
              FROM e JOIN r2 r ON r.id = e.src JOIN deg d ON d.id = e.src
              GROUP BY 1)
       SELECT id AS node_id, r AS rank_micro FROM r3
       ORDER BY rank_micro DESC, node_id LIMIT 20"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q159_pagerank", q159, Some(q159Sql)))
}
