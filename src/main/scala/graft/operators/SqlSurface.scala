package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL entry point (`spark.sql`) exercised as a first-class surface:
  * the engine's users can register the fixture tables as views and run ANSI
  * SQL, including constructs with no one-line DataFrame equivalent
  * (scalar subqueries, GROUPING SETS). Catalyst plans these identically to
  * the DataFrame API — same pushdown, same codegen.
  */
object SqlSurface {

  private def withViews(s: SparkSession, d: String, tables: String*)(sql: String): DataFrame = {
    tables.foreach(t => Tables(s, d, t).createOrReplaceTempView(t))
    s.sql(sql)
  }

  // ---- q37: correlated scalar subquery --------------------------------------
  // Orders priced above their priority class's average.
  private def q37(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "orders")(
      """SELECT o_orderpriority, count(*) AS n_above,
         round(max(o_totalprice), 2) AS max_price
         FROM orders o
         WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders i
                               WHERE i.o_orderpriority = o.o_orderpriority)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  private val q37Sql =
    """SELECT o_orderpriority, count(*) AS n_above,
       round(max(o_totalprice), 2) AS max_price
       FROM orders o
       WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders i
                             WHERE i.o_orderpriority = o.o_orderpriority)
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- q38: GROUPING SETS ----------------------------------------------------
  private def q38(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "lineitem")(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         round(sum(l_extendedprice), 2) AS total
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
  private val q38Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_extendedprice), 2) AS total
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
       ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""

  // ---- q89: correlated EXISTS / NOT EXISTS -----------------------------------
  // Customers with at least one urgent order but no low-priority order.
  // Catalyst decorrelates both subqueries into semi/anti joins — the same
  // physical shapes as q04/q07, reached from the SQL entry point.
  private val q89Text =
    """SELECT c_custkey, c_mktsegment
       FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_orderpriority = '1-URGENT')
         AND NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderpriority = '5-LOW')
       ORDER BY c_custkey"""
  private def q89(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "customer", "orders")(q89Text)

  // ---- q127: recursive CTE (bill-of-materials explosion) ----------------------
  // Spark 4's WITH RECURSIVE, exercised on the canonical recursive
  // workload: explode an assembly tree from a root part, multiplying
  // component quantities down the hierarchy (parent of k is k/2, so every
  // part key is reachable from part 1 in ≤ log2(N) levels — acyclic, the
  // form Spark's UNION ALL recursion requires; cyclic closures like q60's
  // stay on the iterative join+aggregate operator, which Spark recursion
  // cannot express yet — UNION-dedup recursion is unsupported). Quantities
  // are exact integer products, so the oracle comparison is bit-exact.
  // The child-of condition is written `c.p_partkey DIV 2 = b.pk` — the
  // equi-join identity of "pk's children are {2pk, 2pk+1}" — NOT the OR
  // of the two equalities: an OR disjunction is a theta join that plans a
  // nested-loop scan of `part` on EVERY recursion level (~log2 N of
  // them), while the floor-div form hash-joins each level (4.1 s → 2.5 s
  // on the sf0.1 bench; the remainder is per-level job overhead).
  private val q127Text =
    """WITH RECURSIVE bom(pk, depth, qty) AS (
         SELECT p_partkey, 0, CAST(1 AS BIGINT)
         FROM part WHERE p_partkey = 1
         UNION ALL
         SELECT c.p_partkey, b.depth + 1, b.qty * (c.p_partkey % 3 + 1)
         FROM bom b JOIN part c
           ON c.p_partkey DIV 2 = b.pk)
       SELECT depth, count(*) AS n_parts, sum(qty) AS total_qty,
         min(pk) AS min_part, max(pk) AS max_part
       FROM bom GROUP BY depth ORDER BY depth"""
  private def q127(s: SparkSession, d: String): DataFrame =
    withViews(s, d, "part")(q127Text)
  private val q127Sql =
    """WITH RECURSIVE bom(pk, depth, qty) AS (
         SELECT p_partkey, 0, CAST(1 AS BIGINT)
         FROM part WHERE p_partkey = 1
         UNION ALL
         SELECT c.p_partkey, b.depth + 1, b.qty * (c.p_partkey % 3 + 1)
         FROM bom b JOIN part c
           ON c.p_partkey // 2 = b.pk)
       SELECT depth, count(*) AS n_parts, sum(qty)::BIGINT AS total_qty,
         min(pk) AS min_part, max(pk) AS max_part
       FROM bom GROUP BY depth ORDER BY depth"""

  // ---- q243–q246: the operator library reached FROM SQL -----------------------
  // Four library operators re-exercised through spark.sql table functions
  // (SqlRegistry): each wrapper must hash-match the SAME DuckDB oracle as
  // its Dataset-API original (q60/q42/q30/q229) — the SQL surface and the
  // Scala surface are one implementation, pinned bit-for-bit.
  private def viaTvf(s: SparkSession, d: String, view: String,
      sql: String): DataFrame = {
    SqlRegistry.register(s)
    Tables(s, d, view).createOrReplaceTempView(view)
    s.sql(sql)
  }
  private def q243(s: SparkSession, d: String): DataFrame =
    viaTvf(s, d, "documents",
      """SELECT * FROM graft_dedup_clusters('documents', 'doc_id', 'text')
         ORDER BY doc_id""")
  private def q244(s: SparkSession, d: String): DataFrame =
    viaTvf(s, d, "documents",
      "SELECT * FROM graft_top_ngrams('documents', 'text', 2, 20)")
  private def q245(s: SparkSession, d: String): DataFrame =
    viaTvf(s, d, "embeddings",
      """SELECT * FROM graft_cosine_topk('embeddings', 'vec_id',
           'embedding', 10, 5)
         ORDER BY query_id, rank""")
  private def q246(s: SparkSession, d: String): DataFrame =
    viaTvf(s, d, "events",
      """SELECT * FROM graft_decile_table('events', 'event_type',
           'floor(value * 100)')
         ORDER BY event_type""")
  private def q270(s: SparkSession, d: String): DataFrame =
    viaTvf(s, d, "events",
      """SELECT * FROM graft_salt_plan('events', 'event_type', 100)
         ORDER BY event_type""")
  private def q271(s: SparkSession, d: String): DataFrame =
    viaTvf(s, d, "lineitem",
      """SELECT * FROM graft_grouped_corr('lineitem', 'l_returnflag',
           'disc', 'floor(l_discount * 100)', 'qty', 'floor(l_quantity * 100)')
         ORDER BY g""")
  private def q287(s: SparkSession, d: String): DataFrame =
    viaTvf(s, d, "events",
      """SELECT * FROM graft_topk_others('events', 'event_type',
           'user_id', 3)
         ORDER BY g, rank""")
  private def q288(s: SparkSession, d: String): DataFrame =
    viaTvf(s, d, "events",
      """SELECT * FROM graft_iqr_outliers('events', 'event_type',
           'floor(value * 100)')
         ORDER BY k""")
  private def q326(s: SparkSession, d: String): DataFrame =
    viaTvf(s, d, "events",
      "SELECT * FROM graft_anova('events', 'event_type', 'value')")
  private def q357(s: SparkSession, d: String): DataFrame =
    viaTvf(s, d, "events",
      """SELECT * FROM graft_welch_t('events', 'event_type', 'value',
           'purchase', 'view')""")
  private def q393(s: SparkSession, d: String): DataFrame =
    viaTvf(s, d, "orders",
      """SELECT * FROM graft_yule_walker('orders', 'o_orderpriority',
           'year(cast(o_orderdate as date)) * 12
            + month(cast(o_orderdate as date))', '1L')""")
  private def q394(s: SparkSession, d: String): DataFrame =
    viaTvf(s, d, "lineitem",
      """SELECT * FROM graft_permutation_test('lineitem',
           'l_orderkey * 10 + l_linenumber', 'l_quantity',
           'l_returnflag = \'R\'', 100)""")
  // The hamming-pairs wrapper composes with a TEMP VIEW deriving the
  // fingerprint via the registered native kernel — the full SQL-only
  // near-dup path: graft_simhash in the view, the banded join as a TVF.
  private def q358(s: SparkSession, d: String): DataFrame = {
    SqlRegistry.register(s)
    graft.functions.Native.register(s)
    Tables(s, d, "documents").createOrReplaceTempView("documents")
    s.sql("""CREATE OR REPLACE TEMPORARY VIEW doc_simhash AS
      SELECT doc_id, graft_simhash(split(text, ' ')) AS sh FROM documents""")
    s.sql("""SELECT * FROM graft_hamming_pairs('doc_simhash', 'doc_id',
        'sh', 4, 8, 3)
      ORDER BY d1, d2""")
  }
  // The KM wrapper composes with a SQL TEMP VIEW for the per-customer
  // duration derivation — the survival TVF consumes ANY relation-valued
  // derivation a SQL user can write, not just base tables.
  private def q327(s: SparkSession, d: String): DataFrame = {
    SqlRegistry.register(s)
    Tables(s, d, "orders").createOrReplaceTempView("orders")
    s.sql("""CREATE OR REPLACE TEMPORARY VIEW cust_life AS
      SELECT datediff(max(o_orderdate), min(o_orderdate)) AS dur,
        cast(max(o_orderdate) as date) < date'2001-02-01' AS ev
      FROM orders GROUP BY o_custkey""")
    s.sql("""SELECT * FROM graft_kaplan_meier('cust_life', 'dur', 'ev')
      ORDER BY t""")
  }

  // ---- q408/q409: the round-9 operators reached FROM SQL ----------------------
  // Same oracles as the Dataset originals (q404/q407) — the TVF route
  // must be bit-identical, SqlRegistrySpec pins TVF ≡ Dataset directly.
  private def q408(s: SparkSession, d: String): DataFrame = {
    SqlRegistry.register(s)
    Tables(s, d, "embeddings").createOrReplaceTempView("embeddings")
    s.sql("""CREATE OR REPLACE TEMPORARY VIEW emb_capped AS
      SELECT * FROM embeddings WHERE vec_id < 1024""")
    s.sql("""SELECT * FROM graft_dbscan('emb_capped', 'vec_id',
        'embedding[0]', 'embedding[1]', 20000, 5)""")
  }
  private def q409(s: SparkSession, d: String): DataFrame = {
    SqlRegistry.register(s)
    // The edge view comes from the Dataset-side kNN builder — the TVF
    // consumes ANY edge relation, however derived (q327 contract).
    Similarity.knnEdges(
        Tables(s, d, "embeddings")
          .filter(org.apache.spark.sql.functions.col("vec_id") < 256),
        "vec_id", "embedding", k = 3)
      .createOrReplaceTempView("knn_edges")
    // maxDepth 16 = the oracle recursion bound (the q407 contract): a
    // deeper-than-oracle fixture graph raises instead of diverging.
    s.sql("SELECT * FROM graft_closeness('knn_edges', 'u', 'v', 16)")
  }

  // ---- q423–q425: the causal family reached FROM SQL --------------------------
  // The audience for causal readouts is the SQL-first analyst; each TVF
  // shares the Dataset original's oracle verbatim (q406/q415/q419).
  private def q423(s: SparkSession, d: String): DataFrame =
    viaTvf(s, d, "lineitem",
      """SELECT * FROM graft_ipw_ate('lineitem',
           'CAST(l_discount >= 0.05 AS BIGINT)',
           'round(l_extendedprice * 100)', 3, 8,
           '1L', 'CAST(l_quantity AS BIGINT) div 10')""")
  private def q424(s: SparkSession, d: String): DataFrame =
    viaTvf(s, d, "lineitem",
      """SELECT * FROM graft_gcomp_ate('lineitem',
           'CAST(l_discount >= 0.05 AS BIGINT)',
           'round(l_extendedprice * 100)',
           'CAST(l_quantity AS BIGINT) div 10')""")
  private def q425(s: SparkSession, d: String): DataFrame =
    viaTvf(s, d, "lineitem",
      """SELECT * FROM graft_psm_att('lineitem',
           'CAST(l_discount >= 0.05 AS BIGINT)',
           'round(l_extendedprice * 100)', 3, 8, 104857,
           '1L', 'CAST(l_quantity AS BIGINT) div 10')""")

  // ---- q439: streaming-admission decisions from pure SQL ----------------------
  // The q434 operator through the graft_hamming_admit TVF — the SQL
  // route must hash-match the same all-pairs oracle; the hash expression
  // replays the engine's simhash chain (graft_simhash over the
  // whitespace tokens) exactly.
  private def q439(s: SparkSession, d: String): DataFrame = {
    SqlRegistry.register(s)
    val docs = Tables(s, d, "documents")
    docs.filter(docs("doc_id") < 300)
      .createOrReplaceTempView("documents_ref")
    docs.filter(docs("doc_id") >= 300)
      .createOrReplaceTempView("documents_in")
    s.sql("""SELECT doc_id, CAST(admitted AS BIGINT) AS admitted
      FROM graft_hamming_admit('documents_ref', 'documents_in', 'doc_id',
        'graft_simhash(split(text, '' ''))', 4, 8, 3)
      ORDER BY doc_id""")
  }

  // ---- q429: the FULL SQL-only centrality chain -------------------------------
  // Graph build (bucketed TVF) composed with the sampled-closeness TVF
  // through a TEMP VIEW — no Scala in the loop; shares q427's oracle.
  private def q429(s: SparkSession, d: String): DataFrame = {
    SqlRegistry.register(s)
    Tables(s, d, "embeddings").createOrReplaceTempView("embeddings")
    s.sql("""CREATE OR REPLACE TEMPORARY VIEW knn_ivf_edges AS
      SELECT * FROM graft_knn_edges_ivf('embeddings', 'vec_id',
        'embedding', 16, 3, 4)""")
    s.sql("SELECT * FROM graft_closeness('knn_ivf_edges', 'u', 'v', 16, 16)")
  }

  private def q417(s: SparkSession, d: String): DataFrame = {
    SqlRegistry.register(s)
    Tables(s, d, "embeddings").createOrReplaceTempView("embeddings")
    s.sql("""SELECT * FROM graft_hst_outliers('embeddings', 'vec_id',
        'embedding[0]', 'embedding[1]', 7, 20)""")
  }
  private def q418(s: SparkSession, d: String): DataFrame = {
    SqlRegistry.register(s)
    Similarity.knnEdges(
        Tables(s, d, "embeddings")
          .filter(org.apache.spark.sql.functions.col("vec_id") < 256),
        "vec_id", "embedding", k = 3)
      .createOrReplaceTempView("knn_edges")
    s.sql("SELECT * FROM graft_betweenness('knn_edges', 'u', 'v', 8, 16, 30)")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q408_sql_dbscan", q408, Some(Similarity.q404Sql)),
    QueryDef("q409_sql_closeness", q409, Some(Graph.q407Sql)),
    QueryDef("q417_sql_hst_outliers", q417, Some(Similarity.q411Sql)),
    QueryDef("q418_sql_betweenness", q418, Some(Graph.q414Sql)),
    QueryDef("q429_sql_knn_centrality", q429, Some(Graph.q427Sql)),
    QueryDef("q439_sql_admission", q439, Some(Dedup.q434Sql)),
    QueryDef("q423_sql_ipw_ate", q423, Some(Supervised.q406Sql)),
    QueryDef("q424_sql_gcomp_ate", q424, Some(Supervised.q415Sql)),
    QueryDef("q425_sql_psm_att", q425, Some(Supervised.q419Sql)),
    QueryDef("q37_scalar_subquery", q37, Some(q37Sql)),
    QueryDef("q38_grouping_sets", q38, Some(q38Sql)),
    QueryDef("q89_correlated_exists", q89, Some(q89Text)),
    QueryDef("q127_recursive_cte", q127, Some(q127Sql)),
    QueryDef("q243_sql_dedup_clusters", q243, Some(Dedup.q60Sql)),
    QueryDef("q244_sql_top_ngrams", q244, Some(PipelineOps.q42Sql)),
    QueryDef("q245_sql_cosine_topk", q245, Some(Similarity.q30Sql)),
    QueryDef("q246_sql_decile_table", q246, Some(Analytics.q229Sql)),
    QueryDef("q270_sql_salt_plan", q270, Some(Profile.q259Sql)),
    QueryDef("q271_sql_grouped_corr", q271, Some(Profile.q268Sql)),
    QueryDef("q287_sql_topk_others", q287, Some(Analytics.q281Sql)),
    QueryDef("q288_sql_iqr_outliers", q288, Some(Analytics.q283Sql)),
    QueryDef("q326_sql_anova", q326, Some(Profile.q315Sql)),
    QueryDef("q327_sql_kaplan_meier", q327, Some(Analytics.q317Sql)),
    QueryDef("q357_sql_welch_t", q357, Some(Profile.q356Sql)),
    QueryDef("q358_sql_hamming_pairs", q358, Some(Dedup.q28Sql)),
    QueryDef("q393_sql_yule_walker", q393, Some(Analytics.q390Sql)),
    QueryDef("q394_sql_permutation", q394, Some(Profile.q392Sql)))
}
