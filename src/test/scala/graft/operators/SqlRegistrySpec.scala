package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The SQL table-function surface must be the SAME implementation as the
  * Dataset API — one plan, two entry points (the q243–q246 oracle rows
  * pin this against DuckDB; here it is pinned directly).
  */
class SqlRegistrySpec extends SparkSpec {

  test("graft_top_ngrams TVF equals the Dataset operator") {
    SqlRegistry.register(spark)
    Tables(spark, sf, "documents").createOrReplaceTempView("documents")
    val viaSql = spark.sql(
      "SELECT * FROM graft_top_ngrams('documents', 'text', 2, 20)")
    val viaApi = PipelineOps.topNgrams(
      Tables(spark, sf, "documents"), "text", 2, 20)
    assert(viaSql.except(viaApi).isEmpty && viaApi.except(viaSql).isEmpty)
  }

  test("graft_decile_table TVF equals the Dataset operator") {
    SqlRegistry.register(spark)
    Tables(spark, sf, "events").createOrReplaceTempView("events")
    val viaSql = spark.sql(
      """SELECT * FROM graft_decile_table('events', 'event_type',
           'floor(value * 100)')""")
    val viaApi = Analytics.decileTable(
      Tables(spark, sf, "events"), "event_type", floor(col("value") * 100))
    assert(viaSql.except(viaApi).isEmpty && viaApi.except(viaSql).isEmpty)
  }

  test("graft_cosine_topk TVF equals the Dataset operator") {
    SqlRegistry.register(spark)
    Tables(spark, sf, "embeddings").createOrReplaceTempView("embeddings")
    val viaSql = spark.sql(
      """SELECT * FROM graft_cosine_topk('embeddings', 'vec_id',
           'embedding', 10, 5)""")
    val e = Tables(spark, sf, "embeddings")
    val viaApi = Similarity.bruteTopK(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", 5)
    assert(viaSql.except(viaApi).isEmpty && viaApi.except(viaSql).isEmpty)
  }

  test("graft_salt_plan TVF equals the Dataset operator") {
    SqlRegistry.register(spark)
    Tables(spark, sf, "events").createOrReplaceTempView("events")
    val viaSql = spark.sql(
      "SELECT * FROM graft_salt_plan('events', 'event_type', 100)")
    val viaApi = Profile.saltPlan(Tables(spark, sf, "events"),
      "event_type", 100L)
    assert(viaSql.except(viaApi).isEmpty && viaApi.except(viaSql).isEmpty)
  }

  test("graft_grouped_corr TVF equals the Dataset operator") {
    SqlRegistry.register(spark)
    Tables(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    val viaSql = spark.sql(
      """SELECT * FROM graft_grouped_corr('lineitem', 'l_returnflag',
           'disc', 'floor(l_discount * 100)', 'qty', 'floor(l_quantity * 100)')""")
    val viaApi = Profile.groupedCorr(Tables(spark, sf, "lineitem"),
      col("l_returnflag"),
      "disc" -> floor(col("l_discount") * 100),
      "qty" -> floor(col("l_quantity") * 100))
    assert(viaSql.except(viaApi).isEmpty && viaApi.except(viaSql).isEmpty)
  }

  test("a non-literal TVF parameter is rejected, not silently evaluated") {
    SqlRegistry.register(spark)
    Tables(spark, sf, "documents").createOrReplaceTempView("documents")
    val err = intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft_top_ngrams('documents', 'text', rand(), 20)")
        .collect()
    }
    assert(err.toString.contains("literal")
      || Option(err.getCause).exists(_.toString.contains("literal")),
      s"expected a literal-argument error, got: $err")
  }

  test("graft_anova and graft_kaplan_meier TVFs equal the Dataset forms") {
    SqlRegistry.register(spark)
    Tables(spark, sf, "events").createOrReplaceTempView("events")
    val anovaSql = spark.sql(
      "SELECT * FROM graft_anova('events', 'event_type', 'value')")
    val anovaApi = Profile.anovaTable(Tables(spark, sf, "events"),
      col("event_type"), col("value"))
    assert(anovaSql.except(anovaApi).isEmpty
      && anovaApi.except(anovaSql).isEmpty)

    Tables(spark, sf, "orders").createOrReplaceTempView("orders")
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW cust_life AS
      SELECT datediff(max(o_orderdate), min(o_orderdate)) AS dur,
        cast(max(o_orderdate) as date) < date'2001-02-01' AS ev
      FROM orders GROUP BY o_custkey""")
    val kmSql = spark.sql(
      "SELECT * FROM graft_kaplan_meier('cust_life', 'dur', 'ev')")
    val kmApi = Analytics.kaplanMeier(spark.table("cust_life"),
      col("dur"), col("ev"))
    assert(kmSql.except(kmApi).isEmpty && kmApi.except(kmSql).isEmpty)
  }

  test("graft_nelson_aalen and graft_holt_forecast TVFs equal the Dataset forms") {
    SqlRegistry.register(spark)
    Tables(spark, sf, "orders").createOrReplaceTempView("orders")
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW cust_life AS
      SELECT datediff(max(o_orderdate), min(o_orderdate)) AS dur,
        cast(max(o_orderdate) as date) < date'2001-02-01' AS ev
      FROM orders GROUP BY o_custkey""")
    val naSql = spark.sql(
      "SELECT * FROM graft_nelson_aalen('cust_life', 'dur', 'ev')")
    val naApi = Analytics.nelsonAalen(spark.table("cust_life"),
      col("dur"), col("ev"))
    assert(naSql.except(naApi).isEmpty && naApi.except(naSql).isEmpty)

    val hfSql = spark.sql(
      """SELECT * FROM graft_holt_forecast('orders', 'o_orderpriority',
           'year(cast(o_orderdate as date)) * 12
            + month(cast(o_orderdate as date))',
           '1', 500000, 300000, 3)""")
    val hfApi = Analytics.holtForecast(Tables(spark, sf, "orders"),
      "o_orderpriority",
      expr("year(cast(o_orderdate as date)) * 12" +
        " + month(cast(o_orderdate as date))"),
      lit(1L), alphaMicro = 500000L, betaMicro = 300000L, horizon = 3)
    assert(hfSql.except(hfApi).isEmpty && hfApi.except(hfSql).isEmpty)

    val hwSql = spark.sql(
      """SELECT * FROM graft_holt_winters('orders', 'o_orderpriority',
           'year(cast(o_orderdate as date)) * 12
            + month(cast(o_orderdate as date))',
           '1', 12, 400000, 200000, 300000, 4)""")
    val hwApi = Analytics.holtWintersForecast(Tables(spark, sf, "orders"),
      "o_orderpriority",
      expr("year(cast(o_orderdate as date)) * 12" +
        " + month(cast(o_orderdate as date))"),
      lit(1L), m = 12, alphaMicro = 400000L, betaMicro = 200000L,
      gammaMicro = 300000L, horizon = 4)
    assert(hwSql.except(hwApi).isEmpty && hwApi.except(hwSql).isEmpty)
  }

  test("graft_isotonic_fit TVF equals the Dataset operator") {
    graft.functions.Native.register(spark)
    SqlRegistry.register(spark)
    Tables(spark, sf, "events").createOrReplaceTempView("events")
    val viaSql = spark.sql(
      """SELECT * FROM graft_isotonic_fit('events', 'event_type',
           '(unix_micros(cast(ts as timestamp)) div 3600000000) % 24',
           'case when value >= 2.0D then 1000000L else 0L end')""")
    val viaApi = Profile.isotonicFit(Tables(spark, sf, "events"),
      col("event_type"),
      expr("(unix_micros(cast(ts as timestamp)) div 3600000000) % 24"),
      expr("case when value >= 2.0D then 1000000L else 0L end"))
    assert(viaSql.except(viaApi).isEmpty && viaApi.except(viaSql).isEmpty)
  }

  test("graft_welch_t and graft_hamming_pairs TVFs equal the Dataset forms") {
    SqlRegistry.register(spark)
    graft.functions.Native.register(spark)
    Tables(spark, sf, "events").createOrReplaceTempView("events")
    val wtSql = spark.sql(
      """SELECT * FROM graft_welch_t('events', 'event_type', 'value',
           'purchase', 'view')""")
    val wtApi = Profile.welchT(Tables(spark, sf, "events"),
      col("event_type"), col("value"), "purchase", "view")
    assert(wtSql.except(wtApi).isEmpty && wtApi.except(wtSql).isEmpty)

    Tables(spark, sf, "documents").createOrReplaceTempView("documents")
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW doc_simhash AS
      SELECT doc_id, graft_simhash(split(text, ' ')) AS sh FROM documents""")
    val hpSql = spark.sql(
      """SELECT * FROM graft_hamming_pairs('doc_simhash', 'doc_id', 'sh',
           4, 8, 3)""")
    // The TVF route over the simhash view must equal BOTH the generic
    // Dataset operator on the same hashes and the fused simhashPairs.
    val hpApi = Dedup.hammingPairs(
      Dedup.simhash(Tables(spark, sf, "documents"), "doc_id", "text"),
      "doc_id", "simhash", bands = 4, bandBits = 8, maxHamming = 3)
    val fused = Dedup.simhashPairs(Tables(spark, sf, "documents"),
      "doc_id", "text", maxHamming = 3)
    assert(hpSql.except(hpApi).isEmpty && hpApi.except(hpSql).isEmpty)
    assert(hpSql.except(fused).isEmpty && fused.except(hpSql).isEmpty)
  }

  test("graft_yule_walker and graft_permutation_test TVFs equal the Dataset forms") {
    SqlRegistry.register(spark)
    Tables(spark, sf, "orders").createOrReplaceTempView("orders")
    val ywSql = spark.sql(
      """SELECT * FROM graft_yule_walker('orders', 'o_orderpriority',
           'year(cast(o_orderdate as date)) * 12
            + month(cast(o_orderdate as date))', '1L')""")
    val ywApi = Analytics.yuleWalkerAr2(Tables(spark, sf, "orders"),
      "o_orderpriority",
      expr("year(cast(o_orderdate as date)) * 12" +
        " + month(cast(o_orderdate as date))"), lit(1L))
    assert(ywSql.except(ywApi).isEmpty && ywApi.except(ywSql).isEmpty)

    Tables(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    val ptSql = spark.sql(
      """SELECT * FROM graft_permutation_test('lineitem',
           'l_orderkey * 10 + l_linenumber', 'l_quantity',
           'l_returnflag = \'R\'', 50)""")
    val ptApi = Profile.permutationMeanTest(Tables(spark, sf, "lineitem"),
      expr("l_orderkey * 10 + l_linenumber"), col("l_quantity"),
      col("l_returnflag") === "R", replicates = 50)
    assert(ptSql.except(ptApi).isEmpty && ptApi.except(ptSql).isEmpty)
  }

  test("graft_dedup_spans and graft_conformal_holt TVFs equal the Dataset forms") {
    SqlRegistry.register(spark)
    graft.functions.Native.register(spark)
    Tables(spark, sf, "documents").createOrReplaceTempView("documents")
    val dsSql = spark.sql(
      "SELECT * FROM graft_dedup_spans('documents', 'doc_id', 'text', 3, 4)")
    val dsApi = Dedup.dedupSpans(Tables(spark, sf, "documents"),
      "doc_id", "text", k = 3, w = 4)
    assert(dsSql.except(dsApi).isEmpty && dsApi.except(dsSql).isEmpty)

    Tables(spark, sf, "orders").createOrReplaceTempView("orders")
    val chSql = spark.sql(
      """SELECT * FROM graft_conformal_holt('orders', 'o_orderpriority',
           'year(cast(o_orderdate as date)) * 12
            + month(cast(o_orderdate as date))',
           '1', 12, 3, 100000)""")
    val chApi = Analytics.conformalHoltForecast(Tables(spark, sf, "orders"),
      "o_orderpriority",
      expr("year(cast(o_orderdate as date)) * 12" +
        " + month(cast(o_orderdate as date))"),
      lit(1L), calN = 12, horizon = 3, confAlphaMicro = 100000L)
    assert(chSql.except(chApi).isEmpty && chApi.except(chSql).isEmpty)
  }

  test("graft_dbscan and graft_closeness TVFs equal the Dataset forms") {
    SqlRegistry.register(spark)
    Tables(spark, sf, "embeddings").createOrReplaceTempView("embeddings")
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW emb_capped AS
      SELECT * FROM embeddings WHERE vec_id < 1024""")
    val dbSql = spark.sql(
      """SELECT * FROM graft_dbscan('emb_capped', 'vec_id',
           'embedding[0]', 'embedding[1]', 20000, 5)""")
    val dbApi = Similarity.dbscanGrid(
      Tables(spark, sf, "embeddings").filter(col("vec_id") < 1024),
      "vec_id", col("embedding").getItem(0), col("embedding").getItem(1),
      epsMicro = 20000L, minPts = 5)
    assert(dbSql.except(dbApi).isEmpty && dbApi.except(dbSql).isEmpty)

    val edges = Similarity.knnEdges(
      Tables(spark, sf, "embeddings").filter(col("vec_id") < 256),
      "vec_id", "embedding", k = 3)
    edges.createOrReplaceTempView("knn_edges")
    val clSql = spark.sql(
      "SELECT * FROM graft_closeness('knn_edges', 'u', 'v')")
    val clApi = Graph.closenessCentrality(edges, "u", "v")
    assert(clSql.except(clApi).isEmpty && clApi.except(clSql).isEmpty)

    // The sampled-pivot lever through the same TVF.
    val csSql = spark.sql(
      "SELECT * FROM graft_closeness('knn_edges', 'u', 'v', 16, 8)")
    val csApi = Graph.closenessCentrality(edges, "u", "v",
      maxDepth = 16, sources = 8)
    assert(csSql.except(csApi).isEmpty && csApi.except(csSql).isEmpty)
  }

  test("graft_knn_edges_ivf TVF equals the Dataset builder") {
    SqlRegistry.register(spark)
    Tables(spark, sf, "embeddings").createOrReplaceTempView("embeddings")
    val sqlEdges = spark.sql(
      """SELECT * FROM graft_knn_edges_ivf('embeddings', 'vec_id',
           'embedding', 16, 3, 4)""")
    val e = Tables(spark, sf, "embeddings")
    val apiEdges = Similarity.knnEdgesIvf(e,
      e.filter(col("vec_id") < 16), "vec_id", "embedding",
      k = 3, nprobe = 4)
    assert(sqlEdges.except(apiEdges).isEmpty &&
      apiEdges.except(sqlEdges).isEmpty)
  }

  test("causal TVFs (ipw/gcomp/psm) equal the Dataset forms") {
    SqlRegistry.register(spark)
    Tables(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    val li = Tables(spark, sf, "lineitem")
    val treat = (col("l_discount") >= 0.05).cast("long")
    val outcome = org.apache.spark.sql.functions
      .round(col("l_extendedprice") * 100)
    val feats = Seq("intercept" -> lit(1L),
      "qty_bucket" -> expr("CAST(l_quantity AS BIGINT) div 10"))

    val ipwSql = spark.sql(
      """SELECT * FROM graft_ipw_ate('lineitem',
           'CAST(l_discount >= 0.05 AS BIGINT)',
           'round(l_extendedprice * 100)', 3, 8,
           '1L', 'CAST(l_quantity AS BIGINT) div 10')""")
    val ipwApi = Supervised.ipwAte(li, treat, outcome, feats,
      lrShift = 3, iters = 8)
    assert(ipwSql.collect() === ipwApi.collect())

    val gcSql = spark.sql(
      """SELECT * FROM graft_gcomp_ate('lineitem',
           'CAST(l_discount >= 0.05 AS BIGINT)',
           'round(l_extendedprice * 100)',
           'CAST(l_quantity AS BIGINT) div 10')""")
    val gcApi = Supervised.gcompAte(li, treat, outcome, feats.tail)
    assert(gcSql.collect() === gcApi.collect())

    val psmSql = spark.sql(
      """SELECT * FROM graft_psm_att('lineitem',
           'CAST(l_discount >= 0.05 AS BIGINT)',
           'round(l_extendedprice * 100)', 3, 8, 104857,
           '1L', 'CAST(l_quantity AS BIGINT) div 10')""")
    val psmApi = Supervised.psmAtt(li, treat, outcome, feats,
      lrShift = 3, iters = 8, caliperQ = 104857L)
    assert(psmSql.collect() === psmApi.collect())
  }
}
