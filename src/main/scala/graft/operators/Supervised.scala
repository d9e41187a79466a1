package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Supervised learning primitives as pure aggregation pipelines — the
  * "train a small model inside the warehouse" surface (reference:
  * kinesis-stream exposes per-record scoring hooks only; the training
  * side here is the standard batch-gradient formulation every engine
  * textbook reduces to a per-iteration scan + sum, e.g. lineitem-scale
  * label-quality probes before an expensive external training job).
  *
  * Cross-engine determinism (the [[Similarity.powerIteration]] recipe,
  * iterated over DATA instead of a collected Gram matrix): the model
  * state (weights) lives on the driver in exact BIGINT micros; each
  * iteration issues ONE distributed aggregation whose per-row
  * contribution is quantized to an integer BEFORE the sum, so the only
  * floating-point op — the per-row sigmoid — is a pure function of
  * exact integer inputs, and the sum itself is order-independent
  * integer addition. The weight update is floor-division integer
  * algebra (`Math.floorDiv` here, the `// + remainder-sign` idiom in
  * the oracle — both engines truncate toward zero, so the correction
  * term makes both a true floor). The oracle replays the identical
  * fold as an UNROLLED per-iteration CTE chain (the [[Graph.kCore]]
  * generated-peel pattern).
  *
  * Scale design: the feature projection (a handful of BIGINTs per row)
  * is computed once and persisted; each of the T iterations is then a
  * map-side-partial sum over that projection — no shuffle wider than
  * one row of partials per partition, no driver-side data, state is
  * O(features). At 100 TB that is T sequential scans of a few-column
  * columnar cache; gradient sums there should widen to DECIMAL(38,0)
  * (a 2^20-scaled residual times a feature times 10^11 rows can pass
  * 2^63) — at the tested scales BIGINT has five orders of headroom.
  */
object Supervised {

  private val SigScale = 1L << 20 // sigmoid quantization: p in 1/2^20 units

  /** Binary logistic regression fit by T steps of full-batch gradient
    * descent with learning rate 2^-lrShift, in the fixed-point scheme
    * above. `features` are (name, integer-valued column) pairs — the
    * caller bucketizes/scales so z = w·x stays in the sigmoid's active
    * range (at 100 TB you'd standardize with an exact two-pass
    * mean/std; the bucketized form keeps the demo integer-exact).
    *
    * Returns one row per term, ORDER BY term: the fitted weights in
    * micros (`w_<name>`) plus `n_correct` (rows where the fitted model
    * predicts the label at the p >= 1/2 threshold) and `n_rows`.
    */
  def logisticFit(df: DataFrame, label: Column,
      features: Seq[(String, Column)], lrShift: Int, iters: Int): DataFrame = {
    require(features.nonEmpty, "logisticFit needs at least one feature")
    require(iters >= 1 && lrShift >= 0, "need iters >= 1, lrShift >= 0")
    val s = df.sparkSession
    import s.implicits._
    val den = 1L << (20 + lrShift)
    val names = features.map(_._1)
    val proj = df.select(
      (label.cast("long").as("y") +:
        features.zipWithIndex.map { case ((_, c), j) =>
          c.cast("long").as(s"x$j") }): _*)
      .persist()
    try {
      val n = proj.count()
      require(n > 0, "logisticFit needs rows")
      val k = features.size
      val w = Array.fill(k)(0L)
      def residual: Column = {
        // z from the EXACT integer dot product; p quantized to 1/2^20
        // before anything is summed.
        val z = (0 until k).map(j => lit(w(j)) * col(s"x$j"))
          .reduce(_ + _).cast("double") / lit(1e6)
        floor(lit(1.0) / (lit(1.0) + exp(-z)) * lit(SigScale.toDouble) +
          lit(0.5)).cast("long") - col("y") * lit(SigScale)
      }
      for (_ <- 1 to iters) {
        val g = proj.select((residual.as("r") +: (0 until k).map(j =>
            col(s"x$j"))): _*)
          .agg(sum(col("r") * col("x0")).as("g0"),
            (1 until k).map(j => sum(col("r") * col(s"x$j")).as(s"g$j")): _*)
          .head()
        var j = 0
        while (j < k) {
          w(j) -= Math.floorDiv(Math.floorDiv(g.getLong(j), n) * 1000000L, den)
          j += 1
        }
      }
      // One scoring pass with the final weights: predict 1 iff p >= 1/2,
      // i.e. quantized p >= 2^19 — integer compare, no tie ambiguity.
      val pred = (residual + col("y") * lit(SigScale)) >= lit(SigScale / 2)
      val correct = proj
        .agg(sum(when(pred === (col("y") === 1L), 1L).otherwise(0L)))
        .head().getLong(0)
      val rows = names.zip(w).map { case (nm, wj) => (s"w_$nm", wj) } ++
        Seq(("n_correct", correct), ("n_rows", n))
      s.createDataset(rows).toDF("term", "value").orderBy("term")
    } finally proj.unpersist()
  }

  /** Oracle-side floor division (both engines' `//`/`div` truncate
    * toward zero; the remainder-sign correction makes it a floor —
    * [[Analytics.floorDivSql]] in DuckDB spelling).
    */
  private def fd(a: String, b: String): String =
    s"(($a)//($b) + (case when ($a) % ($b) < 0 then -1 else 0 end))"

  /** Generated unrolled-fold oracle for [[logisticFit]]: w0 carries the
    * zero weights, then per iteration one gradient CTE over the feature
    * projection joined to the previous weight row, exactly the driver
    * fold. featsSql projects columns y, x0..x{k-1}.
    */
  private def logisticFitSql(featsSql: String, names: Seq[String],
      lrShift: Int, iters: Int): String = {
    val k = names.size
    val den = 1L << (20 + lrShift)
    val wCols = (0 until k).map(j => s"w$j")
    val levels = Seq(
      s"f AS MATERIALIZED ($featsSql)",
      "nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM f)",
      s"w0 AS MATERIALIZED (SELECT ${wCols.map(c => s"0::BIGINT AS $c").mkString(", ")})") ++
      (1 to iters).flatMap { t =>
        val z = (0 until k).map(j => s"w.w$j*x$j").mkString(" + ")
        val g = s"""g$t AS MATERIALIZED (
          SELECT ${(0 until k).map(j =>
            s"sum((P - y*$SigScale)*x$j) AS g$j").mkString(", ")}
          FROM (SELECT y, ${(0 until k).map(j => s"x$j").mkString(", ")},
              floor(1.0/(1.0+exp(-(($z)/1e6)))*$SigScale + 0.5)::BIGINT AS P
            FROM f, w${t - 1} w))"""
        val upd = s"""w$t AS MATERIALIZED (
          SELECT ${(0 until k).map(j =>
            s"w.w$j - ${fd(fd(s"g.g$j", "nn.n") + "*1000000", den.toString)} AS w$j")
            .mkString(", ")}
          FROM w${t - 1} w, g$t g, nn)"""
        Seq(g, upd)
      }
    val zFin = (0 until k).map(j => s"w.w$j*x$j").mkString(" + ")
    s"""WITH ${levels.mkString(",\n")},
      scored AS (
        SELECT y, CASE WHEN floor(1.0/(1.0+exp(-(($zFin)/1e6)))*$SigScale
            + 0.5)::BIGINT >= ${SigScale / 2} THEN 1 ELSE 0 END AS pred
        FROM f, w$iters w),
      terms AS (
        ${names.zipWithIndex.map { case (nm, j) =>
          s"SELECT 'w_$nm' AS term, w$j::BIGINT AS value FROM w$iters" }
          .mkString("\n        UNION ALL ")}
        UNION ALL SELECT 'n_correct', sum(CASE WHEN pred = y THEN 1 ELSE 0
          END)::BIGINT FROM scored
        UNION ALL SELECT 'n_rows', n::BIGINT FROM nn)
      SELECT term, value FROM terms ORDER BY term"""
  }

  /** Multinomial naive Bayes over a token column: train on one slice,
    * score the held-out slice, return the confusion matrix
    * (true_label, pred_label, n) ORDER BY both.
    *
    * Log-free-of-floats formulation: with Laplace smoothing every score
    * term is ln of an INTEGER — ln(classDocs), ln(totalDocs),
    * ln(count_tc + 1), ln(classTokens + V) — each quantized to micros
    * at the one site it is computed, so every per-document sum is exact
    * integer addition and absent/unknown tokens contribute exactly
    * lnq(0 + 1) = 0 (which is why the scoring join can be INNER on the
    * trained (token, class) table: the smoothing constant folds into
    * the per-class `ntok * lnq(classTokens + V)` term instead).
    * Prediction tiebreak: highest score, then lexicographically
    * smallest class.
    *
    * Scale: the likelihood table is a (token, class) aggregate — a
    * vocabulary-sized relation that shuffles on token, exactly the key
    * the scoring join needs, so Catalyst reuses the partitioning; the
    * class/prior tables are O(classes) broadcast scalars; per-document
    * score rows are |docs|·|classes|.
    */
  def naiveBayes(df: DataFrame, idCol: String, labelCol: String,
      tokensCol: Column, testPred: Column): DataFrame = {
    val s = df.sparkSession
    val lnq = (c: Column) => floor(log(c.cast("double")) * lit(1e6) +
      lit(0.5)).cast("long")
    val tok = df.select(col(idCol).as("doc_id"), col(labelCol).as("label"),
      testPred.as("test"), explode(tokensCol).as("token"))
    val train = tok.filter(!col("test"))
    val lik = train.groupBy("label", "token").count()
      .select(col("label"), col("token"), lnq(col("count") + 1).as("lnq"))
    val cls = train.groupBy("label")
      .agg(countDistinct("doc_id").as("docs"), count(lit(1)).as("toks"))
    val vocab = train.agg(countDistinct("token").as("v"))
    val tot = cls.agg(sum("docs").as("docs"))
    val prior = cls.crossJoin(broadcast(tot.select(lnq(col("docs"))
        .as("lnq_tot"))))
      .crossJoin(broadcast(vocab))
      .select(col("label"), col("docs"), col("toks"),
        (lnq(col("docs")) - col("lnq_tot")).as("prior_q"),
        lnq(col("toks") + col("v")).as("denom_q"))
    val ttok = tok.filter(col("test"))
      .select(col("doc_id"), col("label").as("true_label"), col("token"))
    val ndoc = ttok.groupBy("doc_id")
      .agg(first("true_label").as("true_label"), count(lit(1)).as("ntok"))
    val matched = ttok.join(lik.withColumnRenamed("label", "cand"), Seq("token"))
      .groupBy("doc_id", "cand").agg(sum("lnq").as("s"))
    val scored = ndoc.crossJoin(broadcast(prior.withColumnRenamed("label", "cand")))
      .join(matched, Seq("doc_id", "cand"), "left")
      .select(col("doc_id"), col("true_label"), col("cand"),
        (col("prior_q") + coalesce(col("s"), lit(0L)) -
          col("ntok") * col("denom_q")).as("score"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cand"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .groupBy(col("true_label"), col("cand").as("pred_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy("true_label", "pred_label")
  }

  // ---- q379: held-out language confusion for a token naive Bayes -------------
  // The curation-side "is this metadata label learnable from the text?"
  // probe: on signal-free synthetic text it degenerates to the majority
  // class, and the confusion matrix SHOWS that — which is the honest
  // pre-training answer the probe exists to give.
  private def q379(s: SparkSession, d: String): DataFrame =
    naiveBayes(Tables.documents(s, d), "doc_id", "lang",
      split(col("text"), " "), col("doc_id") % 5 === 0)
  private val q379Sql =
    """WITH tok AS MATERIALIZED (
        SELECT doc_id, lang, (doc_id % 5 = 0) AS test,
          unnest(string_split(text, ' ')) AS token
        FROM documents),
      train AS MATERIALIZED (SELECT * FROM tok WHERE NOT test),
      v AS (SELECT count(DISTINCT token)::BIGINT AS v FROM train),
      cls AS MATERIALIZED (
        SELECT lang, count(DISTINCT doc_id)::BIGINT AS docs,
          count(*)::BIGINT AS toks
        FROM train GROUP BY lang),
      tot AS (SELECT sum(docs)::BIGINT AS docs FROM cls),
      lik AS MATERIALIZED (
        SELECT lang, token, floor(ln(count(*) + 1)*1e6 + 0.5)::BIGINT AS lnq
        FROM train GROUP BY lang, token),
      ttok AS (SELECT doc_id, lang AS true_lang, token FROM tok WHERE test),
      ndoc AS (SELECT doc_id, any_value(true_lang) AS true_lang,
          count(*)::BIGINT AS ntok
        FROM ttok GROUP BY doc_id),
      matched AS (
        SELECT t.doc_id, l.lang, sum(l.lnq)::BIGINT AS s
        FROM ttok t JOIN lik l ON t.token = l.token GROUP BY 1, 2),
      scored AS (
        SELECT d.doc_id, d.true_lang, c.lang,
          floor(ln(c.docs)*1e6 + 0.5)::BIGINT
            - (SELECT floor(ln(docs)*1e6 + 0.5)::BIGINT FROM tot)
            + coalesce(m.s, 0)
            - d.ntok * floor(ln(c.toks + (SELECT v FROM v))*1e6 + 0.5)::BIGINT
            AS score
        FROM ndoc d CROSS JOIN cls c
        LEFT JOIN matched m ON m.doc_id = d.doc_id AND m.lang = c.lang),
      pred AS (
        SELECT doc_id, true_lang, lang AS pred_lang,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, lang) AS rk
        FROM scored)
      SELECT true_lang AS true_label, pred_lang AS pred_label,
        count(*)::BIGINT AS n
      FROM pred WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2"""

  // ---- q378: does returnflag follow quantity/discount? (it should not) -------
  // A label-leakage probe a curation pipeline runs before paying for
  // training: fit the cheap in-warehouse model; weights near zero and
  // accuracy at the base rate certify the features carry no signal.
  private val Q378Feats = Seq("intercept", "qty_bucket", "disc_pct")
  private def q378(s: SparkSession, d: String): DataFrame =
    logisticFit(Tables.lineitem(s, d),
      (col("l_returnflag") === "R").cast("long"),
      Seq("intercept" -> lit(1L),
        "qty_bucket" -> expr("CAST(l_quantity AS BIGINT) div 10"),
        "disc_pct" -> expr("CAST(round(l_discount*100) AS BIGINT)")),
      lrShift = 3, iters = 12)
  private val q378Sql = logisticFitSql(
    """SELECT (l_returnflag='R')::BIGINT AS y, 1::BIGINT AS x0,
        (l_quantity::BIGINT)//10 AS x1,
        round(l_discount*100)::BIGINT AS x2 FROM lineitem""",
    Q378Feats, lrShift = 3, iters = 12)

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q378_logistic_fit", q378, Some(q378Sql)),
    QueryDef("q379_naive_bayes", q379, Some(q379Sql)))
}
