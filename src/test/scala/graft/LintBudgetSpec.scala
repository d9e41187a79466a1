package graft

import graft.operators.ScaleLint

/** Plan-lint budget for the whole query registry: every registered
  * query's WARN-level [[ScaleLint]] findings must stay within the
  * adjudicated allowlist below. Each allowlisted entry is one of the two
  * documented-legitimate classes:
  *
  *  - `unpartitioned-window` / its `single-partition-exchange` on a
  *    QUANTIZED-DOMAIN collapse (distinct cents/days/scores — bounded by
  *    construction; the scaladocs of each operator state the contract,
  *    and the `quantized = false` switch routes the unbounded case
  *    through DistributedPrefix).
  *  - `broadcast-nested-loop` where the build side is a QUERY-SET or
  *    seed relation (brute/ANN scoring, per-list ranking metrics) —
  *    deliberately tiny by contract.
  *
  * A NEW query must either lint warning-free or be adjudicated here with
  * a comment-worthy reason; a regression in an existing query (more
  * warnings than budgeted) fails the build.
  *
  * Related codegen budget (not a plan-lint rule, recorded here as the
  * adjudicated threshold): `Similarity.hstScore` embeds its model as
  * typedlit literal maps only up to `litBudget` = 65536 total entries;
  * above that it auto-routes through per-level broadcast hash joins so
  * no task ever compiles a multi-megabyte literal plan (r10 verdict
  * What's-wrong #3; spec pins the two routes bit-identical). The sweep is plan-only for
  * most queries; a handful (iterative graph/raking operators that
  * localCheckpoint rounds at construction, and sequenceGaps which
  * collects partition bounds) execute real sf-sized work while their
  * DataFrame is built — accepted: at the spec's scale factor that cost
  * is small, and linting the EXECUTED shape (checkpointed rounds and
  * all) is exactly what a pipeline author's composed plan would show.
  */
class LintBudgetSpec extends SparkSpec {

  private val budget: Map[String, Map[String, Int]] = Map(
    // quantized-domain cumulative family (bounded collapses)
    "q211_vocab_growth" -> Map("unpartitioned-window" -> 1),
    "q327_sql_kaplan_meier" -> Map("unpartitioned-window" -> 1),
    "q204_length_cap" -> Map("broadcast-nested-loop" -> 1,
      "unpartitioned-window" -> 2),
    "q206_apportion" -> Map("single-partition-exchange" -> 1,
      "unpartitioned-window" -> 1),
    "q253_neyman_allocation" -> Map("single-partition-exchange" -> 1,
      "unpartitioned-window" -> 1),
    "q219_conversion_latency" -> Map("unpartitioned-window" -> 1),
    "q232_rfm_segments" -> Map("unpartitioned-window" -> 3),
    "q285_abc_xyz" -> Map("single-partition-exchange" -> 1,
      "unpartitioned-window" -> 1),
    "q296_anomaly_consensus" -> Map("broadcast-nested-loop" -> 1,
      "unpartitioned-window" -> 6),
    "q317_kaplan_meier" -> Map("unpartitioned-window" -> 1),
    // nelsonAalen's quantized path: one cumulative window over the
    // per-duration collapse — distinct integer durations, bounded by
    // construction (identical shape and reason as q317 kaplan_meier;
    // `quantized = false` routes unbounded domains via DistributedPrefix)
    "q340_nelson_aalen" -> Map("unpartitioned-window" -> 1),
    "q325_logrank" -> Map("broadcast-nested-loop" -> 1,
      "unpartitioned-window" -> 1),
    // q392: three SINGLE-ROW scalar broadcasts (corpus total, observed
    // statistic, and their product onto the R-row replicate table) —
    // condition-free by construction, build side is one row each; the
    // q325/q296 scalar-subquery precedent.
    "q392_permutation_test" -> Map("broadcast-nested-loop" -> 3),
    // q397: the three ntile windows ARE the audit's device — the
    // file-level zone-map model needs one global bucket numbering per
    // layout; run on a sample/dimension by contract (scaladoc), the
    // production layout path is zorderBy/hilbertBy's range partitioner.
    "q397_layout_pruning" -> Map("single-partition-exchange" -> 3,
      "unpartitioned-window" -> 3),
    // q394 is the TVF route to the same q392 plan — same three scalars.
    "q394_sql_permutation" -> Map("broadcast-nested-loop" -> 3),
    "q179_abc_analysis" -> Map("single-partition-exchange" -> 1,
      "unpartitioned-window" -> 1),
    "q216_gini_stump" -> Map("broadcast-nested-loop" -> 1,
      "unpartitioned-window" -> 2),
    "q230_gains_table" -> Map("broadcast-nested-loop" -> 1,
      "unpartitioned-window" -> 1),
    "q240_skyline" -> Map("unpartitioned-window" -> 1),
    "q160_bootstrap_ci" -> Map("single-partition-exchange" -> 1,
      "unpartitioned-window" -> 1),
    "q154_roc_auc" -> Map("unpartitioned-window" -> 1),
    "q156_gini_concentration" -> Map("unpartitioned-window" -> 1),
    "q157_pr_curve" -> Map("unpartitioned-window" -> 1),
    "q126_distribution_drift" -> Map("unpartitioned-window" -> 1),
    "q248_dd_quantiles" -> Map("unpartitioned-window" -> 2),
    "q261_dd_drift" -> Map("unpartitioned-window" -> 1),
    // tiny-build-side brute/ANN scoring and per-list ranking metrics
    "q155_term_class_chi2" -> Map("broadcast-nested-loop" -> 1),
    "q257_threshold_sweep" -> Map("broadcast-nested-loop" -> 3),
    "q29_embedding_neardup" -> Map("broadcast-nested-loop" -> 1),
    "q289_cluster_histogram" -> Map("broadcast-nested-loop" -> 1),
    "q286_knn_outliers" -> Map("broadcast-nested-loop" -> 1),
    // q350: the IVF assignment/probe cross of the corpus against the
    // BROADCAST 16-seed set (the [[Similarity.ivfAssign]] shape — K
    // scored rows per corpus row, map-side argmax/heap; the bucketed
    // candidate join itself is an equi-join, not a BNL)
    "q350_knn_outliers_ivf" -> Map("broadcast-nested-loop" -> 1),
    // q420: same IVF assignment/probe shape as q350 — the one BNL is the
    // corpus × broadcast 16-seed cross (bounded build side); the edge
    // candidate join is the bucket-keyed equi-join.
    "q420_knn_edges_ivf" -> Map("broadcast-nested-loop" -> 1),
    "q302_ivf_probe_sweep" -> Map("broadcast-nested-loop" -> 3),
    // q372: the query-vs-16-seed probe-scoring cross (|seeds|-bounded
    // build side — q86's adjudication); the assignment cross is GONE
    // from this plan because the index table is read back persisted.
    "q372_ivf_index_probe" -> Map("broadcast-nested-loop" -> 1),
    // q436: q372's probe cross plus the APPEND batch's own
    // ivfAssign-vs-broadcast-16-seed cross (Δ-sized stream side, bounded
    // build side — the q350 adjudication; the base build runs behind the
    // ofBucketed seam and is not in this plan).
    "q436_ivf_index_append" -> Map("broadcast-nested-loop" -> 1),
    // q440: q436's plan with the tombstone sidecar applied — the one BNL
    // is still the query-vs-16-seed probe-scoring cross (q86's
    // adjudication); the delete mask itself is a broadcast-HASH
    // anti-join on the id, not a BNL.
    "q440_ivf_index_delete" -> Map("broadcast-nested-loop" -> 1),
    "q30_cosine_topk" -> Map("broadcast-nested-loop" -> 1),
    // q396: the Hamming prefilter broadcasts the bounded QUERY set of
    // packed words against the corpus on a non-equi (!=) condition —
    // the q30 precedent with a 32x smaller build side.
    "q396_binary_quant" -> Map("broadcast-nested-loop" -> 1),
    // q399: the BNL is the BRUTE baseline (bounded query-set broadcast,
    // q30 precedent) that exists only to MEASURE the probe side's
    // recall — production runs the equi-keyed probe path alone.
    "q399_ivf_recall_audit" -> Map("broadcast-nested-loop" -> 1),
    "q164_rrf_fusion" -> Map("broadcast-nested-loop" -> 2),
    "q150_sparse_cosine" -> Map("broadcast-nested-loop" -> 4),
    "q136_ann_recall" -> Map("broadcast-nested-loop" -> 1),
    "q86_ann_ivf_multiprobe" -> Map("broadcast-nested-loop" -> 1),
    "q112_euclidean_topk" -> Map("broadcast-nested-loop" -> 1),
    "q114_mips_topk" -> Map("broadcast-nested-loop" -> 1),
    "q196_pq_adc_recall" -> Map("broadcast-nested-loop" -> 6),
    "q200_ivfadc" -> Map("broadcast-nested-loop" -> 4),
    "q245_sql_cosine_topk" -> Map("broadcast-nested-loop" -> 1),
    "q134_lm_band_filter" -> Map("broadcast-nested-loop" -> 1),
    "q237_qq_table" -> Map("broadcast-nested-loop" -> 1),
    "q161_silhouette" -> Map("broadcast-nested-loop" -> 1),
    "q192_sliding_distinct" -> Map("broadcast-nested-loop" -> 2),
    "q169_ndcg" -> Map("broadcast-nested-loop" -> 1),
    "q170_reciprocal_rank" -> Map("broadcast-nested-loop" -> 1),
    "q264_average_precision" -> Map("broadcast-nested-loop" -> 1),
    "q300_retrieval_report" -> Map("broadcast-nested-loop" -> 3),
    "q174_quantized_recall" -> Map("broadcast-nested-loop" -> 2),
    // q363: three tiny-build-side broadcasts by contract — (1) the
    // bruteTopK query-set broadcast riding its non-equi (q != n)
    // condition (the q30/q302 precedent), and (2)+(3) the fetchN·|Q|
    // candidate set and the |Q| query-vector set broadcast back into one
    // corpus scan to pick up vectors; both are bounded by fetchN and the
    // query count, never by the corpus (see mmrRerank's scaladoc).
    "q363_mmr_rerank" -> Map("broadcast-nested-loop" -> 3),
    // q366: the same bounded family through the IVF fetch — the
    // ivfAssign corpus-vs-16-seed broadcast cross, the query-vs-seed
    // probe-scoring cross (both |seeds|-bounded build sides), and the
    // candidate-set broadcast back into the corpus scan (fetchN·|Q|
    // rows). The bucketed candidate join itself is an equi join.
    "q366_mmr_rerank_ivf" -> Map("broadcast-nested-loop" -> 3),
    // one-row global buyer-count total attached via crossJoin(broadcast);
    // Catalyst pushes the share filter into the join, compiling the
    // predicate-free cross-broadcast into a conditioned BNL whose build
    // side is exactly ONE row — benign at any scale.
    "q333_complement_substitute" -> Map("broadcast-nested-loop" -> 1),
    // q377: four bruteTopK query-set broadcasts riding the non-equi
    // (q != n) condition — one exact ranking plus one per truncated d'
    // (|MatryoshkaDims| = 3 beyond full width collapses with the exact
    // plan's reuse to 4 distinct BNLs). Each build side is the
    // NumQueries-row query set by contract, never the corpus — the
    // q30/q136/q363 precedent.
    "q377_matryoshka_recall" -> Map("broadcast-nested-loop" -> 4),
    // q398: Supervised.persistCells squeezes the BOUNDED (winner, loser,
    // cnt) cell table (<= |entities|^2, guarded at 64k cells) onto one
    // partition so each training iteration is a one-task job; the final
    // wins/losses readout reuses that relation, so its coalesce(1) shows
    // in the returned plan. Corpus-sized relations never pass through it.
    "q398_bradley_terry" -> Map("coalesce-1" -> 1),
    // q419: the propensity-matching join runs on the BOUNDED (t, x)
    // CELL tables (persistCells, 64k guard) — the one-partition cell
    // relation shows as coalesce-1 through the treated/control/total
    // readouts, and the caliper |Δpq| <= c condition is non-equi over
    // those same cell tables, so its BNL build side is cells, never
    // rows (the q30 bounded-build-side precedent).
    "q419_psm_att" -> Map("broadcast-nested-loop" -> 1, "coalesce-1" -> 3),
    // q425: the q419 plan verbatim, reached through the graft_psm_att
    // TVF (SqlRegistrySpec pins the two bit-identical) — same bounded
    // cell-table BNL/coalesce-1 adjudication as q419.
    "q425_sql_psm_att" -> Map("broadcast-nested-loop" -> 1,
      "coalesce-1" -> 3))

  test("every query's warn-level lint findings stay within the budget") {
    val over = SparkEntry.allDefs.flatMap { q =>
      val counts = ScaleLint.warnings(q.fn(spark, sf))
        .groupBy(_.rule).view.mapValues(_.size).toMap
      val allowed = budget.getOrElse(q.name, Map.empty)
      val excess = counts.filter { case (r, c) =>
        c > allowed.getOrElse(r, 0) }
      if (excess.nonEmpty) Some(q.name -> excess) else None
    }
    assert(over.isEmpty,
      s"unadjudicated scale warnings (add to the budget WITH a reason, " +
        s"or fix the plan): $over")
  }

  test("the budget carries no stale entries") {
    val stale = budget.keySet.diff(SparkEntry.allDefs.map(_.name).toSet)
    assert(stale.isEmpty, s"budget names unknown queries: $stale")
  }
}
