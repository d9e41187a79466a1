package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation recipe — the composition a real
  * training-data pipeline runs, built entirely from this library's
  * individually oracle-verified stages:
  *
  *   normalize → [boilerplate tile removal] → rule filter (Gopher) →
  *   exact dedup → near-dup (MinHash-LSH, transitive) → per-source
  *   mixture sampling
  *
  * The bracketed stage is opt-in (`boilerplateTileWords`): the C4
  * repeated-span rule rewrites documents in place; a doc hollowed out to
  * nothing is then dropped by the word-count rule, not by the rewrite.
  *
  * Returned as (curated corpus, per-stage audit counts). The audit is the
  * artifact a data lead actually reviews: how many documents each stage
  * removed, in order.
  *
  * Scale properties are inherited from the stages (each documented and
  * plan-pinned at its definition): normalization and rule filtering are
  * zero-shuffle map passes fused into the scan; exact dedup shuffles
  * (hash, id) never text; the near-dup stage is the bucketed LSH path;
  * the mixture sample is a broadcast-rate map filter. The stage
  * boundaries materialize nothing — the whole recipe is one lazy plan
  * per output, and the audit reuses localCheckpointed survivors so no
  * stage recomputes its predecessors.
  */
object Curation {

  def curate(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String,
      boilerplateTileWords: Option[Int] = None,
      boilerplateMaxOccurrences: Long = 1L): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._

    // 1. canonical text (normalizeText emits `norm` + `changed`)
    val normalized = TextAnalysis.normalizeText(docs, textCol)
      .withColumn(textCol, col("norm")).drop("norm", "changed")
      .localCheckpoint(false) // stats-ok: one-shot pipeline stage reused downstream + by the audit

    // 1b. optional boilerplate tile removal (the C4 repeated-span rule):
    //     documents are REWRITTEN, not dropped — a doc hollowed out to
    //     nothing then fails the word-count rule in stage 2 naturally.
    val deboiled = boilerplateTileWords match {
      case Some(w) =>
        Dedup.removeBoilerplateTiles(normalized, idCol, textCol,
            tileWords = w, maxOccurrences = boilerplateMaxOccurrences)
          .withColumn(textCol, col("clean_text"))
          .drop("n_tiles", "n_kept", "clean_text")
          .localCheckpoint(false) // stats-ok: one-shot pipeline stage reused downstream + by the audit
      case None => normalized
    }

    // 2. rule-based quality filter (keep only passing docs)
    val kept = TextAnalysis.gopherFilter(deboiled, idCol, textCol)
      .filter(col("keep")).select(col(idCol))
    val filtered = deboiled.join(kept, idCol).localCheckpoint(false) // stats-ok: one-shot pipeline stage reused downstream + by the audit

    // 3. exact duplicate removal (first id per content hash survives)
    val keepers = Dedup.exactDedup(filtered, idCol, textCol)
      .select(col("keeper").as(idCol))
    val exactDeduped = filtered.join(keepers, idCol).localCheckpoint(false) // stats-ok: one-shot pipeline stage reused downstream + by the audit

    // 4. near-duplicate removal: LSH candidate pairs, exact-verified,
    //    clustered transitively; cluster representatives survive
    val pairs = Dedup.minhashLshPairs(exactDeduped, idCol, textCol)
    val nearDeduped = Dedup
      .dropDuplicatesTransitive(exactDeduped, idCol, pairs, "d1", "d2")
      .localCheckpoint(false) // stats-ok: one-shot pipeline stage reused downstream + by the audit

    // 5. mixture-balanced deterministic sample (per-source token budget)
    val rates = PipelineOps
      .mixtureWeights(nearDeduped, groupCol,
        size(graft.functions.TextFunctions.tokens(col(textCol))).cast("long"))
      .select(col(groupCol),
        floor(col("weight") * 256).cast("int").as("__rate256"))
    val sampled = nearDeduped.join(broadcast(rates), groupCol)
      .filter(col("__rate256") >= 256 ||
        PipelineOps.hashSamplePredicate(col(idCol),
          lpad(lower(hex(col("__rate256"))), 2, "0")))
      .drop("__rate256")

    val audit = Seq(
      "0_input" -> docs.count(),
      "1_normalized" -> normalized.count(),
      "1b_nonempty_after_boilerplate" ->
        deboiled.filter(length(col(textCol)) > 0).count(),
      "2_rule_filtered" -> filtered.count(),
      "3_exact_deduped" -> exactDeduped.count(),
      "4_near_deduped" -> nearDeduped.count(),
      "5_mixture_sampled" -> sampled.count()
    ).toDF("stage", "n_docs")
    (sampled, audit)
  }
}
