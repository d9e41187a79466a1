package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curation recipe composes: monotone stage counts, clean deterministic output") {
    graft.functions.Native.register(spark)
    val docs = graft.Tables.documents(spark, sf)
    val (out, audit) = Curation.curate(docs, "doc_id", "text", "source")
    val stages = audit.orderBy("stage").as[(String, Long)].collect()
    assert(stages.map(_._1) === Array("0_input", "1_normalized",
      "1b_nonempty_after_boilerplate", "2_rule_filtered", "3_exact_deduped",
      "4_near_deduped", "5_mixture_sampled"))
    val counts = stages.map(_._2)
    assert(counts(0) === counts(1), "normalization must not drop rows")
    assert(counts.sliding(2).forall { case Array(a, b) => b <= a },
      s"stage counts must be monotone nonincreasing: ${counts.toSeq}")
    assert(counts.last > 0 && counts.last === out.count())
    // curated corpus: unique ids, canonical text (no runs, no tabs, trimmed)
    assert(out.select("doc_id").distinct().count() === counts.last)
    assert(out.filter(col("text").rlike("  |\\t|^ | $")).count() === 0,
      "curated text must be canonical")
    // deterministic end-to-end: a rerun selects the identical document set
    val (out2, _) = Curation.curate(docs, "doc_id", "text", "source")
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ===
      out2.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("curation with the boilerplate stage rewrites exact-duplicate spans away") {
    graft.functions.Native.register(spark)
    val docs = graft.Tables.documents(spark, sf)
    val (out, audit) = Curation.curate(docs, "doc_id", "text", "source",
      boilerplateTileWords = Some(8))
    val stages = audit.orderBy("stage").as[(String, Long)].collect().toMap
    // strict threshold + exact-dup fixture docs → their shared tiles are
    // hollowed out, so SOME docs lose all text before the rule filter…
    assert(stages("1b_nonempty_after_boilerplate") < stages("1_normalized"),
      s"expected hollowed-out docs, got $stages")
    // …and the pipeline still produces a nonempty, deterministic corpus
    assert(stages("5_mixture_sampled") > 0 &&
      stages("5_mixture_sampled") === out.count())
    // the stage is deterministic end-to-end: a rerun selects the
    // identical document set AND identical rewritten text
    val (out2, _) = Curation.curate(docs, "doc_id", "text", "source",
      boilerplateTileWords = Some(8))
    assert(out.select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
      .toSeq === out2.select("doc_id", "text").as[(Long, String)].collect()
      .sortBy(_._1).toSeq)
  }
}
