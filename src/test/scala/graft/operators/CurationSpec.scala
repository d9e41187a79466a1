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
      "2_rule_filtered", "3_exact_deduped", "4_near_deduped",
      "5_mixture_sampled"))
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
}
