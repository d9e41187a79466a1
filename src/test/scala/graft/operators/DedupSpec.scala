package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("IVF-bucketed near-dup pairs are a subset of the brute-force pairs") {
    val e = Tables.embeddings(spark, sf)
    val brute = Dedup.cosinePairs(e, "vec_id", "embedding", 0.3)
      .select($"v1", $"v2").as[(Long, Long)].collect().toSet
    val ivf = Dedup.cosinePairsIvf(e, e.filter($"vec_id" < 8),
        "vec_id", "embedding", 0.3)
      .select($"v1", $"v2").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    assert(ivf.subsetOf(brute), "bucketing must never invent pairs")
  }

  test("IVF-bucketed near-dup is deterministic across runs") {
    val e = Tables.embeddings(spark, sf)
    def run() = Dedup.cosinePairsIvf(e, e.filter($"vec_id" < 8),
        "vec_id", "embedding", 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(run() === run())
  }
}
