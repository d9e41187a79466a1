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

  test("dedupClusters closes chains transitively and labels by minimum id") {
    // Two clusters: {1,2,3,4} connected only as a chain 1-2, 2-3, 3-4
    // (so transitive closure is required), and {7,9}. Node 5 has no pair
    // and must not appear.
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (9L, 7L))
      .toDF("d1", "d2")
    val got = Dedup.dedupClusters(pairs, "d1", "d2")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 9L -> 7L))
  }

  test("dropDuplicatesTransitive keeps one representative per cluster and all unpaired docs") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("doc_id", "text")
    // cluster {1,2,3} via chain; 4 and 5 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2")
    val kept = Dedup.dropDuplicatesTransitive(docs, "doc_id", pairs, "d1", "d2")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 5L))
  }

  test("dupMatrix counts unordered group pairs, folding both orientations") {
    val dims = Seq((1L, "s1"), (2L, "s2"), (3L, "s2"), (4L, "s1"))
      .toDF("id", "src")
    // (1,2) s1-s2; (3,1) s2-s1 folds into the same cell; (4,1) s1-s1
    val pairs = Seq((1L, 2L), (3L, 1L), (4L, 1L)).toDF("a", "b")
    val got = Dedup.dupMatrix(pairs, "a", "b", dims, "id", "src")
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("s1", "s2", 2L), ("s1", "s1", 1L)))
  }

  test("dedupClusters handles a long path needing several propagation rounds") {
    // A 12-node path: min-label propagation needs O(diameter) iterations,
    // so this exercises the driver loop beyond a single round.
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = Dedup.dedupClusters(pairs, "d1", "d2")
      .as[(Long, Long)].collect().toMap
    assert(got === (1L to 12L).map(_ -> 1L).toMap)
  }

  test("dedupKeepBest elects the highest-score member, ties to the lowest id") {
    val docs = Seq(
      (1L, "a", 5L), (2L, "b", 9L), (3L, "c", 9L),  // cluster {1,2,3}: 2 and 3 tie on score -> 2
      (7L, "d", 1L), (9L, "e", 4L))                  // cluster {7,9}: 9 wins on score
      .toDF("doc_id", "text", "len")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("d1", "d2")
    val got = Dedup.dedupKeepBest(docs, "doc_id", "len", pairs, "d1", "d2")
      .orderBy("cluster_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(got === Array((1L, 3L, 2L, 9L), (7L, 2L, 9L, 4L)))
  }

  test("dedupClusters refuses to spin past maxIters on pathological chains") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("d1", "d2")
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupClusters(pairs, "d1", "d2", maxIters = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("winnowOverlapPairs finds shared passages and maxDocFreq drops boilerplate") {
    // 1 and 2 share a long passage (>= k+w-1 = 6 tokens guarantees shared
    // fingerprints); 3 is unrelated. A boilerplate footer on ALL docs would
    // link everything — maxDocFreq must cut those fps out.
    val footer = "copyright footer boilerplate terms apply here"
    val docs = Seq(
      (1L, s"alpha beta the quick brown fox jumps over lazy dog gamma $footer"),
      (2L, s"delta epsilon the quick brown fox jumps over lazy dog zeta $footer"),
      (3L, s"totally unrelated content about database engines and queries $footer"))
      .toDF("doc_id", "text")

    val all = Dedup.winnowOverlapPairs(docs, "doc_id", "text", minShared = 1)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(all.contains((1L, 2L)))

    val filtered = Dedup.winnowOverlapPairs(docs, "doc_id", "text",
        minShared = 1, maxDocFreq = 2)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(filtered === Set((1L, 2L)), "footer fps (df=3) must be dropped")

    // Ordering invariant: d1 < d2 always.
    val rows = Dedup.winnowOverlapPairs(docs, "doc_id", "text", minShared = 1)
      .as[(Long, Long, Long)].collect()
    assert(rows.forall(r => r._1 < r._2))
  }
}
