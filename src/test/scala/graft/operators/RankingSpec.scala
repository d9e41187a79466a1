package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {
  import spark.implicits._

  // Two queries over a 4-item corpus: q1's ranking hits relevant items at
  // ranks 1 and 3 (of 3 relevant overall); q2 finds nothing.
  private def ranked = Seq(
    (1L, 1, 11L), (1L, 2, 12L), (1L, 3, 13L),
    (2L, 1, 11L), (2L, 2, 12L), (2L, 3, 13L))
    .toDF("query_id", "rank", "neighbor_id")
  private def relevant = Seq(
    (1L, 11L), (1L, 13L), (1L, 99L)).toDF("query_id", "neighbor_id")

  test("ndcgAtK matches the hand-computed harmonic-discount values") {
    val got = Ranking.ndcgAtK(ranked, relevant, k = 3)
      .orderBy($"query_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // q1: dcg = 1e6/2 + 1e6/4 = 750000; ideal m = min(3, 3) = 3:
    // idcg = 1e6/2 + 1e6/3 + 1e6/4 = 500000 + 333333 + 250000 = 1083333.
    val dcg = 750000L
    val idcg = 1083333L
    val ndcg = dcg * 1000000L / idcg
    assert(got === Array(
      (1L, 2L, 3L, dcg, idcg, ndcg),
      (2L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("a perfect ranking of k relevant items scores ndcg exactly 1e6") {
    val perfect = Seq((7L, 1, 1L), (7L, 2, 2L)).toDF("query_id", "rank", "neighbor_id")
    val rel = Seq((7L, 1L), (7L, 2L)).toDF("query_id", "neighbor_id")
    val row = Ranking.ndcgAtK(perfect, rel, k = 2)
      .select($"ndcg_micro").as[Long].head()
    assert(row === 1000000L)
  }

  test("reciprocalRank reports the first hit and mrr floors the mean") {
    val rr = Ranking.reciprocalRank(ranked, relevant, k = 3)
      .orderBy($"query_id").as[(Long, Long, Long)].collect()
    assert(rr === Array((1L, 1L, 1000000L), (2L, 0L, 0L)))
    val m = Ranking.mrr(ranked, relevant, k = 3)
      .as[(Long, Long)].head()
    assert(m === ((2L, 500000L)))
  }

  test("quantizedTopK is partitioning-invariant and self-consistent") {
    val e = graft.Tables.embeddings(spark, sf)
    val a = Ranking.quantizedTopK(e, col("vec_id") < 5, "vec_id", "embedding", 4)
      .orderBy($"query_id", $"rank")
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Int, Long)].collect()
    val b = Ranking.quantizedTopK(e.repartition(7), col("vec_id") < 5,
        "vec_id", "embedding", 4)
      .orderBy($"query_id", $"rank")
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Int, Long)].collect()
    assert(a === b)
    assert(a.length === 5 * 4)
  }

  test("graft_doti equals the HOF zip_with fold and poisons on null") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-2L, 7L), Seq(3L, -1L))).toDF("a", "b")
    val native = df.select(
      graft.functions.TextFunctions.doti($"a", $"b")).as[Long].collect()
    val hof = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
      .as[Long].collect()
    assert(native === hof)
    assert(native === Array(32L, -13L))
  }

  test("hits computes the hand-worked bipartite fixpoint steps") {
    // h1 -> {a1, a2}, h2 -> {a1}: a1 is the stronger authority, h1 the
    // stronger hub; two iterations, every value hand-derived.
    val e = Seq((1L, 10L), (1L, 20L), (2L, 10L)).toDF("s", "d")
    val got = Graph.hits(e, "s", "d", iterations = 2, checkpoint = false)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      1L -> (0L, 1000000L), // pure hub, the stronger one
      2L -> (0L, 625000L),
      10L -> (1000000L, 0L), // pure authority, the stronger one
      20L -> (600000L, 0L)))
  }

  test("temperatureShares boosts small groups monotonically") {
    val df = (1 to 100).map(i => ("big", i)).toDF("g", "x")
      .union(Seq(("small", 1)).toDF("g", "x"))
    val got = PipelineOps.temperatureShares(df, "g", lit(1L))
      .orderBy($"g").as[(String, Long, Long, Long, Long, Long)].collect()
    val Array((_, _, bigTok, _, bigNat, bigShare),
      (_, _, smallTok, _, smallNat, smallShare)) = got
    assert(bigTok === 100L && smallTok === 1L)
    // sqrt tempering: the small group's share rises, the big one's falls.
    assert(smallShare > smallNat)
    assert(bigShare < bigNat)
    // w = 10 and 1: shares are 10/11 and 1/11 in micro units.
    assert(bigShare === 909090L && smallShare === 90909L)
  }
}
