package graft.operators

import graft.SparkSpec

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("unionEvolved aligns by name, nulls missing columns, adds no shuffle") {
    val gen1 = Seq((1L, 10.0)).toDF("k", "price")
    val gen2 = Seq((2L, 20.0, "B")).toDF("k", "price", "grade")
    val gen3 = Seq(("C", 3L)).toDF("grade", "k") // different column ORDER too
    val got = Relational.unionEvolved(Seq(gen1, gen2, gen3))
      .orderBy("k")
      .as[(Long, Option[Double], Option[String])].collect()
    assert(got === Array(
      (1L, Some(10.0), None),
      (2L, Some(20.0), Some("B")),
      (3L, None, Some("C"))))
    val plan = Relational.unionEvolved(Seq(gen1, gen2, gen3))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"schema alignment must be map-side only:\n$plan")
  }

  test("intervalOverlapJoin equals the brute non-equi join, each pair once") {
    // Irregular intervals crossing bucket boundaries, touching endpoints
    // (closed overlap), multi-bucket spans, and disjoint pairs.
    val a = Seq((1L, 0L, 100L), (2L, 250L, 260L), (3L, 90L, 410L))
      .toDF("a_id", "a_s", "a_e")
    val b = Seq((10L, 100L, 150L), (20L, 255L, 255L), (30L, 0L, 500L),
      (40L, 161L, 170L)).toDF("b_id", "b_s", "b_e")
    val got = Relational
      .intervalOverlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", bucketSeconds = 50)
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    val brute = a.join(b, $"a_s" <= $"b_e" && $"b_s" <= $"a_e")
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    // Exactly once per overlapping pair: compare as SORTED SEQUENCES, not
    // sets — the first-shared-bucket condition replaces distinct, so a
    // duplicate emission would be a real bug a set comparison hides.
    assert(got.sorted === brute.sorted)
    assert(got.toSet.contains((1L, 10L)), "endpoint touch must overlap")
    assert(!got.toSet.contains((1L, 40L)))
  }
}
