package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // Undirected path 1–2–3 fed as both edge directions.
  private def pathEdges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    .toDF("src", "dst")

  test("pagerank matches the hand-computed integer fixpoint on a path graph") {
    // deg: 1→1, 2→2, 3→1; start 1e6 each.
    // iter1: in(1)=500000, in(2)=2000000, in(3)=500000
    //        r1 = 150000 + 85%·in = (575000, 1850000, 575000)
    // iter2: contribs (575000, 925000, 575000)
    //        r2 = (936250, 1127500, 936250)
    val got = Graph.pagerank(pathEdges, "src", "dst", iterations = 2)
      .orderBy(col("node_id"))
      .as[(Long, Long)].collect()
    assert(got === Array((1L, 936250L), (2L, 1127500L), (3L, 936250L)))
  }

  test("pagerank is partitioning-invariant (exact BIGINT algebra)") {
    val a = Graph.pagerank(pathEdges, "src", "dst", 3)
      .orderBy(col("node_id")).as[(Long, Long)].collect()
    val b = Graph.pagerank(pathEdges.repartition(7), "src", "dst", 3)
      .orderBy(col("node_id")).as[(Long, Long)].collect()
    assert(a === b)
  }

  test("pagerank iteration aggregates contributions map-side (hash agg, no window)") {
    val plan = Graph.pagerank(pathEdges, "src", "dst", 1, checkpoint = false)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("hashaggregate"),
      s"expected hash aggregation for the contribution sum:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window sort:\n$plan")
  }

  test("triangleStats counts the square-with-diagonal by hand") {
    // 1-2-3-4-1 plus diagonal 1-3: triangles (1,2,3) and (1,3,4).
    // deg = (3,2,3,2) -> wedges = 3+1+3+1 = 8; gcc = 3*2/8 = 0.75.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("u", "v")
    val got = Graph.triangleStats(edges, "u", "v")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got === ((4L, 5L, 8L, 2L, 750000L)))
  }

  test("triangleStats canonicalizes reversed, duplicate, and self edges") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 3L)).toDF("u", "v")
    val got = Graph.triangleStats(messy, "u", "v")
      .as[(Long, Long, Long, Long, Long)].collect().head
    // One triangle on 3 nodes, 3 edges, wedges = 3, gcc = 3*1/3 = 1.
    assert(got === ((3L, 3L, 3L, 1L, 1000000L)))
  }

  test("kCore peels a two-round cascade down to the triangle core") {
    // Triangle (1,2,3) with a pendant chain 3-4-5. k=2: round 1 drops 5
    // (degree 1), which exposes 4 (now degree 1) for round 2.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val after1 = Graph.kCore(edges, "u", "v", k = 2, rounds = 1)
      .as[(Long, Long)].collect()
    assert(after1.map(_._1).toSet === Set(1L, 2L, 3L, 4L),
      "one round must only peel the degree-1 leaf")
    val core = Graph.kCore(edges, "u", "v", k = 2, rounds = 3)
      .as[(Long, Long)].collect()
    assert(core === Array((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kCore is partitioning-invariant and empty below the threshold") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    val a = Graph.kCore(edges, "u", "v", 2, 2).as[(Long, Long)].collect()
    val b = Graph.kCore(edges.repartition(5), "u", "v", 2, 2)
      .as[(Long, Long)].collect()
    assert(a === b)
    assert(Graph.kCore(edges, "u", "v", 3, 2).count() === 0L,
      "a triangle has no 3-core")
  }

  test("pagerank truncates lineage per iteration (checkpointed scan, not a growing plan)") {
    val plan = Graph.pagerank(pathEdges, "src", "dst", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the last iteration to read the checkpointed ranks:\n$plan")
    assert(!plan.toLowerCase.contains("hashaggregate"),
      s"lineage was not truncated:\n$plan")
  }
}
