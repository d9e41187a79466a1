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
}
