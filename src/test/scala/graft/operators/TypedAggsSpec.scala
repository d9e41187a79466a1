package graft.operators

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

class TypedAggsSpec extends SparkSpec {

  test("typed top-k aggregator equals the window row_number formulation") {
    val viaAgg = SparkEntry.queries("q34_topk_aggregator")(spark, sf)
    val viaWindow = SparkEntry.queries("q09_window_topk")(spark, sf)
    assert(viaAgg.collect().toSeq === viaWindow.collect().toSeq)
  }

  test("approx_count_distinct is within the configured error of truth") {
    val approx = SparkEntry.queries("q36_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.05,
        s"$k: approx ${approx(k)} vs exact $n")
    }
  }
}
