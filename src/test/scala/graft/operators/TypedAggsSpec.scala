package graft.operators

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

class TypedAggsSpec extends SparkSpec {

  test("typed top-k aggregator equals the window row_number formulation") {
    val viaAgg = SparkEntry.queries("q34_topk_aggregator")(spark, sf)
    val viaWindow = SparkEntry.queries("q09_window_topk")(spark, sf)
    assert(viaAgg.collect().toSeq === viaWindow.collect().toSeq)
  }

  test("Misra-Gries candidates cover every item above total/(k+1), any layout") {
    import spark.implicits._
    // Zipf-ish stream: token i appears ~30000/i times, plus a long unique
    // tail that forces constant counter eviction.
    val skewed = (1 to 50).flatMap(i => Seq.fill(30000 / i)(s"hot_$i")) ++
      (1 to 40000).map(i => s"tail_$i")
    val n = skewed.length.toLong
    val exact = skewed.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    for (k <- Seq(50, 200); parts <- Seq(1, 7, 32)) {
      val ds = spark.sparkContext.parallelize(
        new scala.util.Random(42).shuffle(skewed), parts).toDS()
      val (cands, total) = ds.select(new TypedAggs.MisraGries(k).toColumn).head()
      assert(total === n)
      assert(cands.length <= k)
      val mustHave = exact.collect { case (t, f) if f > n / (k + 1) => t }
      val missing = mustHave.filterNot(cands.contains)
      assert(missing.isEmpty,
        s"k=$k parts=$parts: guarantee violated for ${missing.take(5)}")
    }
  }

  test("q83 heavy hitters equals the exact full groupBy answer") {
    import spark.implicits._
    val sketched = SparkEntry.queries("q83_heavy_hitters")(spark, sf)
      .as[(String, Long)].collect().toSeq
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
    val total = toks.count()
    val exact = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") * 200 > lit(total))
      .orderBy(col("token"))
      .as[(String, Long)].collect().toSeq
    assert(sketched === exact)
    assert(sketched.nonEmpty, "fixture should contain heavy tokens")
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

  test("longestIncreasingRun folds each key's rows in engine-sorted order") {
    import spark.implicits._
    // key 1: 1,3,2,4,5,6 in time order → longest strict run 2,4,5,6 = 4
    // key 2: plateaus break runs (strict) → 1,1,2 gives run 1,2 = 2
    // key 3: tied instants ordered by the tie column → 5 then 9 = 2
    val rows = Seq(
      (1L, 10L, 1L, 1.0), (1L, 20L, 2L, 3.0), (1L, 30L, 3L, 2.0),
      (1L, 40L, 4L, 4.0), (1L, 50L, 5L, 5.0), (1L, 60L, 6L, 6.0),
      (2L, 10L, 7L, 1.0), (2L, 20L, 8L, 1.0), (2L, 30L, 9L, 2.0),
      (3L, 10L, 11L, 9.0), (3L, 10L, 10L, 5.0))
      .toDF("k", "o", "t", "v")
    val got = TypedAggs.longestIncreasingRun(rows, "k", "o", "t", "v")
      .orderBy("k").as[(Long, Long)].collect()
    assert(got === Array((1L, 4L), (2L, 2L), (3L, 2L)))
    // agreement with the window gaps-and-islands form on the real fixture
    val ev = Tables.events(spark, sf)
    val viaFold = TypedAggs.longestIncreasingRun(ev, "user_id", "ts",
        "event_id", "value")
      .as[(Long, Long)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val viaWindow = ev
      .withColumn("brk",
        when($"value" > lag($"value", 1).over(w), 0).otherwise(1))
      .withColumn("grp", sum($"brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"grp").agg(count(lit(1)).as("len"))
      .groupBy($"user_id").agg(max($"len").as("longest_run"))
      .as[(Long, Long)].collect().toSet
    assert(viaFold === viaWindow)
  }
}
