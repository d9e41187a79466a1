package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The unbounded-domain contract of the cumulative family: with
  * `quantized = false` every member must (a) return exactly the rows of
  * its default window formulation, and (b) plan with no SinglePartition
  * exchange anywhere on the data path — the two-pass prefix machinery
  * replaces the single-task window. The fixtures use hash-derived
  * near-unique values, the continuous-domain stress where the
  * distinct-value collapse is corpus-sized.
  */
class DistributedPrefixSpec extends SparkSpec {
  import spark.implicits._

  private def assertSameRows(got: DataFrame, want: DataFrame,
      hint: String): Unit = {
    assert(got.schema.fieldNames.toSeq === want.schema.fieldNames.toSeq,
      s"$hint: column mismatch")
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"$hint: unquantized path must equal the window formulation")
  }

  // ~20k rows, hash-valued: essentially every value distinct.
  private lazy val scored = spark.range(20000)
    .select($"id",
      (xxhash64($"id") % 1000000007L).as("score"),
      (xxhash64($"id" + 7) % 3 === 0).as("y"))
    .localCheckpoint(true)

  test("cumSums equals grouped window sums and exclusive prefix max, null group included") {
    val grouped = spark.range(5000)
      .select(
        when($"id" % 7 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("g"), ($"id" % 3).cast("string"))).as("g"),
        xxhash64($"id" * 13 + 1).as("v"),
        ($"id" % 13).as("a"), (($"id" * 31) % 17).as("b"))
      .groupBy($"g", $"v")
      .agg(sum($"a").as("a"), max($"b").as("b"))
      .localCheckpoint(true)
    val wInc = Window.partitionBy($"g").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wExc = Window.partitionBy($"g").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = grouped.select($"g", $"v",
      sum($"a").over(wInc).as("cum_a"), max($"b").over(wExc).as("prevmax_b"))
    val got = DistributedPrefix.cumSums(grouped, Seq("g"), Seq(col("v")),
        Seq("a"), maxCols = Seq("b"), partitions = 7)
      .select($"g", $"v", $"cum_a", $"prevmax_b")
    assertSameRows(got, want, "cumSums")
  }

  test("cumSums descending order and rank-style running count") {
    val grouped = spark.range(3000)
      .select(xxhash64($"id").as("v"), lit(1L).as("one"))
    val w = Window.orderBy($"v".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = grouped.select($"v", sum($"one").over(w).as("cum_one"))
    val got = DistributedPrefix.cumSums(grouped, Nil, Seq(col("v").desc),
        Seq("one"), partitions = 5)
      .select($"v", $"cum_one")
    assertSameRows(got, want, "desc cumSums")
  }

  test("rocAuc unquantized equals quantized on a continuous score domain") {
    assertSameRows(
      Profile.rocAuc(scored, $"y", $"score", quantized = false),
      Profile.rocAuc(scored, $"y", $"score", quantized = true), "rocAuc")
  }

  test("prCurve unquantized equals quantized on a continuous score domain") {
    assertSameRows(
      Profile.prCurve(scored, $"y", $"score", quantized = false),
      Profile.prCurve(scored, $"y", $"score", quantized = true), "prCurve")
  }

  test("gainsTable unquantized equals quantized on a continuous score domain") {
    assertSameRows(
      Profile.gainsTable(scored, $"score", $"y", quantized = false),
      Profile.gainsTable(scored, $"score", $"y", quantized = true), "gainsTable")
  }

  test("skyline unquantized equals quantized on a continuous x domain") {
    val pts = spark.range(20000).select(
      (xxhash64($"id") % 999983L).as("x"), ($"id" % 701).as("y"))
    assertSameRows(
      Profile.skyline(pts, $"x", $"y", quantized = false),
      Profile.skyline(pts, $"x", $"y", quantized = true), "skyline")
  }

  test("ksTest unquantized equals quantized on a continuous value domain") {
    val df = spark.range(20000).select(
      concat(lit("p"), ($"id" % 4).cast("string")).as("g"),
      (xxhash64($"id" * 3) % 1000003L).cast("double").as("v"),
      (xxhash64($"id" + 11) % 2 === 0).as("a"))
    assertSameRows(
      Profile.ksTest(df, "g", "v", $"a", !$"a", quantized = false),
      Profile.ksTest(df, "g", "v", $"a", !$"a", quantized = true), "ksTest")
  }

  test("weightedMedian unquantized equals quantized on a continuous value domain") {
    val df = spark.range(20000).select(
      concat(lit("s"), ($"id" % 5).cast("string")).as("g"),
      abs(xxhash64($"id" * 7) % 1000000007L).as("v"),
      ($"id" % 97 + 1).as("wt"))
    assertSameRows(
      Analytics.weightedMedian(df, "g", "v", "wt", quantized = false),
      Analytics.weightedMedian(df, "g", "v", "wt", quantized = true), "weightedMedian")
  }

  test("otsuThreshold unquantized equals quantized on a continuous value domain") {
    val df = spark.range(20000).select(
      concat(lit("k"), ($"id" % 3).cast("string")).as("g"),
      abs(xxhash64($"id" * 17) % 1000003L).as("v"))
    assertSameRows(
      Analytics.otsuThreshold(df, "g", "v", quantized = false),
      Analytics.otsuThreshold(df, "g", "v"), "otsuThreshold")
  }

  test("lengthCapPlan unquantized equals quantized on a continuous length domain") {
    val df = spark.range(20000)
      .select((abs(xxhash64($"id" * 5)) % 100000L + 1L).as("len"))
    assertSameRows(
      PipelineOps.lengthCapPlan(df, "len", 3L, 5L, quantized = false),
      PipelineOps.lengthCapPlan(df, "len", 3L, 5L), "lengthCapPlan")
    // An exact-budget-landing cap must also agree.
    assertSameRows(
      PipelineOps.lengthCapPlan(df, "len", 1L, 2L, quantized = false),
      PipelineOps.lengthCapPlan(df, "len", 1L, 2L), "lengthCapPlan 1/2")
  }

  test("apportion unquantized equals quantized over corpus-scale strata") {
    val df = spark.range(8000).select(
      concat(lit("d"), $"id".cast("string")).as("g"),
      (abs(xxhash64($"id")) % 1000L + 1L).as("wt"))
    assertSameRows(
      PipelineOps.apportion(df, "g", "wt", 99991L, quantized = false),
      PipelineOps.apportion(df, "g", "wt", 99991L), "apportion")
  }

  test("decileTable unquantized equals quantized on a continuous value domain") {
    val df = spark.range(20000).select(
      concat(lit("g"), ($"id" % 4).cast("string")).as("g"),
      (xxhash64($"id" * 11) % 1000000007L).as("v"))
    assertSameRows(
      Analytics.decileTable(df, "g", $"v", quantized = false),
      Analytics.decileTable(df, "g", $"v", quantized = true), "decileTable")
  }

  test("iqrOutliers unquantized equals quantized on a continuous value domain") {
    val df = spark.range(20000).select(
      concat(lit("g"), ($"id" % 4).cast("string")).as("g"),
      (xxhash64($"id" * 13) % 1000000007L).as("v"))
    assertSameRows(
      Analytics.iqrOutliers(df, "g", $"v", quantized = false),
      Analytics.iqrOutliers(df, "g", $"v", quantized = true), "iqrOutliers")
  }

  test("qqTable unquantized equals quantized on a continuous value domain") {
    val df = spark.range(20000).select(
      abs(xxhash64($"id" * 19) % 1000003L).as("v"),
      (xxhash64($"id" + 3) % 2 === 0).as("a"))
    assertSameRows(
      Profile.qqTable(df, $"v", $"a", !$"a", quantized = false),
      Profile.qqTable(df, $"v", $"a", !$"a", quantized = true), "qqTable")
  }

  test("conversionLatency unquantized equals quantized") {
    import java.sql.Timestamp
    val events = (0 until 400).flatMap { i =>
      val base = 1700000000L + i * 3600L
      Seq((i.toLong, new Timestamp(base * 1000L), 2L * i, "click"),
        (i.toLong, new Timestamp((base + 7 + i % 50) * 1000L),
          2L * i + 1, "purchase"))
    }.toDF("user_id", "ts", "event_id", "event_type")
    assertSameRows(
      Analytics.conversionLatency(events, "user_id", "ts", "event_id",
        $"event_type" === "click", $"event_type" === "purchase",
        quantized = false),
      Analytics.conversionLatency(events, "user_id", "ts", "event_id",
        $"event_type" === "click", $"event_type" === "purchase"),
      "conversionLatency")
  }

  test("unquantized data path plans no SinglePartition exchange") {
    // The cumulative stage itself: windows are partitioned by
    // (range-partition id, group) — never a single task.
    val stage = DistributedPrefix.cumSums(
      scored.groupBy($"score".as("s")).agg(count(lit(1)).as("c")),
      Nil, Seq(col("s")), Seq("c"), partitions = 7)
    val stagePlan = stage.queryExecution.executedPlan.toString
    assert(!stagePlan.contains("SinglePartition"),
      s"single-task stage leaked:\n$stagePlan")
    assert(stagePlan.contains("windowspecdefinition(_pid"),
      s"window must be partitioned by the range-partition id:\n$stagePlan")
    // Two full operators whose plans carry no single-row broadcast aggs:
    // end-to-end they must stay SinglePartition-free.
    val pts = spark.range(2000).select(
      (xxhash64($"id") % 99991L).as("x"), ($"id" % 701).as("y"))
    val sky = Profile.skyline(pts, $"x", $"y", quantized = false)
      .queryExecution.executedPlan.toString
    assert(!sky.contains("SinglePartition"),
      s"skyline unquantized leaked a single-task stage:\n$sky")
    val ksDf = spark.range(2000).select(
      concat(lit("p"), ($"id" % 4).cast("string")).as("g"),
      xxhash64($"id" * 3).as("v"),
      (xxhash64($"id" + 11) % 2 === 0).as("a"))
    val ks = Profile.ksTest(ksDf, "g", "v", $"a", !$"a", quantized = false)
      .queryExecution.executedPlan.toString
    assert(!ks.contains("SinglePartition"),
      s"ksTest unquantized leaked a single-task stage:\n$ks")
  }
}
