package graft.plans

import graft.{SparkSpec, Tables}
import graft.operators.AsOfJoin
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native sorted-merge as-of join must be indistinguishable from the
  * composed union+window form (the semantics source of truth, itself
  * DuckDB-oracle-checked via q19/q68/q69) — while planning with the shape
  * we want: the custom exec node, no window, no union, one exchange per
  * side.
  */
class AsOfMergeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def inputs = {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
    (purchases, clicks)
  }

  private def rows(df: DataFrame) =
    df.select($"event_id", $"user_id", $"click_id")
      .as[(Long, Long, Option[Long])].collect().toSet

  test("native as-of equals the composed form on the fixture, all directions") {
    val (purchases, clicks) = inputs
    for (dir <- Seq("backward", "forward", "nearest")) {
      val composed = rows(AsOfJoin.leftAsOf(purchases, clicks,
        Seq("user_id"), "ts", "ts", Seq("click_id"), dir))
      val native = rows(AsOfJoin.leftAsOfNative(purchases, clicks,
        Seq("user_id"), "ts", "ts", Seq("click_id"), dir))
      assert(native === composed, s"direction=$dir diverged")
      assert(native.nonEmpty)
    }
  }

  test("plan: custom exec node, no window/union, one exchange per side") {
    val (purchases, clicks) = inputs
    val df = AsOfJoin.leftAsOfNative(purchases, clicks,
      Seq("user_id"), "ts", "ts", Seq("click_id"))
    df.collect()
    // AQE's toString prints Final AND Initial plans — count the final only.
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("AsOfMergeJoin"), p)
    assert(!p.contains("Window"), "window buffer must be gone:\n" + p)
    assert(!p.contains("Union"), "union widening must be gone:\n" + p)
    // 3 exchanges: one per join side + one feeding the clicks-dedup
    // aggregate (input prep, not the join's).
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 3, s"expected one exchange per side + agg prep:\n$p")
  }

  test("plan: pre-partitioned pre-sorted sides add no exchange and no sort") {
    // The scale contract behind declaring exchanges/sorts as child
    // REQUIREMENTS: a side that already has the right layout (bucketed
    // table, prior stage's output) is merged as-is. Here both sides are
    // explicitly hash-partitioned on the key and sorted by (key, time), so
    // EnsureRequirements must insert nothing — the only exchanges in the
    // plan are the two explicit repartitions, and no Sort node exists.
    val (purchases0, clicks0) = inputs
    val purchases = purchases0.repartition(4, $"user_id")
      .sortWithinPartitions($"user_id", $"ts")
    val clicks = clicks0.repartition(4, $"user_id")
      .sortWithinPartitions($"user_id", $"ts")
    val df = AsOfJoin.leftAsOfNative(purchases, clicks,
      Seq("user_id"), "ts", "ts", Seq("click_id"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("AsOfMergeJoin"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    // 2 explicit repartitions + the clicks-dedup aggregate's input prep.
    assert(exchanges <= 3, s"join added an exchange over pre-partitioned sides:\n$p")
    // Exactly the two explicit sortWithinPartitions — the join added none.
    val sorts = "Sort \\[".r.findAllIn(p).size
    assert(sorts == 2, s"join added a sort over pre-sorted sides ($sorts):\n$p")
  }

  test("null keys and null times never match; nulls pass through left-outer") {
    val left = Seq(
      (1L, Option("u1"), Option(ts("2024-01-01 10:00:00"))),
      (2L, None: Option[String], Option(ts("2024-01-01 10:00:00"))),
      (3L, Option("u1"), None: Option[Timestamp])
    ).toDF("id", "user", "t")
    val right = Seq(
      (Option("u1"), Option(ts("2024-01-01 09:00:00")), 100L),
      (None: Option[String], Option(ts("2024-01-01 09:30:00")), 666L),
      (Option("u1"), None: Option[Timestamp], 667L)
    ).toDF("user", "t", "payload")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val got = AsOfJoin.leftAsOfNative(left, right,
          Seq("user"), "t", "t", Seq("payload"), dir)
        .select($"id", $"payload").as[(Long, Option[Long])].collect().toMap
      assert(got(1L) === (if (dir == "forward") None else Some(100L)))
      assert(got(2L) === None, "null left key must not match null right key")
      assert(got(3L) === None, "null left time must not match")
    }
  }

  test("ties and boundaries: equal-time matches both directions, nearest ties backward") {
    val left = Seq(
      (1L, "u", ts("2024-01-01 10:00:00")),  // exact-time right row exists
      (2L, "u", ts("2024-01-01 10:30:00")),  // equidistant rights at 10:00/11:00
      (3L, "u", ts("2024-01-01 08:00:00")),  // before all rights
      (4L, "u", ts("2024-01-01 12:00:00"))   // after all rights
    ).toDF("id", "user", "t")
    val right = Seq(
      ("u", ts("2024-01-01 10:00:00"), 10L),
      ("u", ts("2024-01-01 11:00:00"), 11L)
    ).toDF("user", "t", "payload")
    def run(dir: String) = AsOfJoin.leftAsOfNative(left, right,
        Seq("user"), "t", "t", Seq("payload"), dir)
      .select($"id", $"payload").as[(Long, Option[Long])].collect().toMap
    assert(run("backward") === Map(1L -> Some(10L), 2L -> Some(10L),
      3L -> None, 4L -> Some(11L)))
    assert(run("forward") === Map(1L -> Some(10L), 2L -> Some(11L),
      3L -> Some(10L), 4L -> None))
    // nearest: exact hit at 10:00; the equidistant 10:30 row ties BACKWARD
    assert(run("nearest") === Map(1L -> Some(10L), 2L -> Some(10L),
      3L -> Some(10L), 4L -> Some(11L)))
  }

  test("shared-lineage right side resolves (self as-of join)") {
    val ev = Seq(
      (1L, "u", ts("2024-01-01 10:00:00"), "a"),
      (2L, "u", ts("2024-01-01 11:00:00"), "b")
    ).toDF("id", "user", "t", "tag")
    val got = AsOfJoin.leftAsOfNative(ev, ev.withColumnRenamed("id", "prev_id"),
        Seq("user"), "t", "t", Seq("prev_id"))
      .select($"id", $"prev_id").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L))
  }

  test("multi-column keys and duplicate left timestamps") {
    val left = Seq(
      (1L, "a", 1, ts("2024-01-01 10:00:00")),
      (2L, "a", 1, ts("2024-01-01 10:00:00")),  // duplicate (key, time)
      (3L, "a", 2, ts("2024-01-01 10:00:00")))
      .toDF("id", "k1", "k2", "t")
    val right = Seq(
      ("a", 1, ts("2024-01-01 09:00:00"), 91L),
      ("a", 2, ts("2024-01-01 09:00:00"), 92L))
      .toDF("k1", "k2", "t", "payload")
    val got = AsOfJoin.leftAsOfNative(left, right,
        Seq("k1", "k2"), "t", "t", Seq("payload"))
      .select($"id", $"payload").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 91L, 2L -> 91L, 3L -> 92L))
  }
}
