package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("retention buckets distinct users by cohort day and whole-week offset") {
    val e = Seq(
      // user 1: first touch day 1, returns day 8 (week 1) and day 9 (week 1
      // again — must count once)
      (1L, "2024-01-01"), (1L, "2024-01-08"), (1L, "2024-01-09"),
      // user 2: same cohort day, never returns
      (2L, "2024-01-01"),
      // user 3: later cohort, returns within week 0
      (3L, "2024-01-03"), (3L, "2024-01-04"))
      .toDF("user_id", "day")
      .select(col("user_id"), col("day").cast("timestamp").as("ts"))
    val got = Analytics.retention(e, "user_id", "ts")
      .orderBy("cohort_day", "bucket_offset")
      .select(col("cohort_day").cast("string"), col("bucket_offset"),
        col("users"))
      .as[(String, Long, Long)].collect()
    assert(got === Array(
      ("2024-01-01", 0L, 2L),
      ("2024-01-01", 1L, 1L),
      ("2024-01-03", 0L, 1L)))
  }

  test("retention plans as aggregate + join, not a window sort") {
    val e = Seq((1L, "2024-01-01")).toDF("user_id", "day")
      .select(col("user_id"), col("day").cast("timestamp").as("ts"))
    val plan = Analytics.retention(e, "user_id", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window sort:\n$plan")
  }
}
