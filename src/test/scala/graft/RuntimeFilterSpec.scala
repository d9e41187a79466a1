package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the AQE-era lever that prunes fact
  * rows BEFORE the shuffle when the dimension side is selectively
  * filtered. At 100 TB this is the difference between shuffling the whole
  * fact table and shuffling only rows whose key can possibly match. The
  * thresholds here are forced down because the test fixture is tiny; on a
  * cluster the defaults (creation side ≤ 10 MB, application scan ≥ 10 GB)
  * target exactly the fact⋈filtered-dim shape.
  */
class RuntimeFilterSpec extends SparkSpec {

  // This suite flips session confs (broadcast threshold, bloom-filter
  // thresholds) mid-test. sbt runs suites concurrently in one JVM, and
  // `getOrCreate` hands every suite the same session — so mutate an
  // ISOLATED `newSession()` (own SQLConf, shared context) instead of
  // racing the plan-shape suites reading the shared one.
  override lazy val spark: org.apache.spark.sql.SparkSession = {
    val s = GraftSession.local(cpus = 4, appName = suiteName).newSession()
    functions.Native.register(s)
    s
  }

  test("selective dim filter injects a bloom filter on the fact scan side") {
    val prev = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.getOption(
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join: broadcast joins prune by construction,
      // shuffle joins are where the runtime filter earns its keep
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(spark, sf)
      val part = Tables.part(spark, sf).filter(col("p_size") === 1)
      val joined = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_size")).agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("might_contain") || p.contains("bloom_filter"),
        s"runtime bloom filter not injected:\n${p.take(2000)}")
      // and it must not have changed the answer
      val withFilter = joined.collect().map(r => (r.getInt(0), r.getLong(1)))
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_size")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      assert(withFilter.toSeq === without.toSeq)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
