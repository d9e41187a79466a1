package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling main: times named queries (or ad-hoc stages) on a scale
  * directory, warm-started, printing `[PROF]` lines. Not part of the driver
  * contract — a workbench for plan iteration (`Bench` is the reported one).
  *
  * Usage: runMain graft.Profile <sfDir> <queryName>[,<queryName>...]
  * With no query names, times every registered query once (warm).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val explain = sys.env.contains("GRAFT_PROFILE_EXPLAIN")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("GRAFT_PROFILE_LOGLEVEL", "ERROR"))
    // Ad-hoc runtime SQL conf overrides for plan experiments, e.g.
    // GRAFT_PROFILE_CONF="spark.sql.adaptive.enabled=false".
    sys.env.get("GRAFT_PROFILE_CONF").foreach(_.split(';').foreach { kv =>
      if (kv.nonEmpty) { // trailing ';' produces an empty segment
        val parts = kv.split("=", 2) // conf VALUES may contain '='
        require(parts.length == 2 && parts(0).nonEmpty,
          s"GRAFT_PROFILE_CONF entry '$kv' is not key=value")
        spark.conf.set(parts(0), parts(1))
      }
    })
    functions.Native.register(spark)

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val warm = once(n)
      val t = math.min(once(n), once(n))
      println(f"[PROF] $n%-28s warm=$warm%7.3f min2=$t%7.3f s")
      if (explain) SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
