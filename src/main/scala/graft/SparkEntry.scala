package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's QueryDefs into the driver-facing maps.
  * Each implemented operator from SURVEY.md §2 has a `queries` entry; those
  * expressible in ANSI SQL also have an `oracleSql` entry the driver runs in
  * DuckDB over the same parquet tables.
  */
object SparkEntry {

  /** All operator modules contributing verifiable queries. */
  def allDefs: Seq[QueryDef] =
    operators.Relational.defs ++ operators.TextAnalysis.defs ++
      operators.Dedup.defs ++ operators.Similarity.defs ++
      operators.Media.defs ++ operators.TypedAggs.defs ++
      operators.SqlSurface.defs ++ operators.PipelineOps.defs ++
      operators.Analytics.defs ++ operators.Profile.defs ++
      operators.Layout.defs ++ operators.Incremental.defs ++
      operators.Graph.defs ++ operators.Sketches.defs ++
      operators.Ranking.defs ++ operators.Supervised.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Each query runs
    * with the engine's native functions registered (idempotent).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { q =>
      q.name -> { (s: SparkSession, d: String) =>
        functions.Native.register(s); q.fn(s, d)
      }
    }.toMap

  /** Queries timed by Bench (the headline subset). */
  def headlines: Seq[QueryDef] = allDefs.filter(_.headline)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql), _) => n -> sql }.toMap
}
