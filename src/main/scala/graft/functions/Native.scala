package graft.functions

import org.apache.spark.sql.SparkSession

/** Registration of the engine's native Catalyst expressions as SQL
  * functions. Idempotent per session; every session factory
  * (GraftSession) and driver entry point (SparkEntry.queries wrappers,
  * Verify, Bench) calls this, so user code can rely on `graft_cosine`
  * resolving in both the Column API (via call_function) and raw SQL.
  */
object Native {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => {
        require(exprs.length == 2, "graft_cosine(a, b) takes two arrays")
        CosineSimilarity(exprs.head, exprs(1))
      },
      "built-in")
}
