package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named materialized relations: build once per (session, input dir,
  * name), reuse everywhere. The graph family all projects the same
  * derived relations (the distinct customer×supplier bipartite pairs;
  * the top-3000 co-sale edge list) — without a shared handle each
  * consumer re-executes the orders⨝lineitem projection + pair
  * aggregation, which is pure waste: in production such a projection is
  * owned once (a bucketed table or a cached view) and every downstream
  * graph/score query reads it.
  *
  * Implementation: a session-scoped registry of `localCheckpoint`ed
  * DataFrames. localCheckpoint both materializes (executor-local
  * storage, MEMORY_AND_DISK) and truncates lineage, so N consumers cost
  * one derivation plus N metadata-cheap scans, and iterative consumers
  * (pagerank, k-core) don't drag the projection's lineage through every
  * round. At warehouse scale the same seam is where a bucketed
  * `write.bucketBy(...).saveAsTable` + read-back would slot in ([[
  * Bucketing]] owns that pattern); the registry keeps the library
  * behavior identical either way.
  *
  * Keys include the session identity (checkpointed RDDs die with their
  * session) and the input directory (one JVM may query several scale
  * factors — the test suites do).
  */
object Materialized {
  private val cache = new ConcurrentHashMap[(Int, String, String), DataFrame]()

  /** The relation registered under (session, dir, name), building and
    * checkpointing it on first use.
    */
  def of(s: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame =
    cache.computeIfAbsent(
      (System.identityHashCode(s), dir, name),
      _ => build.localCheckpoint())

  /** Drop every cached relation (tests / memory pressure). The backing
    * checkpoint blocks are released by Spark's ContextCleaner once the
    * DataFrames are unreachable.
    */
  def clear(): Unit = cache.clear()
}
