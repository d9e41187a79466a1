package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (partition-at-a-time) maintenance of algebraic aggregates:
  * keep a compact per-key state (count, sum, min, max), fold each new data
  * increment into it, and derive the final report from state alone — the
  * pattern that turns a daily 100-TB full-table rollup into a
  * |keys|-sized-state + |new-partition| job. This is the batch analog of
  * the streaming aggregation the engine already maintains per micro-batch;
  * expressing it as a library operator makes the nightly-pipeline version
  * explicit and oracle-checkable.
  *
  * Only ALGEBRAIC aggregates qualify (their partials merge associatively:
  * count/sum/min/max, and anything derivable from them — avg, rates).
  * Holistic aggregates (exact percentiles, distinct counts) need sketches
  * instead: the q36/q57/q83 rows show the mergeable-sketch versions.
  *
  * Scale design: `partialState` shuffles each increment once, collapsed
  * map-side to its |keys| partials; `mergeStates` shuffles only
  * state-sized relations (|keys| rows per increment — history is NEVER
  * rescanned); `finish` is a projection. At 100 TB with daily increments,
  * the running state is a few thousand rows regardless of corpus size.
  */
object Incremental {

  private val StateCols = Seq("st_n", "st_sum", "st_min", "st_max")

  /** Collapse one data increment to its per-key algebraic state. */
  def partialState(df: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "partialState needs grouping keys")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("st_n"), sum(col(valueCol)).as("st_sum"),
        min(col(valueCol)).as("st_min"), max(col(valueCol)).as("st_max"))
  }

  /** Merge any number of states (associative + commutative, so increments
    * can arrive in any order and partial merges can be checkpointed).
    */
  def mergeStates(states: Seq[DataFrame], keyCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state")
    states.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("st_n")).as("st_n"), sum(col("st_sum")).as("st_sum"),
        min(col("st_min")).as("st_min"), max(col("st_max")).as("st_max"))
  }

  /** Final report derived from state alone (no data access). */
  def finish(state: DataFrame, keyCols: Seq[String]): DataFrame =
    state.select(keyCols.map(col) ++ Seq(
      col("st_n").as("n"),
      round(col("st_sum"), 2).as("sum_v"),
      round(col("st_sum") / col("st_n"), 4).as("avg_v"),
      col("st_min").as("min_v"),
      col("st_max").as("max_v")): _*)

  /** Sanity guard for state round-trips (e.g. after persisting state to a
    * table between pipeline runs): the state schema is exactly the keys
    * plus the four algebraic columns.
    */
  def isState(df: DataFrame, keyCols: Seq[String]): Boolean =
    df.columns.toSeq.sorted == (keyCols ++ StateCols).sorted

  // ===========================================================================
  // Oracle-bound query exercise
  // ===========================================================================

  // q92: the table arrives as three increments (ship-mode thirds); the
  // incrementally-maintained rollup must equal the oracle's one-shot
  // GROUP BY over the full table — the equivalence that makes the
  // incremental path trustworthy.
  private def q92(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val keys = Seq("l_returnflag", "l_linestatus")
    val chunks = Seq(
      li.filter(col("l_orderkey") % 3 === 0),
      li.filter(col("l_orderkey") % 3 === 1),
      li.filter(col("l_orderkey") % 3 === 2))
    val state = mergeStates(
      chunks.map(c => partialState(c, keys, "l_extendedprice")), keys)
    finish(state, keys)
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
  private val q92Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
         round(sum(l_extendedprice), 2) AS sum_v,
         round(sum(l_extendedprice) / count(*), 4) AS avg_v,
         min(l_extendedprice) AS min_v,
         max(l_extendedprice) AS max_v
       FROM lineitem
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q92_incremental_agg", q92, Some(q92Sql)))
}
