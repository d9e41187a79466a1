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

  /** Incremental JOIN-view maintenance: the delta rows a stored join view
    * needs when both sides receive increments —
    * ΔV = (Lold ⋈ ΔR) ∪ (ΔL ⋈ Rold) ∪ (ΔL ⋈ ΔR).
    * History never re-joins history: each term touches at most one full
    * snapshot against a delta. The algebra behind every materialized-view
    * refresh (and the batch analog of the engine's stream-stream join
    * state); appending the returned rows to the stored view reproduces
    * the from-scratch join exactly, which the q282 oracle pins.
    *
    * Scale design: with daily deltas, the big side of every term is
    * scanned once and joined against a delta that is typically
    * broadcastable; the ΔL ⋈ ΔR term is delta×delta. A 100-TB stored
    * view refresh thus costs O(|snapshot|·|delta|) join work instead of
    * O(|snapshot|²).
    */
  def deltaJoinRows(lOld: DataFrame, lDelta: DataFrame,
      rOld: DataFrame, rDelta: DataFrame, joinCols: Seq[String]): DataFrame =
    lOld.join(rDelta, joinCols)
      .unionByName(lDelta.join(rOld, joinCols))
      .unionByName(lDelta.join(rDelta, joinCols))

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

  // q282: both join sides arrive as (old, delta) splits; the maintained
  // view — stored rows plus deltaJoinRows — must aggregate to exactly the
  // oracle's one-shot join. Splits are key-parity so every term is
  // nonempty and the delta×delta corner is genuinely exercised.
  private def q282(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val c = Tables.customer(s, d)
      .select(col("c_custkey").as("custkey"), col("c_nationkey"))
    val (oOld, oDelta) = (o.filter(col("custkey") % 2 === 0),
      o.filter(col("custkey") % 2 === 1))
    val (cOld, cDelta) = (c.filter(col("custkey") % 3 =!= 0),
      c.filter(col("custkey") % 3 === 0))
    val maintained = oOld.join(cOld, Seq("custkey"))
      .unionByName(deltaJoinRows(oOld, oDelta, cOld, cDelta, Seq("custkey")))
    maintained.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("c_nationkey"))
  }
  private val q282Sql =
    """SELECT c_nationkey, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS revenue
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_nationkey ORDER BY c_nationkey"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q92_incremental_agg", q92, Some(q92Sql)),
    QueryDef("q282_delta_join", q282, Some(q282Sql)))
}
