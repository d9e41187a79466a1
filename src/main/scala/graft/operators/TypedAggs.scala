package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed custom aggregation surface (SURVEY.md §2.5 UDF/UDAF row).
  *
  * `TopK` is an `Aggregator[IN, BUF, OUT]` bounded heap: each partition
  * keeps at most k rows per group during the map-side partial, so the
  * shuffle carries k rows per (partition, group) instead of the full group —
  * the scale path for top-k-per-key when groups are large (the window
  * row_number approach sorts entire groups). Output is identical to the
  * window formulation (q09), which is the oracle.
  */
object TypedAggs {

  /** Generic bounded top-k heap: keeps the `ord`-least k elements. Each
    * map-side partial holds at most k rows per (partition, group), so the
    * shuffle carries k rows per partition per group instead of the whole
    * group — the property that makes top-k-per-key survive groups of
    * billions of rows (a window row_number sorts ENTIRE groups after
    * shuffling them whole). Scala `Ordering` and the captured lambda are
    * serializable, so instances ship to executors as-is.
    */
  class BoundedTopK[T](k: Int, ord: Ordering[T])(
      implicit tt: scala.reflect.runtime.universe.TypeTag[T])
      extends Aggregator[T, Seq[T], Seq[T]] {
    override def zero: Seq[T] = Vector.empty
    override def reduce(b: Seq[T], a: T): Seq[T] =
      // common case at scale: the row doesn't beat the current worst keeper
      if (b.length == k && ord.compare(a, b.last) >= 0) b
      else ((b :+ a).sorted(ord)).take(k)
    override def merge(b1: Seq[T], b2: Seq[T]): Seq[T] =
      (b1 ++ b2).sorted(ord).take(k)
    override def finish(r: Seq[T]): Seq[T] = r
    override def bufferEncoder: Encoder[Seq[T]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[T]] = ExpressionEncoder()
  }

  final case class LiRow(
      l_suppkey: Long, l_orderkey: Long, l_linenumber: Int, l_extendedprice: Double)

  /** Bounded top-k by (l_extendedprice desc, l_orderkey, l_linenumber). */
  final class TopK(k: Int) extends BoundedTopK[LiRow](k,
    Ordering.by((r: LiRow) => (-r.l_extendedprice, r.l_orderkey, r.l_linenumber.toLong)))

  // ---- q34: per-supplier top-3 via the typed bounded-heap aggregator ---------
  // Same answer as q09 (the window/row_number formulation) — asserted by
  // sharing q09's oracle SQL.
  private def q34(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
      .as[LiRow]
    val top = new TopK(3).toColumn
    li.groupByKey(_.l_suppkey)
      .agg(top.name("top"))
      .flatMap { case (_, rows) => rows.zipWithIndex.map { case (r, i) => (r, i + 1) } }
      .select(col("_1.l_suppkey").as("l_suppkey"),
        col("_1.l_orderkey").as("l_orderkey"),
        col("_1.l_linenumber").as("l_linenumber"),
        col("_1.l_extendedprice").as("l_extendedprice"),
        col("_2").cast("int").as("rn"))
      .orderBy(col("l_suppkey"), col("rn"))
  }
  private val q34Sql =
    """SELECT * FROM (
         SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
           row_number() OVER (PARTITION BY l_suppkey
             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)::INT AS rn
         FROM lineitem) t
       WHERE rn <= 3 ORDER BY l_suppkey, rn"""

  // ---- q35: pivot (orders: priority columns per year) ------------------------
  private val Priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private def q35(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("y"))
      .pivot("o_orderpriority", Priorities)
      .agg(round(sum(col("o_totalprice")), 2))
      .orderBy(col("y"))
  private val q35Sql =
    """SELECT year(o_orderdate)::INT AS y,
       round(sum(o_totalprice) FILTER (o_orderpriority = '1-URGENT'), 2) AS "1-URGENT",
       round(sum(o_totalprice) FILTER (o_orderpriority = '2-HIGH'), 2) AS "2-HIGH",
       round(sum(o_totalprice) FILTER (o_orderpriority = '3-MEDIUM'), 2) AS "3-MEDIUM",
       round(sum(o_totalprice) FILTER (o_orderpriority = '4-NOT SPECIFIED'), 2) AS "4-NOT SPECIFIED",
       round(sum(o_totalprice) FILTER (o_orderpriority = '5-LOW'), 2) AS "5-LOW"
       FROM orders GROUP BY y ORDER BY y"""

  // ---- q36: approximate distinct (HLL) ---------------------------------------
  // An approximate aggregate can't hash-match an exact oracle directly, so
  // the query emits the EXACT distinct count plus a `within_bound` boolean
  // that moves the ±5% accuracy assertion INTO the row — the oracle emits
  // literal true, so the row is fully hashable and the accuracy property is
  // oracle-checked every round (TypedAggsSpec asserts it too).
  private def q36(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("exact_customers"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx"))
      .select(col("o_orderstatus"), col("exact_customers"),
        (abs(col("approx") - col("exact_customers")) <=
          col("exact_customers") * 0.05).as("within_bound"))
      .orderBy(col("o_orderstatus"))
  private val q36Sql =
    """SELECT o_orderstatus, count(DISTINCT o_custkey) AS exact_customers,
         true AS within_bound
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q34_topk_aggregator", q34, Some(q34Sql)),
    QueryDef("q35_pivot", q35, Some(q35Sql)),
    QueryDef("q36_approx_distinct", q36, Some(q36Sql)))
}
