package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * Semantics: for each left row, attach the single most recent right row of
  * the same key whose time is <= the left row's time (DuckDB `ASOF JOIN`
  * semantics, left outer).
  *
  * Implementation is the union+window trick rather than a join: tag both
  * sides, union, and carry the latest right payload forward with
  * `last(_, ignoreNulls)` over a per-key time-ordered window. This costs ONE
  * shuffle (partition by key) + a sort — no row explosion, no per-key
  * nested-loop — so it scales linearly in |L|+|R| and survives 100 TB inputs
  * where the naive join-then-rank approach (|L| x |R| per key before
  * filtering) blows up. Skewed keys are handled by AQE since the heavy
  * operation is a plain window over a hash-partitioned sort.
  *
  * Reference had no relational operators at all (SURVEY.md §2.5); this is
  * part of the extended surface (§2.6).
  */
object AsOfJoin {

  /** Left as-of join.
    *
    * @param right must be unique per (keys, rightTime); pre-dedupe if not —
    *              with duplicates the matched row would be order-dependent
    *              (DuckDB ASOF has the same caveat).
    * @param rightPayload right columns to attach (null when no match).
    * @param direction `backward` (default): most recent right row at-or-
    *                  before the left time — DuckDB `ON l.t >= r.t`;
    *                  `forward`: earliest right row at-or-after —
    *                  `ON l.t <= r.t`; `nearest`: whichever of the two is
    *                  closer in time, ties broken backward (the pandas
    *                  `merge_asof` convention). All three are the same
    *                  union+window shape — `nearest` runs both ordered
    *                  passes over ONE exchange (two in-partition sorts).
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown as-of direction '$direction'")
    val leftCols = left.columns.toSeq
    // Only the nearest mode needs the matched right TIME ("_rt") in the
    // payload struct to compare distances — single-direction joins skip
    // it so their shuffled rows stay as narrow as before.
    val carried =
      if (direction == "nearest") rightPayload.map(col) :+ col(rightTime).as("_rt")
      else rightPayload.map(col)
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_rp", lit(null).cast(
        right.select(carried: _*).schema
          .fields.foldLeft(new org.apache.spark.sql.types.StructType()) {
            (st, f) => st.add(f)
          }))
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("_t"),
        lit(0).as("_side"),
        struct(carried: _*).as("_rp")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort before left rows at equal time in BOTH directions
    // (side asc after t asc or t desc) => ties match (<= / >=).
    def pass(timeOrd: Column) =
      last(col("_rp"), ignoreNulls = true).over(
        Window.partitionBy(keys.map(col): _*)
          .orderBy(timeOrd, col("_side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val backward = pass(col("_t").asc)
    val forward = pass(col("_t").desc)
    val m = direction match {
      case "backward" => backward
      case "forward" => forward
      case "nearest" =>
        val b = backward
        val f = forward
        // strictly-closer forward wins; ties (incl. exact-time hits on
        // both sides, same row) go backward
        when(b.isNull, f)
          .when(f.isNull, b)
          .when(f.getField("_rt") - col("_t") < col("_t") - b.getField("_rt"), f)
          .otherwise(b)
    }
    val matched = unioned
      .withColumn("_m", m)
      .where(col("_side") === 1)
    val out = leftCols.map(col) ++
      rightPayload.map(p => col(s"_m.$p").as(p))
    matched.select(out: _*)
  }

  /** Range join: left rows matched to right rows of the same key with
    * rightTime in [leftTime - before, leftTime + after]. Spark plans this as
    * an equi-join on the keys with the range as a post-filter, so it shuffles
    * once on the key; for keyless range joins prefer bucketing the time axis.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      before: Column,
      after: Column): DataFrame = {
    val cond = keys.map(k => left(k) === right(k)).reduce(_ && _) &&
      right(rightTime) >= left(leftTime) - before &&
      right(rightTime) <= left(leftTime) + after
    left.join(right, cond, "inner")
  }
}
