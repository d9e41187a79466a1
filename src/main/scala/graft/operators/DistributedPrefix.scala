package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Two-pass distributed prefix machinery for UNBOUNDED ordered domains.
  *
  * The cumulative family ([[Profile.rocAuc]], [[Profile.prCurve]],
  * [[Profile.gainsTable]], [[Profile.skyline]], [[Profile.ksTest]],
  * [[Analytics.weightedMedian]], [[Analytics.otsuThreshold]],
  * [[PipelineOps.lengthCapPlan]], [[PipelineOps.apportion]]) runs its
  * running sums over a (group, distinct-value) collapse. When the value
  * domain is quantized (int8 model scores, document lengths, cents) that
  * collapse is bounded and a plain cumulative window is the right plan;
  * when the domain is CONTINUOUS (raw double scores) the collapse is
  * corpus-sized, and a `Window.orderBy` with no partition key funnels it
  * through ONE task. This object is the shared fix those operators'
  * `quantized = false` switch routes through: the classic two-pass
  * distributed prefix sum (the q116/q132/q138/q149 machinery,
  * generalized to grouped multi-column running sums and prefix maxima).
  *
  * Shape: range-partition by (group, order) and pin the layout
  * (localCheckpoint — pass 2 must see pass 1's exact partitions);
  * aggregate per-(partition, group) totals — P·|G| rows, partition
  * METADATA, collected to the driver exactly like
  * [[Analytics.concurrency]]'s P-row totals; compute each partition's
  * exclusive seed per group on the driver; broadcast the seeds back and
  * finish with a window partitioned by (PARTITION, group), so every
  * task sorts only its own range slice. Wall-clock scales with the
  * largest partition, never the domain, and no SinglePartition exchange
  * exists anywhere in the plan (pinned by DistributedPrefixSpec).
  */
object DistributedPrefix {

  /** Adds running aggregates over `orderCols` within each `groupCols`
    * group: `cum_<c>` = INCLUSIVE running sum (BIGINT) for each c in
    * `sumCols`, and `prevmax_<c>` = EXCLUSIVE prefix max (null on a
    * group's first row) for each c in `maxCols`.
    *
    * Contract: rows must be unique on (groupCols, orderCols) — the
    * callers' distinct-value collapses are — and |groups| must be modest
    * (the regime where this path matters: few or no groups over a huge
    * value domain), since the driver holds P·|G| seed rows. Sum/max
    * columns must be integral (they are cast to BIGINT).
    */
  def cumSums(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
      sumCols: Seq[String], maxCols: Seq[String] = Nil,
      partitions: Int = 32): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be nonempty")
    require(sumCols.nonEmpty || maxCols.nonEmpty, "nothing to accumulate")
    val spark = df.sparkSession
    val gCols = groupCols.map(col)
    val keyed = df
      .repartitionByRange(partitions, (gCols ++ orderCols): _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(false) // stats-ok: both passes must see identical partition ids

    // Pass 1: per-(partition, group) totals — partition metadata, not data.
    val aggExprs =
      sumCols.map(c => sum(col(c).cast("long")).as(s"_t_$c")) ++
        maxCols.map(c => max(col(c).cast("long")).as(s"_m_$c"))
    val totals = keyed.groupBy((col("_pid") +: gCols): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
      .collect()

    // Driver: exclusive seeds per (partition, group) in partition order.
    val nG = groupCols.size
    val seedRows: Seq[Row] = totals
      .groupBy(r => (1 to nG).map(r.get).toList)
      .toSeq
      .flatMap { case (_, rows) =>
        val sorted = rows.sortBy(_.getInt(0))
        val sums = Array.fill(sumCols.size)(0L)
        val maxes = Array.fill[Option[Long]](maxCols.size)(None)
        sorted.map { r =>
          val out = Row.fromSeq(
            (r.getInt(0) +: (1 to nG).map(r.get)) ++
              sums.map(x => x: java.lang.Long) ++
              maxes.map(_.map(x => x: java.lang.Long).orNull))
          sumCols.indices.foreach { i =>
            val v = r.get(1 + nG + i)
            if (v != null) sums(i) += v.asInstanceOf[Long]
          }
          maxCols.indices.foreach { j =>
            val v = r.get(1 + nG + sumCols.size + j)
            if (v != null) {
              val lv = v.asInstanceOf[Long]
              maxes(j) = Some(maxes(j).fold(lv)(math.max(_, lv)))
            }
          }
          out
        }
      }
    val keyedSchema = keyed.schema
    val seedSchema = StructType(
      (StructField("_spid", IntegerType, nullable = false) +:
        groupCols.map { c =>
          val f = keyedSchema(c)
          StructField(s"_g_$c", f.dataType, f.nullable)
        }) ++
        sumCols.map(c => StructField(s"_s_$c", LongType, nullable = false)) ++
        maxCols.map(c => StructField(s"_pm_$c", LongType, nullable = true)))
    val seeds = spark.createDataFrame(seedRows.asJava, seedSchema)

    // Pass 2: per-partition windows seeded with the earlier-partition
    // totals. The window's partition key INCLUDES _pid, so no task ever
    // sees more than one range slice.
    val cond = ((col("_pid") === col("_spid")) +:
      groupCols.map(c => col(c) <=> col(s"_g_$c"))).reduce(_ && _)
    val joined = keyed.join(broadcast(seeds), cond)
    val wBase = Window.partitionBy((col("_pid") +: gCols): _*)
      .orderBy(orderCols: _*)
    val wInc = wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wExc = wBase.rowsBetween(Window.unboundedPreceding, -1)
    val withSums = sumCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"cum_$c",
        col(s"_s_$c") + sum(col(c).cast("long")).over(wInc))
    }
    val withMaxes = maxCols.foldLeft(withSums) { (d, c) =>
      // greatest skips nulls: null seed (first partition) or an empty
      // in-partition prefix (first row) falls back to the other side;
      // both null -> null, the exclusive-prefix contract.
      d.withColumn(s"prevmax_$c",
        greatest(col(s"_pm_$c"), max(col(c).cast("long")).over(wExc)))
    }
    withMaxes.drop(
      (Seq("_pid", "_spid") ++ groupCols.map(c => s"_g_$c") ++
        sumCols.map(c => s"_s_$c") ++ maxCols.map(c => s"_pm_$c")): _*)
  }
}
