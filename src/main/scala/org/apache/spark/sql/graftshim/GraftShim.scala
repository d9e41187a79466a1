package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one deliberate reach into Spark's `private[sql]` surface: wrapping a
  * hand-built [[LogicalPlan]] (graft.plans.AsOfJoinNode) back into a public
  * `DataFrame`. `Dataset.ofRows` is the canonical constructor for this and
  * has no public equivalent, so this object lives under `org.apache.spark
  * .sql` for access — the standard pattern for Spark extension libraries
  * that add custom plan nodes. Nothing else engine-side depends on
  * internals beyond this call plus the documented extension points
  * (SparkSessionExtensions, experimental.extraStrategies).
  */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** The analyzed logical plan of a DataFrame (public on the classic
    * Dataset; hidden behind the connect-compatible API type).
    */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[ClassicDataset[_]].queryExecution.analyzed

  /** Drop the origin statistics (and constraints) a `localCheckpoint`
    * carries over from the plan that produced it. An iterative
    * algorithm that checkpoints every round otherwise COMPOUNDS the
    * size-in-bytes estimate — a self-join squares it each round, so
    * after ~20 rounds Catalyst's stats visitor is multiplying
    * million-bit BigIntegers on the driver and planning hangs. Data,
    * lineage truncation, and output partitioning of the checkpoint are
    * untouched; the relation merely reverts to the
    * `defaultSizeInBytes` leaf estimate.
    */
  def dropOriginStats(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[ClassicDataset[_]]
    ds.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        ClassicDataset.ofRows(ds.sparkSession,
          new org.apache.spark.sql.execution.LogicalRDD(
            lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
            lr.isStreaming, lr.stream)(ds.sparkSession, None, None))
      case _ => df
    }
  }
}
