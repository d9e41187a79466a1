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
}
