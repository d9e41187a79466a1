package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{CoalesceExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan governance as a first-class library operator: walk a DataFrame's
  * physical plan and report every known 100-TB scale smell as DATA — the
  * check a pipeline author runs in CI before a composed query ships,
  * instead of eyeballing `explain()` output. The same properties this
  * repo pins per-query in PlanSpec, packaged for user-composed plans.
  *
  * Rules (all advisory — a smell on a provably COLLAPSED, metadata-sized
  * relation is legitimate, which is why findings carry the node string
  * for human adjudication rather than failing the plan):
  *
  *  - `single-partition-exchange`: a shuffle into ONE partition — every
  *    upstream row funnels through a single task. Fine after a grouped
  *    collapse to a handful of rows; corpus-killing anywhere else (the
  *    unpartitioned-window trap this repo routes through its two-pass
  *    distributed prefix sum).
  *  - `unpartitioned-window`: `Window.orderBy` with no `partitionBy` —
  *    plans a SinglePartition sort buffer of the whole input.
  *  - `cartesian-product`: |L|·|R| row pairs with no key at all.
  *  - `broadcast-nested-loop`: a non-equi join predicate — every left
  *    row scans the whole broadcast side (the q-dauWau class of cost
  *    that an explode + equi-join usually removes).
  *  - `coalesce-1`: `.coalesce(1)` — collapses the final stage to one
  *    task AND caps the parallelism of everything fused upstream of it.
  *  - `scala-udf`: an interpreted closure in the plan — breaks
  *    whole-stage codegen where a native Catalyst expression wouldn't
  *    (this library ships codegen'd kernels for exactly this reason).
  *
  * The walk covers subquery plans too, so a scalar-subquery cartesian
  * hiding under a filter is still caught. Inspection runs on the
  * PREPARED pre-execution plan (AQE wrappers unwrapped to their initial
  * plan): lint is a static CI gate, deliberately judging the plan as
  * AUTHORED — AQE may coalesce a skewed exchange at runtime, but only
  * for this input; the smell is still shipped.
  */
object ScaleLint {

  /** One lint finding: the violated rule, the offending plan node
    * (`nodeName` + first line), and the rule's cost story.
    */
  final case class Finding(rule: String, node: String, detail: String)

  /** Every node of the prepared physical plan, with AQE wrappers
    * unwrapped to their prepared `initialPlan` (exchanges are inserted by
    * the preparation rules, so the bare `sparkPlan` would miss them) and
    * subquery plans included.
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => allNodes(a.initialPlan)
    case _ => p +: (p.children ++ p.subqueries).flatMap(allNodes)
  }

  /** All findings for the DataFrame's physical plan, worst-first in the
    * fixed rule order above.
    */
  def findings(df: DataFrame): Seq[Finding] = {
    val nodes = allNodes(df.queryExecution.executedPlan)
    def head(p: SparkPlan): String =
      p.nodeName + ": " + p.simpleString(120).linesIterator.next().take(160)
    val nodeFindings = nodes.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        Finding("single-partition-exchange", head(e),
          "all upstream rows funnel through one task; " +
            "route through a distributed two-pass form unless the input " +
            "is already collapsed to metadata size")
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Finding("unpartitioned-window", head(w),
          "Window.orderBy with no partitionBy buffers the entire input " +
            "in a single task's sort")
      case j: CartesianProductExec =>
        Finding("cartesian-product", head(j),
          "|left| * |right| pairs with no join key; broadcast a tiny " +
            "side explicitly or derive an equi-key")
      case j: BroadcastNestedLoopJoinExec =>
        Finding("broadcast-nested-loop", head(j),
          "non-equi predicate: every left row scans the whole broadcast " +
            "side; an explode + equi-join usually removes this")
      case c: CoalesceExec if c.numPartitions == 1 =>
        Finding("coalesce-1", head(c),
          "one output task, and parallelism of all stages fused above " +
            "it collapses too; prefer repartition(1) only at tiny sinks")
    }
    val udfFindings = nodes.collect {
      case p if p.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF])) =>
        Finding("scala-udf", head(p),
          "interpreted closure breaks whole-stage codegen; prefer " +
            "built-in functions or a codegen'd Catalyst expression")
    }
    val order = Seq("single-partition-exchange", "unpartitioned-window",
      "cartesian-product", "broadcast-nested-loop", "coalesce-1",
      "scala-udf").zipWithIndex.toMap
    (nodeFindings ++ udfFindings).sortBy(f => order(f.rule))
  }

  /** The findings as a DataFrame (rule, node, detail) — composable into
    * the same reporting pipelines as every other audit in this library.
    */
  def audit(df: DataFrame): DataFrame = {
    val s: SparkSession = df.sparkSession
    import s.implicits._
    findings(df).toDF("rule", "node", "detail")
  }
}
