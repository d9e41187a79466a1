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

  /** One lint finding: the violated rule, its severity ("warn" = a real
    * scale risk unless the input is provably tiny; "info" = a pattern
    * that is usually the deliberate metadata-sized idiom), the offending
    * plan node (`nodeName` + first line), and the rule's cost story.
    */
  final case class Finding(rule: String, severity: String, node: String,
      detail: String)

  /** Every node of the prepared physical plan, with AQE wrappers
    * unwrapped to their prepared `initialPlan` (exchanges are inserted by
    * the preparation rules, so the bare `sparkPlan` would miss them) and
    * subquery plans included.
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => allNodes(a.initialPlan)
    case _ => p +: (p.children ++ p.subqueries).flatMap(allNodes)
  }

  /** Strip codegen wrappers when classifying a node's child. */
  private def bare(p: SparkPlan): SparkPlan = p match {
    case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
      bare(w.child)
    case i: org.apache.spark.sql.execution.InputAdapter => bare(i.child)
    case other => other
  }

  private def isAggregate(p: SparkPlan): Boolean =
    bare(p).nodeName.contains("Aggregate")

  /** All findings for the DataFrame's physical plan, worst-first in the
    * fixed rule order above; "warn" before "info" within a rule.
    */
  def findings(df: DataFrame): Seq[Finding] = {
    val nodes = allNodes(df.queryExecution.executedPlan)
    def head(p: SparkPlan): String =
      p.nodeName + ": " + p.simpleString(120).linesIterator.next().take(160)
    val nodeFindings = nodes.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning == SinglePartition =>
        // The global-aggregation FINISH (exchange feeding partial rows
        // into one final-agg task) is the normal collapse-to-a-row idiom
        // — info. Anything else funneling into one task is the real
        // single-task trap — warn.
        if (isAggregate(e.child))
          Finding("single-partition-exchange", "info", head(e),
            "global-aggregation finish: only partial-aggregate rows " +
              "cross this exchange — fine unless the grouping was absent " +
              "by mistake")
        else
          Finding("single-partition-exchange", "warn", head(e),
            "all upstream rows funnel through one task; " +
              "route through a distributed two-pass form unless the " +
              "input is already collapsed to metadata size")
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Finding("unpartitioned-window", "warn", head(w),
          "Window.orderBy with no partitionBy buffers the entire input " +
            "in a single task's sort; legitimate ONLY on a bounded " +
            "(quantized-domain) collapse")
      case j: CartesianProductExec =>
        Finding("cartesian-product", "warn", head(j),
          "|left| * |right| pairs with no join key; broadcast a tiny " +
            "side explicitly or derive an equi-key")
      case j: BroadcastNestedLoopJoinExec =>
        if (j.condition.isEmpty)
          Finding("cross-broadcast", "info", head(j),
            "predicate-free broadcast cross join — the deliberate " +
              "scalar/tiny-relation attach idiom; verify the build side " +
              "really is a handful of rows")
        else
          Finding("broadcast-nested-loop", "warn", head(j),
            "non-equi predicate: every left row scans the whole " +
              "broadcast side; an explode + equi-join usually removes " +
              "this")
      case c: CoalesceExec if c.numPartitions == 1 =>
        Finding("coalesce-1", "warn", head(c),
          "one output task, and parallelism of all stages fused above " +
            "it collapses too; prefer repartition(1) only at tiny sinks")
    }
    val udfFindings = nodes.collect {
      case p if p.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF])) =>
        Finding("scala-udf", "warn", head(p),
          "interpreted closure breaks whole-stage codegen; prefer " +
            "built-in functions or a codegen'd Catalyst expression")
    }
    val order = Seq("single-partition-exchange", "unpartitioned-window",
      "cartesian-product", "broadcast-nested-loop", "cross-broadcast",
      "coalesce-1", "scala-udf").zipWithIndex.toMap
    (nodeFindings ++ udfFindings)
      .sortBy(f => (if (f.severity == "warn") 0 else 1, order(f.rule)))
  }

  /** Only the warn-level findings — what a CI gate should fail on. */
  def warnings(df: DataFrame): Seq[Finding] =
    findings(df).filter(_.severity == "warn")

  /** The findings as a DataFrame (rule, severity, node, detail) —
    * composable into the same reporting pipelines as every other audit
    * in this library.
    */
  def audit(df: DataFrame): DataFrame = {
    val s: SparkSession = df.sparkSession
    import s.implicits._
    findings(df).toDF("rule", "severity", "node", "detail")
  }
}
