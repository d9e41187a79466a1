package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ScaleLintSpec extends SparkSpec {
  import spark.implicits._

  private val base = spark.range(0, 1000).toDF("id")
    .withColumn("k", col("id") % 7)
    .withColumn("v", col("id") * 3)

  test("clean grouped aggregation plan has no findings") {
    val good = base.groupBy($"k").agg(sum($"v").as("s"))
    assert(ScaleLint.findings(good).isEmpty)
  }

  test("unpartitioned window is flagged with its single-partition exchange") {
    val bad = base.withColumn("rk", row_number().over(Window.orderBy($"v")))
    val rules = ScaleLint.findings(bad).map(_.rule)
    assert(rules.contains("unpartitioned-window"))
    assert(rules.contains("single-partition-exchange"))
    // and worst-first ordering puts the exchange ahead of the window
    assert(rules.head === "single-partition-exchange")
  }

  test("cartesian product and broadcast nested loop are flagged") {
    val r = spark.range(0, 100).toDF("a")
    val cart = r.crossJoin(base.hint("shuffle_replicate_nl"))
    assert(ScaleLint.findings(cart).map(_.rule)
      .contains("cartesian-product"))
    val bnl = base.join(r, $"v" > $"a")
    assert(ScaleLint.findings(bnl).map(_.rule)
      .contains("broadcast-nested-loop"))
  }

  test("coalesce(1) and interpreted UDFs are flagged; audit() is data") {
    val f = udf((x: Long) => x + 1)
    val bad = base.withColumn("u", f($"v")).coalesce(1)
    val rules = ScaleLint.findings(bad).map(_.rule)
    assert(rules.contains("coalesce-1"))
    assert(rules.contains("scala-udf"))
    val audit = ScaleLint.audit(bad)
    assert(audit.columns.toSeq === Seq("rule", "severity", "node", "detail"))
    assert(audit.count() === rules.size.toLong)
  }

  test("severity separates real smells from the metadata-sized idioms") {
    // A global (ungrouped) aggregation's single-partition finish is the
    // normal collapse-to-one-row idiom -> info, not warn.
    val globalAgg = base.agg(sum($"v").as("s"))
    val fs = ScaleLint.findings(globalAgg)
    assert(fs.exists(f => f.rule === "single-partition-exchange"
      && f.severity === "info"))
    assert(ScaleLint.warnings(globalAgg).isEmpty)
    // A predicate-free broadcast cross join (scalar attach) -> info.
    val attach = base.crossJoin(
      org.apache.spark.sql.functions.broadcast(globalAgg))
    assert(ScaleLint.findings(attach)
      .exists(f => f.rule === "cross-broadcast" && f.severity === "info"))
    assert(ScaleLint.warnings(attach).isEmpty)
  }

  test("the library's own flagship plans carry no warnings") {
    // The lint must agree with PlanSpec's hand pins on the plans this
    // repo holds up as scale-correct.
    for (q <- Seq("q01_pricing_summary", "q05_star_join", "q27_minhash_lsh"))
      assert(ScaleLint.warnings(graft.SparkEntry.queries(q)(spark, sf)).isEmpty,
        s"$q should lint warning-free")
  }
}
