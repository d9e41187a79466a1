package graft

/** Physical-plan shape assertions — the scale contract, enforced as tests.
  * Correctness is the oracle's job; these pin the plan properties that decide
  * whether a query survives a 100x scale-up: filters reaching the parquet
  * scan, column pruning, small-side broadcasts, and shuffle counts.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01: shipdate filter is pushed into the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"filter not pushed:\n${p.take(2000)}")
  }

  test("q01: scan is pruned to the referenced columns only") {
    val p = plan("q01_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"unreferenced columns read: $readSchema")
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_shipdate"))
  }

  test("q03/q05: dimension tables are broadcast, not shuffled") {
    assert(plan("q03_top_orders").contains("BroadcastHashJoin"))
    val p5 = plan("q05_star_join")
    assert(p5.contains("BroadcastHashJoin"))
    assert(!p5.contains("CartesianProduct"))
  }

  test("q19 as-of join: union+window, no join operator at all") {
    val p = plan("q19_asof_join")
    assert(!p.contains("Join"), s"as-of should be join-free:\n${p.take(1500)}")
    assert(p.contains("Window"))
  }

  test("q27 minhash: no cartesian products anywhere in the LSH path") {
    assert(!plan("q27_minhash_lsh").contains("CartesianProduct"))
  }

  test("q30 top-k: query set broadcast against the corpus") {
    val p = plan("q30_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side should broadcast:\n${p.take(1500)}")
  }

  test("q25 exact dedup: only (hash, id) is shuffled, never the text") {
    val p = plan("q25_exact_dedup")
    val exchangeIdx = p.indexOf("Exchange")
    assert(exchangeIdx >= 0)
    // The scan below the exchange projects the hash before shuffling; the
    // text column must not appear in any exchange's output.
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("text"), "scan reads text (to hash it)")
    assert(!p.substring(0, exchangeIdx).contains("text#"),
      "text must be hashed away before the first shuffle")
  }

  test("whole-stage codegen covers the relational hot paths") {
    // AQE prints codegen stages only in the finalized plan — execute first.
    Seq("q01_pricing_summary", "q06_selective_agg", "q09_window_topk").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // finalize THIS QueryExecution's adaptive plan
      val p = df.queryExecution.executedPlan.toString
      // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
      assert(p.contains("*("), s"$q fell out of codegen:\n${p.take(1200)}")
    }
  }
}
