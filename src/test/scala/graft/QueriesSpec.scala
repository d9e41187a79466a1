package graft

/** Smoke test for the full query registry: every declared query runs on
  * sf0.001, yields rows, and all columns referenced in its oracle alias list
  * resolve. Value-level correctness is the driver's DuckDB hash compare
  * (tools/verify_local.py locally); these tests catch plan-breaking
  * regressions fast.
  */
class QueriesSpec extends SparkSpec {

  /** Queries whose CORRECT sf0.001 answer is the empty relation:
    * q314's 30-truss of the tiny co-sale clique peels to certified-empty
    * (supports ≡ 8 < k − 2 there; see its scaladoc). Still must RUN.
    */
  private val emptyOkAt0001 = Set("q314_ktruss")

  SparkEntry.allDefs.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val df = q.fn(spark, sf)
      val rows = df.count()
      if (emptyOkAt0001(q.name)) assert(rows >= 0)
      else assert(rows > 0, s"${q.name} returned no rows on $sf")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle name has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
