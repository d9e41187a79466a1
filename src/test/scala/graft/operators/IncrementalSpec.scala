package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("l_returnflag", "l_linestatus")

  test("state merged from increments in any order equals the one-shot state") {
    val li = graft.Tables.lineitem(spark, sf)
    val chunks = (0 to 2).map(r =>
      Incremental.partialState(
        li.filter(col("l_orderkey") % 3 === r), keys, "l_extendedprice"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      Incremental.finish(df, keys)
        .orderBy(keys.map(col): _*)
        .as[(String, String, Long, Double, Double, Double, Double)]
        .collect().toSeq
    val forward = rows(Incremental.mergeStates(chunks, keys))
    val reversed = rows(Incremental.mergeStates(chunks.reverse, keys))
    val oneShot = rows(Incremental.partialState(li, keys, "l_extendedprice"))
    assert(forward === oneShot, "incremental must equal full recompute")
    assert(reversed === oneShot, "merge order must not matter")
  }

  test("a merged state is still a state (closed under merge, re-persistable)") {
    val li = graft.Tables.lineitem(spark, sf)
    val s1 = Incremental.partialState(
      li.filter(col("l_orderkey") % 2 === 0), keys, "l_extendedprice")
    val s2 = Incremental.partialState(
      li.filter(col("l_orderkey") % 2 === 1), keys, "l_extendedprice")
    val merged = Incremental.mergeStates(Seq(s1, s2), keys)
    assert(Incremental.isState(merged, keys))
    // Folding a later increment into an already-merged state works too.
    val again = Incremental.mergeStates(Seq(merged, s1), keys)
    assert(Incremental.isState(again, keys))
  }

  test("deltaJoinRows + stored view reproduces the from-scratch join") {
    import spark.implicits._
    val l = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "lv")
    val r = Seq((1L, 10L), (2L, 20L), (3L, 30L), (5L, 50L)).toDF("k", "rv")
    val (lOld, lDelta) = (l.filter($"k" <= 2), l.filter($"k" > 2))
    val (rOld, rDelta) = (r.filter($"k" % 2 === 0), r.filter($"k" % 2 === 1))
    val maintained = lOld.join(rOld, Seq("k"))
      .unionByName(Incremental.deltaJoinRows(lOld, lDelta, rOld, rDelta, Seq("k")))
    val direct = l.join(r, Seq("k"))
    assert(maintained.except(direct).isEmpty && direct.except(maintained).isEmpty)
    assert(maintained.count() === direct.count()) // no duplicate deltas
  }
}
