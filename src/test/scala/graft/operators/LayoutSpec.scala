package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Bit-by-bit reference interleave. */
  private def zRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue equals the bit-by-bit reference, including edge values") {
    val vals = Seq(0L, 1L, 2L, 3L, 255L, 256L, (1L << 31) - 1, (1L << 32) - 1)
    val pairs = for (a <- vals; b <- vals) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select($"a", $"b", Layout.zValue($"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z === zRef(a, b), s"z($a,$b)") }
    // The canonical 2x2 quadrant order: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3
    assert(zRef(0, 0) === 0L && zRef(1, 0) === 1L &&
      zRef(0, 1) === 2L && zRef(1, 1) === 3L)
  }

  test("zorderBy range-partitions by the Z-value and keeps the schema") {
    val df = (0 until 64).map(i => (i.toLong % 8, i.toLong / 8, s"p$i"))
      .toDF("x", "y", "payload")
    val laid = Layout.zorderBy(df, "x", "y", numPartitions = 4)
    assert(laid.columns.toSeq === Seq("x", "y", "payload"))
    assert(laid.count() === 64)
    val plan = laid.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"expected a range exchange:\n${plan.take(1500)}")
    // Within each partition rows are sorted by z (layout contract)
    laid.withColumn("z", Layout.zValue($"x", $"y"))
      .select($"z").rdd.mapPartitions { it =>
        val zs = it.map(_.getLong(0)).toSeq
        Iterator.single(zs == zs.sorted)
      }.collect().foreach(ok => assert(ok, "partition not sorted by z"))
  }
}
