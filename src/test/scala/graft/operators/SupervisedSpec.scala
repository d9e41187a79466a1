package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SupervisedSpec extends SparkSpec {
  import spark.implicits._

  test("logisticFit separates a linearly separable fixture exactly") {
    // y = (x >= 3) with the feature centered at the boundary: the fit
    // must drive the centered weight positive and classify all 7 rows.
    val df = (0 to 6).map(x => (if (x >= 3) 1 else 0, x - 3))
      .toDF("y", "xc")
    val got = Supervised.logisticFit(df, col("y"),
        Seq("intercept" -> lit(1L), "xc" -> col("xc")),
        lrShift = 1, iters = 30)
      .as[(String, Long)].collect().toMap
    assert(got("w_xc") > 0, s"boundary weight must be positive: $got")
    assert(got("n_correct") === 7L && got("n_rows") === 7L, got.toString)
    // The fold is exact fixed-point arithmetic, so the weights are
    // pinned to the unit: any change to the quantization scheme, the
    // floor-division idiom, or the update order shows up here.
    assert(got("w_intercept") === 627115L && got("w_xc") === 2086691L, got.toString)
  }

  test("naiveBayes: disjoint vocab classifies exactly; ties take the smallest class") {
    // Train: X owns {a,b}, Y owns {c,d}. Test doc 5 speaks X's vocab,
    // doc 10 speaks Y's, doc 15 is all-unknown — with equal priors and
    // equal class token mass its scores tie and the tiebreak must take
    // the lexicographically smallest class (X), misclassifying it.
    val df = Seq(
      (1L, "X", Seq("a", "a", "b")),
      (2L, "Y", Seq("c", "c", "d")),
      (5L, "X", Seq("a", "b")),
      (10L, "Y", Seq("d", "c")),
      (15L, "Y", Seq("zz")))
      .toDF("doc_id", "label", "toks")
    val got = Supervised.naiveBayes(df, "doc_id", "label", col("toks"),
        col("doc_id") % 5 === 0)
      .as[(String, String, Long)].collect()
    assert(got === Array(("X", "X", 1L), ("Y", "X", 1L), ("Y", "Y", 1L)))
  }

  test("logisticFit is invariant to partitioning") {
    val df = (0 until 64).map(i => (i % 3 == 0, i % 7, i % 5))
      .toDF("y", "a", "b")
    val fit = Supervised.logisticFit(df, col("y").cast("long"),
      Seq("intercept" -> lit(1L), "a" -> col("a"), "b" -> col("b")),
      lrShift = 2, iters = 6).collect()
    val fit7 = Supervised.logisticFit(df.repartition(7), col("y").cast("long"),
      Seq("intercept" -> lit(1L), "a" -> col("a"), "b" -> col("b")),
      lrShift = 2, iters = 6).collect()
    assert(fit.toSeq === fit7.toSeq)
  }
}
