package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SupervisedSpec extends SparkSpec {
  import spark.implicits._

  test("ridgePath2: lambda=0 recovers an exact model; lambda>0 tames collinearity") {
    // y = 10 + 4*x1 exactly, x2 = x1^2 irrelevant: OLS endpoint must be
    // the exact micro coefficients with a perfect R^2.
    val a = (1L to 20L).map(x => (10L + 4L * x, x, x * x)).toDF("y", "x1", "x2")
    val pa = Supervised.ridgePath2(a, col("y"), col("x1"), col("x2"),
        lambdas = Seq(0L))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(pa === ((0L, 10000000L, 4000000L, 0L, 1000000L)))

    // Perfectly duplicated features: OLS is singular, ridge shares the
    // slope mass EXACTLY evenly (symmetric normal equations).
    val b = (1L to 20L).map(x => (10L + 4L * x, x, x)).toDF("y", "x1", "x2")
    intercept[IllegalArgumentException] {
      Supervised.ridgePath2(b, col("y"), col("x1"), col("x2"), Seq(0L))
    }
    val pb = Supervised.ridgePath2(b, col("y"), col("x1"), col("x2"),
        lambdas = Seq(100L))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(pb._3 === pb._4)                  // b1 == b2, bit for bit
    assert(pb._3 > 1500000L && pb._3 < 2500000L) // ~half of 4e6 each
    assert(pb._5 > 990000L)                  // R^2 still ~1
  }

  test("gcompAte recovers the planted zero effect EXACTLY and audits overlap") {
    // Same confounded layout as the ipwAte spec (within-stratum diffs
    // are literally zero), plus a treated-only stratum x=2 that must be
    // DROPPED and counted, not averaged in.
    val rows = Seq.fill(80)((0L, 0L, 100L)) ++ Seq.fill(20)((1L, 0L, 100L)) ++
      Seq.fill(20)((0L, 1L, 200L)) ++ Seq.fill(80)((1L, 1L, 200L)) ++
      Seq.fill(10)((1L, 2L, 999L))
    val got = Supervised.gcompAte(rows.toDF("t", "x", "y"),
        col("t"), col("y"), Seq("x" -> col("x")))
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((2L, 200L, 10L, 0L)))
  }

  test("psmAtt matches within-stratum and drops out-of-caliper treated") {
    // The gcompAte layout: own-stratum matches have identical propensity
    // (delta = 0), so a caliper of 1 quantum admits exactly those, the
    // pair contrasts are literally zero, and the treated-only x=2
    // stratum has no control at its propensity -> unmatched.
    val rows = Seq.fill(80)((0L, 0L, 100L)) ++ Seq.fill(20)((1L, 0L, 100L)) ++
      Seq.fill(20)((0L, 1L, 200L)) ++ Seq.fill(80)((1L, 1L, 200L)) ++
      Seq.fill(10)((1L, 2L, 999L))
    val got = Supervised.psmAtt(rows.toDF("t", "x", "y"),
        col("t"), col("y"),
        Seq("intercept" -> lit(1L), "x" -> col("x")),
        lrShift = 0, iters = 10, caliperQ = 1L)
      .as[(Long, Long, Long)].head()
    assert(got === ((100L, 10L, 0L)))
  }

  test("ipwAte removes a planted confounder the naive contrast falls for") {
    // Stratum x=0: 20% treated, outcome 100; stratum x=1: 80% treated,
    // outcome 200. TRUE effect is zero — treatment just concentrates in
    // the high-outcome stratum. Naive contrast: 180 - 120 = 60 cents =
    // 600000 micros; a decent propensity (e(0)=.2, e(1)=.8) reweights
    // both arms back to mean 150, so the IPW estimate collapses toward 0.
    val rows = Seq.fill(80)((0L, 0L, 100L)) ++ Seq.fill(20)((1L, 0L, 100L)) ++
      Seq.fill(20)((0L, 1L, 200L)) ++ Seq.fill(80)((1L, 1L, 200L))
    val df = rows.toDF("t", "x", "y")
    val got = Supervised.ipwAte(df, col("t"), col("y"),
        Seq("intercept" -> lit(1L), "x" -> col("x")),
        lrShift = 0, iters = 40)
      .as[(Long, Long, Long, Long)].head()
    assert(got._1 === 100L && got._2 === 100L)
    assert(got._3 === 600000L) // the confounded naive readout, exact
    assert(math.abs(got._4) < 150000L,
      s"IPW should kill most of the planted confounding, got ${got._4}")
  }

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

  test("olsFit2 recovers an exact linear relation with r2 = 1") {
    // y = 3 + 2*x1 + 5*x2 exactly: Cramer must return the coefficients
    // in exact micros and SSE must be exactly zero.
    val df = (for (x1 <- 0 to 4; x2 <- 0 to 3)
      yield (3L + 2 * x1 + 5 * x2, x1.toLong, x2.toLong)).toDF("y", "x1", "x2")
    val got = Supervised.olsFit2(df, col("y"), col("x1"), col("x2"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("b0_micro" -> 3000000L, "b1_micro" -> 2000000L,
      "b2_micro" -> 5000000L, "n_rows" -> 20L, "r2_ppm" -> 1000000L))
  }

  test("olsFit2 rejects collinear features") {
    val df = (0 to 9).map(i => (i.toLong, i.toLong, 2L * i)).toDF("y", "x1", "x2")
    intercept[IllegalArgumentException] {
      Supervised.olsFit2(df, col("y"), col("x1"), col("x2"))
    }
  }

  test("looTargetEncode: each row is scored without its own label; singletons fall back") {
    // cat A: ys (1,1,0) -> LOO enc for y=1 rows: (2-1)/2 = 500000;
    // for the y=0 row: (2-0)/2 = 1000000. cat B singleton -> global
    // mean 3/4 = 750000.
    val df = Seq(("A", 1L), ("A", 1L), ("A", 0L), ("B", 1L))
      .toDF("cat", "y")
    val got = Supervised.looTargetEncode(df, col("cat"), col("y"))
      .as[(String, Long, Long, Long)].collect()
    assert(got === Array(("A", 0L, 1L, 1000000L), ("A", 1L, 2L, 500000L),
      ("B", 1L, 1L, 750000L)))
  }

  test("miRanking: a determining feature dominates an independent one") {
    // x_dep == y exactly (MI = ln 2 per row); x_ind constant (MI = 0).
    val df = (0 until 8).map(i => (i % 2, i % 2, 1)).toDF("y", "dep", "ind")
    val got = Supervised.miRanking(df, col("y"),
        Seq("dep" -> col("dep"), "ind" -> col("ind")))
      .as[(String, Long)].collect()
    // 8 * (lnq(8) - lnq(4)) = 8 * (2079442 - 1386294)
    assert(got === Array(("dep", 5545184L), ("ind", 0L)))
  }

  test("gbStumps finds the separating split and halves the residual each round") {
    // y = (x0 <= 2) exactly; feature c is constant (no admissible split,
    // must be ignored). Shrinkage 1/2 => leaf_lo walks 500000, 250000,
    // 125000 while the threshold stays pinned at the true boundary.
    val df = (0 to 5).map(x => (if (x <= 2) 1L else 0L, x.toLong, 7L))
      .toDF("y", "x0", "c")
    val got = Supervised.gbStumps(df, col("y"),
        Seq("x0" -> col("x0"), "c" -> col("c")), rounds = 3)
      .as[(Long, String, Long, Long, Long)].collect()
    assert(got === Array(
      (1L, "x0", 2L, 500000L, 0L),
      (2L, "x0", 2L, 250000L, 0L),
      (3L, "x0", 2L, 125000L, 0L)))
  }

  test("poissonFit recovers a planted log-linear rate") {
    // y = 2^x exactly for x in 0..3: the log-link MLE is w_int = 0,
    // w_x = ln 2 (693147 micro). 200 slow GD steps land close; the
    // exact landing point is pinned (fixed-point arithmetic).
    val df = (for (x <- 0 to 3; _ <- 1 to 4) yield (1L << x, x.toLong))
      .toDF("y", "x")
    val got = Supervised.poissonFit(df, col("y"),
        Seq("intercept" -> lit(1L), "x" -> col("x")),
        lrShift = 5, iters = 200)
      .as[(String, Long)].collect().toMap
    assert(got("w_x") > 650000L && got("w_x") < 730000L, got.toString)
    assert(math.abs(got("w_intercept")) < 60000L, got.toString)
    assert(got === Map("n_rows" -> 16L, "w_intercept" -> 11645L,
      "w_x" -> 688653L), got.toString)
  }

  test("bradleyTerry recovers the planted strength ladder, exactly pinned") {
    // A beats B 9:1, B beats C 9:1 -> ladder A > B > C with symmetric
    // end scores (gradients sum to zero, so the fold keeps the ladder
    // centered); landing point pinned from the fixed-point arithmetic.
    val pairs = (Seq.fill(9)(("A", "B")) ++ Seq(("B", "A")) ++
      Seq.fill(9)(("B", "C")) ++ Seq(("C", "B"))).toDF("w", "l")
    val got = Supervised.bradleyTerry(pairs, col("w"), col("l"),
        lrShift = 1, iters = 10)
      .as[(String, Long, Long, Long)].collect()
    assert(got === Array(("A", 765980L, 9L, 1L), ("B", 7L, 10L, 10L),
      ("C", -765965L, 1L, 9L)))
    val rep = Supervised.bradleyTerry(pairs.repartition(7), col("w"),
      col("l"), lrShift = 1, iters = 10)
      .as[(String, Long, Long, Long)].collect()
    assert(rep === got)
  }

  test("gbStumps is invariant to partitioning") {
    val df = (0 until 120).map(i => ((i % 3 == 0) || (i % 7 == 0),
      (i % 5).toLong, (i % 4).toLong)).toDF("y", "a", "b")
    val fit = Supervised.gbStumps(df, col("y").cast("long"),
      Seq("a" -> col("a"), "b" -> col("b")), rounds = 4).collect()
    val fit11 = Supervised.gbStumps(df.repartition(11), col("y").cast("long"),
      Seq("a" -> col("a"), "b" -> col("b")), rounds = 4).collect()
    assert(fit.toSeq === fit11.toSeq)
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
