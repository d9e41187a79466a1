package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("fdG3Audit prices a candidate FD in minimum row deletions") {
    // x=1 maps to {a, a, b}: keep the majority pair, delete 1 row;
    // x=2 maps to {c}: clean. g3 = 1 of 4 rows = 250000 ppm. The id
    // column holds exactly (distinct per row).
    val df = Seq((1L, "a", 10L), (1L, "a", 11L), (1L, "b", 12L),
      (2L, "c", 13L)).toDF("x", "a", "id")
    val got = Profile.fdG3Audit(df, Seq("x" -> "a", "id" -> "a"))
      .as[(String, String, Long, Long, Long, Boolean)].collect()
    assert(got === Array(
      ("id", "a", 4L, 0L, 0L, true),
      ("x", "a", 4L, 1L, 250000L, false)))
  }

  test("profile counts nulls and distincts and stringifies min/max per column") {
    val df = Seq((Some(1L), "a"), (None, "b"), (Some(3L), "b"))
      .toDF("id", "tag")
    val got = Profile.profile(df, Seq("id", "tag")).orderBy("col_name")
      .as[(String, Long, Long, String, String)].collect()
    assert(got(0) === (("id", 1L, 2L, "1", "3")))
    assert(got(1) === (("tag", 0L, 2L, "a", "b")))
  }

  test("profile handles non-identifier column names (spaces, dots, keywords)") {
    val df = Seq((1L, "x"), (2L, "y"))
      .toDF("order date", "select.a")
    val got = Profile.profile(df, Seq("order date", "select.a"))
      .orderBy("col_name")
      .as[(String, Long, Long, String, String)].collect()
    assert(got(0) === (("order date", 0L, 2L, "1", "2")))
    assert(got(1) === (("select.a", 0L, 2L, "x", "y")))
  }

  test("cdcApply keeps the latest non-delete row and drops deleted keys") {
    val log = Seq(
      // key 1: insert then update — snapshot keeps the update
      (1L, 10L, 1L, "U", "v1"), (1L, 20L, 2L, "U", "v2"),
      // key 2: update then delete — key disappears
      (2L, 10L, 3L, "U", "x"), (2L, 30L, 4L, "D", "x"),
      // key 3: delete then REINSERT — resurrection wins
      (3L, 10L, 5L, "D", "dead"), (3L, 40L, 6L, "U", "alive"))
      .toDF("k", "ts", "seq", "op", "payload")
    val got = Profile.cdcApply(log, "k", Seq("ts", "seq"), "op", "D",
        Seq("payload"))
      .orderBy("k").as[(Long, Long, Long, String)].collect()
    assert(got === Array((1L, 20L, 2L, "v2"), (3L, 40L, 6L, "alive")))
  }

  test("cdcApply aggregates partially below the exchange (no window sort)") {
    val log = Seq((1L, 10L, 1L, "U", "v")).toDF("k", "ts", "seq", "op", "p")
    val plan = Profile.cdcApply(log, "k", Seq("ts", "seq"), "op", "D",
      Seq("p")).queryExecution.executedPlan.toString
    assert(plan.contains("partial_max") || plan.contains("partial max")
      || plan.toLowerCase.contains("hashaggregate"),
      s"expected hash aggregation, got:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window sort:\n$plan")
  }

  test("snapshotDiff classifies inserts, deletes, updates and drops unchanged") {
    val old = Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"))
      .toDF("k", "price", "status")
    val nw = Seq((2L, 20.0, "B"),      // unchanged — must not appear
                 (3L, 31.0, "C"),      // price update
                 (4L, 40.0, "D"))      // insert; key 1 deleted
      .toDF("k", "price", "status")
    val got = Profile.snapshotDiff(old, nw, "k", Seq("price", "status"))
      .orderBy("k")
      .as[(Long, String, Option[Double], Option[Double],
           Option[String], Option[String])].collect()
    assert(got === Array(
      (1L, "D", Some(10.0), None, Some("A"), None),
      (3L, "U", Some(30.0), Some(31.0), Some("C"), Some("C")),
      (4L, "I", None, Some(40.0), None, Some("D"))))
  }

  test("snapshotDiff treats null payloads null-safely (null -> value is U)") {
    val old = Seq((1L, Option.empty[String]), (2L, Option("x")))
      .toDF("k", "v")
    val nw = Seq((1L, Option("y")), (2L, Option("x"))).toDF("k", "v")
    val got = Profile.snapshotDiff(old, nw, "k", Seq("v"))
      .as[(Long, String, Option[String], Option[String])].collect()
    assert(got === Array((1L, "U", None, Some("y"))))
  }

  test("latestPerKey keeps exactly the max-(order,tie) row per key") {
    val df = Seq(
      (7L, 100L, 1L, "old"), (7L, 200L, 2L, "new"),
      (8L, 100L, 9L, "hi"), (8L, 100L, 3L, "lo"))
      .toDF("k", "ts", "seq", "payload")
    val got = Profile.latestPerKey(df, "k", Seq("ts", "seq"), Seq("payload"))
      .orderBy("k").as[(Long, Long, Long, String)].collect()
    assert(got === Array((7L, 200L, 2L, "new"), (8L, 100L, 9L, "hi")))
  }

  test("histogram spans [min,max] with empty bins emitted and max in the top bin") {
    // values 0..10: bins over [0,10]; nothing lands in (6,8]-ish gaps.
    val df = Seq(0.0, 1.0, 2.0, 10.0, 10.0).toDF("v")
    val got = Profile.histogram(df, "v", nBins = 5)
      .orderBy("bin").as[(Int, Double, Double, Long)].collect()
    assert(got === Array(
      (0, 0.0, 2.0, 2L),   // 0, 1
      (1, 2.0, 4.0, 1L),   // 2
      (2, 4.0, 6.0, 0L),   // empty bin still present
      (3, 6.0, 8.0, 0L),
      (4, 8.0, 10.0, 2L))) // max is top-bin-closed
    assert(got.map(_._4).sum === 5L)
  }

  test("keySkew surfaces the hot key with its share and the global skew factor") {
    // key "hot" has 6 of 10 rows; 3 keys -> mean 10/3, skew 6/(10/3) = 1.8
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold"))
      .toDF("k")
    val got = Profile.keySkew(df, "k", topK = 2)
      .as[(String, Long, Double, Long, Double)].collect().toSeq
      .sortBy(-_._2)
    assert(got === Seq(
      ("hot", 6L, 0.6, 3L, 1.8),
      ("warm", 3L, 0.3, 3L, 1.8)))
  }

  test("expectations count violations per rule kind on dirty data") {
    val child = Seq((1L, 10.0), (1L, -5.0), (2L, 0.0), (9L, 3.0))
      .toDF("k", "price")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val report = Profile
      .expectRowRules(child, Seq("positive_price" -> !(col("price") > 0)))
      .unionByName(Profile.expectUnique(child, "unique_k", Seq("k")))
      .unionByName(Profile.expectFk(child, "k", parent, "pk", "fk_k"))
      .orderBy("rule")
      .as[(String, Long, Long, Boolean)].collect()
    assert(report === Array(
      ("fk_k", 4L, 1L, false),          // k=9 has no parent
      ("positive_price", 4L, 2L, false), // -5.0 and 0.0
      ("unique_k", 4L, 1L, false)))      // k=1 appears twice
  }

  test("histogram degenerates safely when every value is identical") {
    val df = Seq(3.0, 3.0, 3.0).toDF("v")
    val got = Profile.histogram(df, "v", nBins = 4)
      .orderBy("bin").as[(Int, Double, Double, Long)].collect()
    assert(got.length === 4)
    assert(got.head === ((0, 3.0, 3.0, 3L)))
    assert(got.tail.forall(_._4 === 0L))
  }

  test("distributionDrift is zero for identical populations, localized for a shift") {
    val base = (1 to 100).map(i => i.toDouble).toDF("x")
    val same = Profile.distributionDrift(base, base, "x", nBins = 5)
      .orderBy("bin")
      .as[(Int, Double, Double, Long, Long, Double, Double, Double)].collect()
    assert(same.length === 5)
    assert(same.forall(_._8 === 0.0), "identical populations must not drift")

    // b moves 20 points from the bottom bin to the top: dp concentrates in
    // exactly those two bins, and TVD (Σdp/2) is 0.2.
    val shifted = ((21 to 100) ++ (81 to 100)).map(_.toDouble).toDF("x")
    val drift = Profile.distributionDrift(base, shifted, "x", nBins = 5)
      .orderBy("bin")
      .as[(Int, Double, Double, Long, Long, Double, Double, Double)].collect()
    assert(math.abs(drift.map(_._8).sum / 2 - 0.2) < 1e-9)
    assert(drift(0)._8 === 0.2) // bottom bin lost its mass (round(.,6) exact)
    assert(drift(4)._8 === 0.2) // top bin gained it
    assert(drift(1)._8 === 0.0 && drift(2)._8 === 0.0 && drift(3)._8 === 0.0)
  }

  test("kAnonymityAudit surfaces only under-k combinations with their risk") {
    val rows = Seq(
      ("A", 1L), ("A", 1L), ("A", 1L), // safe at k=3
      ("A", 2L), ("A", 2L),            // 2 < 3 → violation
      ("B", 1L)).toDF("seg", "nat")    // singleton → worst risk
    val got = Profile.kAnonymityAudit(rows, Seq("seg", "nat"), k = 3)
      .orderBy("seg", "nat")
      .as[(String, Long, Long, Double)].collect()
    assert(got === Array(("A", 2L, 2L, 0.5), ("B", 1L, 1L, 1.0)))
    // Coarsening the QI (seg alone) leaves only the B singleton…
    val coarse = Profile.kAnonymityAudit(rows, Seq("seg"), k = 3)
      .as[(String, Long, Double)].collect()
    assert(coarse === Array(("B", 1L, 1.0)))
    // …and a k-anonymous dataset certifies with an EMPTY report.
    assert(Profile.kAnonymityAudit(rows.filter($"seg" === "A"), Seq("seg"),
      k = 3).count() === 0)
  }

  test("scdType2 chains half-open validity intervals with one current version per key") {
    val log = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "c"),
      (2L, 15L, 4L, "x"),
      // key 3: tied instants — the tie column orders versions; the earlier
      // one gets a zero-length [15, 15) interval, consistent both engines
      (3L, 15L, 5L, "old"), (3L, 15L, 6L, "new"))
      .toDF("k", "ts", "seq", "payload")
    val got = Profile.scdType2(log, "k", Seq("ts", "seq"), Seq("payload"))
      .select("k", "version_num", "valid_from", "valid_to", "is_current",
        "payload")
      .orderBy("k", "version_num")
      .as[(Long, Int, Long, Option[Long], Boolean, String)].collect()
    assert(got === Array(
      (1L, 1, 10L, Some(20L), false, "a"),
      (1L, 2, 20L, Some(30L), false, "b"),
      (1L, 3, 30L, None, true, "c"),
      (2L, 1, 15L, None, true, "x"),
      (3L, 1, 15L, Some(15L), false, "old"),
      (3L, 2, 15L, None, true, "new")))
    // invariants: version numbers contiguous from 1; each valid_to equals
    // the successor's valid_from; exactly one open (current) row per key
    got.groupBy(_._1).foreach { case (_, vs) =>
      assert(vs.map(_._2).toSeq === (1 to vs.length))
      vs.sortBy(_._2).sliding(2).foreach {
        case Array(p, n) => assert(p._4.contains(n._3))
        case _ =>
      }
      assert(vs.count(_._5) === 1 && vs.last._5)
    }
  }

  test("point-in-time enrichment: scdType2 interval probe equals the as-of join") {
    // Two independent machineries must agree: probing the SCD2 validity
    // intervals with [from, to) semantics, and the backward as-of join on
    // the raw version instants (the union+window single-exchange plan).
    val log = graft.Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"value")
      .filter($"event_id" % 3 === 0)
    val dim = Profile.scdType2(log, "user_id",
      Seq("ts", "event_id"), Seq("value"))
    // probe each user on a fixed minute grid spanning the history
    val probes = graft.Tables.events(spark, sf)
      .filter($"event_id" % 17 === 0)
      .select($"user_id", $"ts".as("probe_ts"))
    val viaIntervals = probes.join(dim,
        probes("user_id") === dim("user_id") &&
          $"probe_ts" >= $"valid_from" &&
          ($"valid_to".isNull || $"probe_ts" < $"valid_to"),
        "left")
      .select(probes("user_id"), $"probe_ts", $"value")
      .as[(Long, java.sql.Timestamp, Option[Double])].collect().toSet
    val viaAsOf = AsOfJoin.leftAsOf(probes, log.drop("event_id"),
        keys = Seq("user_id"), leftTime = "probe_ts", rightTime = "ts",
        rightPayload = Seq("value"))
      .select($"user_id", $"probe_ts", $"value")
      .as[(Long, java.sql.Timestamp, Option[Double])].collect().toSet
    assert(viaIntervals === viaAsOf)
    assert(viaIntervals.exists(_._3.isDefined), "probes must hit versions")
    assert(viaIntervals.exists(_._3.isEmpty),
      "some probes should precede their user's first version")
  }

  test("interRaterKappa: chance-level, perfect, degenerate, and disjoint raters") {
    import spark.implicits._
    def kappa(a: Seq[(Long, String)], b: Seq[(Long, String)]) =
      Profile.interRaterKappa(a.toDF("item", "lab"), b.toDF("item", "lab"),
          "item", "lab")
        .as[(Long, Long, Double, Double, Option[Double])].collect().head
    // marginals 50/50 both sides, agreement exactly at chance -> kappa 0
    val chance = kappa(
      Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "y")),
      Seq((1L, "x"), (2L, "y"), (3L, "y"), (4L, "x")))
    assert(chance === ((4L, 2L, 0.5, 0.5, Some(0.0))))
    // identical raters -> kappa 1
    val perfect = kappa(Seq((1L, "x"), (2L, "y")), Seq((1L, "x"), (2L, "y")))
    assert(perfect === ((2L, 2L, 1.0, 0.5, Some(1.0))))
    // both raters constant and identical: pe = 1 -> kappa undefined
    val degen = kappa(Seq((1L, "x"), (2L, "x")), Seq((1L, "x"), (2L, "x")))
    assert(degen === ((2L, 2L, 1.0, 1.0, None)))
    // label sets disjoint: S = 0, agree = 0 -> kappa 0, not an error
    val disjoint = kappa(Seq((1L, "x"), (2L, "x")), Seq((1L, "y"), (2L, "y")))
    assert(disjoint === ((2L, 0L, 0.0, 0.0, Some(0.0))))
  }

  test("rocAuc handles separation, reversal, ties, and degenerate labels") {
    def auc(rows: Seq[(Boolean, Int)]) =
      Profile.rocAuc(rows.toDF("label", "score"), col("label"), col("score"))
        .as[(Long, Long, Long, Option[Double])].collect().head
    // perfect separation -> 1.0
    val sep = auc(Seq((false, 1), (false, 2), (true, 3), (true, 4)))
    assert(sep === ((2L, 2L, 8L, Some(1.0))))
    // perfectly wrong -> 0.0
    val rev = auc(Seq((true, 1), (true, 2), (false, 3), (false, 4)))
    assert(rev === ((2L, 2L, 0L, Some(0.0))))
    // every score tied -> chance, via the half-credit tie path
    val tied = auc(Seq((true, 5), (false, 5)))
    assert(tied === ((1L, 1L, 1L, Some(0.5))))
    // mixed with a pos/neg tie at score 2: 2U = 7 -> AUC 7/8
    val mixed = auc(Seq((false, 1), (false, 2), (true, 2), (true, 3)))
    assert(mixed === ((2L, 2L, 7L, Some(0.875))))
    // single-class input: AUC undefined -> null
    val degen = auc(Seq((true, 1), (true, 2)))
    assert(degen === ((2L, 0L, 0L, None)))
  }

  test("prCurve builds the confusion table at every threshold, hand-checked") {
    val rows = Seq((false, 1), (false, 2), (true, 2), (true, 3))
    val got = Profile.prCurve(rows.toDF("label", "score"),
        col("label"), col("score"))
      .as[(Int, Long, Long, Long, Long, Double, Option[Double], Double)]
      .collect()
    assert(got === Array(
      (1, 2L, 2L, 0L, 0L, 0.5, Some(1.0), 0.666667),
      (2, 2L, 1L, 0L, 1L, 0.666667, Some(1.0), 0.8),
      (3, 1L, 0L, 1L, 2L, 1.0, Some(0.5), 0.666667)))
    // no positives at all: recall undefined (null), F1 exactly 0
    val negOnly = Profile.prCurve(Seq((false, 1), (false, 2))
        .toDF("label", "score"), col("label"), col("score"))
      .as[(Int, Long, Long, Long, Long, Double, Option[Double], Double)]
      .collect()
    assert(negOnly === Array(
      (1, 0L, 2L, 0L, 0L, 0.0, None, 0.0),
      (2, 0L, 1L, 0L, 1L, 0.0, None, 0.0)))
  }

  test("adjustedRand: identical -> 1, trivial-vs-real -> 0, crossed -> -0.5") {
    def ari(pairs: Seq[(String, String)]) =
      Profile.adjustedRand(pairs.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Long, Long, Option[Double])].collect().head
    val same = ari(Seq(("x", "x"), ("x", "x"), ("y", "y")))
    assert(same === ((3L, 2L, 2L, 2L, Some(1.0))))
    // one partition puts everything in one cluster: agreement is exactly
    // what chance predicts -> 0
    val triv = ari(Seq(("x", "p"), ("x", "p"), ("x", "q"), ("x", "q")))
    assert(triv === ((4L, 4L, 12L, 4L, Some(0.0))))
    // fully crossed 2x2 design: below-chance pair agreement
    val crossed = ari(Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")))
    assert(crossed === ((4L, 0L, 4L, 4L, Some(-0.5))))
    // both partitions trivial: ARI undefined -> null
    val degen = ari(Seq(("x", "p"), ("x", "p")))
    assert(degen === ((2L, 2L, 2L, 2L, None)))
  }

  test("gini is 0 when uniform, (n-1)/n when one group holds everything") {
    def g(xs: Seq[Long]) =
      Profile.gini(xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
        .toDF("k", "x"), "x")
        .as[(Long, Long, Option[Double])].collect().head
    assert(g(Seq(5L, 5L, 5L, 5L)) === ((4L, 20L, Some(0.0))))
    // one holder of 3: G = (n-1)/n = 2/3, rank ties at 0 don't matter
    assert(g(Seq(0L, 0L, 10L)) === ((3L, 10L, Some(0.666667))))
    // hand case: x = [1, 3] -> (2*7 - 3*4) / (2*4) = 0.25
    assert(g(Seq(1L, 3L)) === ((2L, 4L, Some(0.25))))
    // all-zero weights: concentration undefined -> null
    assert(g(Seq(0L, 0L)) === ((2L, 0L, None)))
  }

  test("bootstrapCi degenerates to a zero-width interval on constant data") {
    // Every replica's weighted mean of a constant is the constant, so
    // est = lo = hi = 42e6 regardless of the Poisson draws.
    val df = (1L to 50L).map(i => (i, 42L)).toDF("k", "x")
    val got = Profile.bootstrapCi(df, col("k"), col("x"), replicas = 64)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === ((64L, 42000000L, 42000000L, 42000000L)))
  }

  test("bootstrapCi is partitioning-invariant and brackets the estimate") {
    val df = (1L to 200L).map(i => (i, i % 37)).toDF("k", "x")
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.bootstrapCi(d, col("k"), col("x"))
        .as[(Long, Long, Long, Long)].collect().head
    val a = run(df)
    assert(a === run(df.repartition(13)))
    val (n, est, lo, hi) = a
    assert(n === 64L)
    assert(lo <= est && est <= hi)
    assert(lo < hi, "nonconstant data must have a nonzero-width CI")
  }

  test("bootstrapCi ranks zero-weight (null-mean) replicas LAST, as the oracle does") {
    // One row, 20 replicas: each replica's mean is either 1e6·x (weight
    // ≥ 1) or NULL (weight 0). For key "1" the md5 draw zeroes 8 of the
    // 20 replicas (precomputed), so under the explicit NULLS LAST order
    // rank 1 is a REAL mean → lo = 42e6, and rank 19 falls among the
    // nulls → hi null; est = (12·42e6) div 20. Spark's default
    // NULLS FIRST would flip lo to null — the engine/oracle divergence
    // this pins.
    val df = Seq((1L, 42L)).toDF("k", "x")
    val got = Profile.bootstrapCi(df, col("k"), col("x"), replicas = 20)
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(got === ((20L, 25200000L, 42000000L, None)))
  }

  test("calibrationBins guards degenerate score domains") {
    // All-zero scores: everything lands in bin 0 with null confidence
    // (no max to normalize by) instead of a division error.
    val z = Seq((true, 0L), (false, 0L)).toDF("y", "sc")
    val gz = Profile.calibrationBins(z, col("y"), col("sc"))
      .as[(Long, Long, Long, Option[Long], Long, Option[Long])]
      .collect()
    assert(gz === Array((0L, 2L, 1L, None, 500000L, None)))
    // Negative scores are dropped, and the top score clamps to the last
    // bin: two sc=10 rows → bin 9, conf = (1e6·20) div (2·10) = 1e6.
    val m = Seq((true, -5L), (false, 10L), (true, 10L)).toDF("y", "sc")
    val gm = Profile.calibrationBins(m, col("y"), col("sc"))
      .as[(Long, Long, Long, Option[Long], Long, Option[Long])]
      .collect()
    assert(gm === Array((9L, 2L, 1L, Some(1000000L), 500000L,
      Some(500000L))))
  }

  test("bootstrapCi shuffles replica partials, not the exploded corpus") {
    val df = (1L to 50L).map(i => (i, i)).toDF("k", "x")
    val p = Profile.bootstrapCi(df, col("k"), col("x"))
      .queryExecution.executedPlan.toString
    val ex = p.indexOf("Exchange hashpartitioning")
    assert(ex >= 0, s"expected a replica-keyed exchange:\n$p")
    assert(p.indexOf("partial_sum", ex) >= 0,
      s"map-side partial sums missing below the exchange:\n${p.take(1500)}")
  }

  test("silhouette scores tight well-separated clusters near 1, overlap near 0") {
    val cents = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("centroid_id", "cent")
    // Two tight clusters hugging orthogonal centroids.
    val tight = Seq(
      (10L, Array(1f, 0.01f)), (11L, Array(1f, -0.01f)),
      (20L, Array(0.01f, 1f)), (21L, Array(-0.01f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Profile
      .silhouette(tight, cents, "vec_id", "embedding", "centroid_id", "cent")
      .as[(Long, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2)) === Array((0L, 2L), (1L, 2L)))
    assert(got.forall(_._3 > 900000L), s"tight clusters must score high: ${got.toSeq}")
    // A point on the bisector scores ~0: equally close to both centroids.
    val mid = Seq((30L, Array(1f, 1f))).toDF("vec_id", "embedding")
    val m = Profile
      .silhouette(mid, cents, "vec_id", "embedding", "centroid_id", "cent")
      .as[(Long, Long, Long)].collect().head
    assert(m._3 <= 1L, s"bisector point must score ~0, got ${m._3}")
  }

  test("calibrationBins computes integer conf/acc per band") {
    // scores 1..10 (max 10), positive iff score >= 8.
    val df = (1L to 10L).map(i => (i >= 8, i)).toDF("y", "sc")
    val got = Profile.calibrationBins(df, col("y"), col("sc"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // bin 5 holds only score 5: conf = 5e5, acc = 0, gap = 5e5.
    val b5 = got.find(_._1 == 5L).get
    assert(b5 === ((5L, 1L, 0L, 500000L, 0L, 500000L)))
    // top bin clamps scores 9 and 10: conf = 19/20, acc = 1.
    val b9 = got.find(_._1 == 9L).get
    assert(b9 === ((9L, 2L, 2L, 950000L, 1000000L, 50000L)))
    assert(got.map(_._2).sum === 10L)
  }

  test("simpsonConcentration matches hand-computed mixes") {
    // user 1: 2+2 of two types -> simpson 1/2; user 2: all one type -> 1.
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "b"),
      (2L, "a"), (2L, "a")).toDF("u", "t")
    val got = Profile.simpsonConcentration(df, "u", "t")
      .orderBy($"u").as[(Long, Long, Long, Long, Long)].collect()
    assert(got === Array(
      (1L, 2L, 4L, 500000L, 2000000L),
      (2L, 1L, 2L, 1000000L, 1000000L)))
  }

  test("fleissKappa matches hand-worked agreement cases, sign included") {
    // Perfect two-category agreement -> kappa exactly 1e6.
    val perfect = Seq((1L, "A"), (1L, "A"), (1L, "A"),
      (2L, "B"), (2L, "B"), (2L, "B")).toDF("item", "cat")
    val kp = Profile.fleissKappa(perfect, "item", "cat", raters = 3)
      .select($"kappa_micro").as[Long].head()
    assert(kp === 1000000L)
    // Mixed case: S = 17, C = 41, n = 3 -> kappa = -10/80 = -0.125
    // (worse than chance; exercises the cross-engine sign handling).
    val mixed = Seq(
      (1L, "A"), (1L, "A"), (1L, "A"),
      (2L, "A"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"), (3L, "C")).toDF("item", "cat")
    val got = Profile.fleissKappa(mixed, "item", "cat", raters = 3)
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((3L, 444444L, 506172L, -125000L)))
  }

  test("permutationMeanTest: planted separation is extreme, constant data is not") {
    // Group TRUE all 100, FALSE all 1: no binomial hash allocation of 40
    // rows should reproduce that mean gap -> n_extreme 0, p = 1/101.
    val planted = (0 until 40).map(i => (i.toLong, if (i < 20) 100L else 1L,
      i < 20)).toDF("id", "y", "g")
    val gotP = Profile.permutationMeanTest(planted, col("id"), col("y"),
        col("g"), replicates = 100)
      .as[(Long, Long, Long)].collect().head
    assert(gotP === ((40L, 0L, 9900L)), gotP.toString)
    // Constant y: every replicate's statistic equals the observed 0 ->
    // everything is "extreme", p = 1.
    val const = (0 until 40).map(i => (i.toLong, 7L, i % 2 == 0))
      .toDF("id", "y", "g")
    val gotC = Profile.permutationMeanTest(const, col("id"), col("y"),
        col("g"), replicates = 100)
      .as[(Long, Long, Long)].collect().head
    assert(gotC === ((40L, 100L, 1000000L)), gotC.toString)
  }

  test("mannWhitneyU matches hand-worked rank sums, midranks for ties") {
    import org.apache.spark.sql.functions.lit
    // Complete separation: A={3,5} all above B={1,2} -> U1=n1*n2, AUC=1.
    val sep = Seq((1L, 3.0, "a"), (1L, 5.0, "a"), (1L, 1.0, "b"),
      (1L, 2.0, "b")).toDF("g", "v", "cls")
    val s = Profile.mannWhitneyU(sep, "g", "v",
      col("cls") === "a", col("cls") === "b")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(s === ((1L, 2L, 2L, 8L, 1000000L)))
    // Tie across classes: A={2}, B={1,2} -> U1 = 1.5 (2U1 = 3),
    // AUC = 1.5/2 = 0.75 — midrank 2.5 carried as doubled rank 5.
    val tied = Seq((1L, 2.0, "a"), (1L, 1.0, "b"), (1L, 2.0, "b"))
      .toDF("g", "v", "cls")
    val t = Profile.mannWhitneyU(tied, "g", "v",
      col("cls") === "a", col("cls") === "b")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(t === ((1L, 1L, 2L, 3L, 750000L)))
    // A group with only one class present is dropped, not divided by 0.
    val one = Seq((1L, 2.0, "a")).toDF("g", "v", "cls")
    assert(Profile.mannWhitneyU(one, "g", "v",
      col("cls") === "a", col("cls") === "b").count() === 0L)
  }

  test("corrMatrix computes every pair in one pass with null on zero variance") {
    val df = Seq((1L, 2L, 3L, 5L), (2L, 4L, 2L, 5L), (3L, 6L, 1L, 5L))
      .toDF("x", "y", "z", "w")
    val got = Profile.corrMatrix(df, Seq(
        "x" -> col("x"), "y" -> col("y"), "z" -> col("z"), "w" -> col("w")))
      .orderBy("col_a", "col_b")
      .as[(String, String, Option[Double])].collect()
    assert(got === Array(
      ("x", "w", None), ("x", "y", Some(1.0)), ("x", "z", Some(-1.0)),
      ("y", "w", None), ("y", "z", Some(-1.0)), ("z", "w", None)))
  }

  test("featureDrift: identical populations drift 0, a disjoint shift is 1") {
    val df = Seq(
      // x identical across periods; y fully shifted (A in [0,9], B in
      // [90,99] -> no shared bin).
      (1L, 1L, true), (5L, 5L, true), (9L, 9L, true),
      (1L, 91L, false), (5L, 95L, false), (9L, 99L, false))
      .toDF("x", "y", "in_a")
    val got = Profile.featureDrift(df,
        Seq("x" -> col("x"), "y" -> col("y")), col("in_a"), bins = 4)
      .orderBy("feature")
      .as[(String, Long, Long, Option[Long])].collect()
    assert(got === Array(
      ("x", 3L, 3L, Some(0L)),
      ("y", 3L, 3L, Some(1000000L))))
  }

  test("reconcile separates orphans, matches, and mismatches exactly") {
    val headers = Seq((1L, 10.00), (2L, 5.00), (3L, 7.00))
      .toDF("k", "amt")
    val details = Seq(
      (1L, 6.00), (1L, 4.00), // matches exactly
      (2L, 5.10)) // off by ~10 cents; key 3 orphan. (5.10 floors to
      // 509 cents - the double literal sits just below 5.10 - so the
      // drift is 9: the documented floor-quantization semantics.)
      .toDF("k", "amt")
    val got = Profile.reconcile(headers, details, "k",
        col("amt"), col("amt"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got === ((3L, 1L, 1L, 1L, 9L)))
  }

  test("gainsTable captures all positives at the top deciles with exact lift") {
    // Scores 10..1, one row each; positives at the two highest scores.
    val df = (1L to 10L).map(v => (v, v >= 9L)).toDF("v", "y")
    val got = Profile.gainsTable(df, col("v"), col("y"))
      .orderBy("decile")
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    // d=1: top row captures 1 of 2 (500000), lift 5x; d=2: both, 5x;
    // d=5: capture 1.0, lift 2x; d=10: lift exactly 1x.
    assert(got(0) === ((1, 10L, 1L, 1L, 500000L, 5000000L)))
    assert(got(1) === ((2, 9L, 2L, 2L, 1000000L, 5000000L)))
    assert(got(4) === ((5, 6L, 5L, 2L, 1000000L, 2000000L)))
    assert(got(9) === ((10, 1L, 10L, 2L, 1000000L, 1000000L)))
  }

  test("deadStock counts never-referenced dimension members") {
    val dim = Seq(1L, 2L, 3L, 4L).toDF("k")
    val fact = Seq(1L, 1L, 3L).toDF("fk")
    val got = Profile.deadStock(dim, "k", fact, "fk", "things")
      .as[(String, Long, Long, Long)].head()
    assert(got === (("things", 4L, 2L, 500000L)))
  }

  test("qqTable pairs per-class deciles; a pure scale shift is a flat ratio") {
    // Class b = 2 * class a at every rank -> ratio 0.5 at every decile.
    val rows = (1L to 10L).map((_, "a")) ++ (1L to 10L).map(v => (2 * v, "b"))
    val got = Profile.qqTable(rows.toDF("v", "cls"), col("v"),
        col("cls") === "a", col("cls") === "b")
      .orderBy("decile")
      .as[(Int, Long, Long, Long)].collect()
    assert(got.length === 9)
    got.zipWithIndex.foreach { case ((d, va, vb, r), i) =>
      assert(d === i + 1 && va === (i + 1).toLong && vb === 2L * (i + 1)
        && r === 500000L)
    }
  }

  test("twoProportionZ matches the hand-worked pooled statistic") {
    // A: 5/10, B: 1/10 -> pooled 0.3, z = 0.4/sqrt(0.042) = 1.9518.
    val rows = (1 to 10).map(i => ("a", i <= 5)) ++
      (1 to 10).map(i => ("b", i <= 1))
    val got = Profile.twoProportionZ(rows.toDF("arm", "y"),
        col("arm") === "a", col("arm") === "b", col("y"))
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(got === ((10L, 5L, 10L, 1L, Some(1.9518))))
    // Zero successes anywhere -> null, not NaN.
    val zero = Seq(("a", false), ("b", false)).toDF("arm", "y")
    val z = Profile.twoProportionZ(zero, col("arm") === "a",
        col("arm") === "b", col("y"))
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(z._5 === None)
  }

  test("skyline keeps only undominated points with their row counts") {
    val pts = Seq((1L, 5L), (2L, 9L), (3L, 9L), (2L, 5L)).toDF("x", "y")
    val got = Profile.skyline(pts, col("x"), col("y"))
      .orderBy("x").as[(Long, Long, Long)].collect()
    // (3,9) is dominated by (2,9); (2,5) by both (1,5)... (2,5) has
    // smaller y than best-at-2 and never reaches the frontier.
    assert(got === Array((1L, 5L, 1L), (2L, 9L, 1L)))
  }

  test("contingencyResiduals: independent table is 0, signed cells hand-checked") {
    // 2x2 with perfect independence: every residual 0.
    val indep = Seq(("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L))
      .toDF("a", "b")
    val r0 = Profile.contingencyResiduals(indep, "a", "b")
      .select($"residual").as[Double].collect()
    assert(r0.forall(_ === 0.0))
    // Concentrated cell: (x,1) twice, (y,2) twice: e = 1 everywhere,
    // residuals +1/-1 with the right signs.
    val conc = Seq(("x", 1L), ("x", 1L), ("y", 2L), ("y", 2L))
      .toDF("a", "b")
    val rc = Profile.contingencyResiduals(conc, "a", "b")
      .orderBy("a", "b")
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(rc === Array(("x", 1L, 2L, 2L, 2L, 1.0),
      ("y", 2L, 2L, 2L, 2L, 1.0)))
  }

  test("fdCheck counts ambiguous keys, max fan-out, and null-as-value") {
    val df = Seq((1L, Some("x")), (1L, Some("x")), // key 1 clean
      (2L, Some("x")), (2L, Some("y")), (2L, Some("z")), // violates, 3
      (3L, Some("x")), (3L, None)) // {x, null} IS ambiguous
      .toDF("l", "r")
    val got = Profile.fdCheck(df, "l", "r")
      .as[(String, String, Long, Long, Long, Long)].head()
    assert(got === (("l", "r", 3L, 2L, 3L, 666666L)))
  }

  test("shareShift reports exact micro share deltas between periods") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val rows = Seq(
      ("a", ts("2024-01-05"), 1.0), ("b", ts("2024-01-06"), 3.0),
      ("a", ts("2024-02-05"), 3.0), ("b", ts("2024-02-06"), 1.0))
      .toDF("dim", "ts", "amt")
    val got = Profile.shareShift(rows, "dim", "amt",
        col("ts") < ts("2024-02-01"), col("ts") >= ts("2024-02-01"))
      .orderBy("dim")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got === Array(
      ("a", 100L, 300L, 250000L, 750000L, 500000L),
      ("b", 300L, 100L, 750000L, 250000L, -500000L)))
  }

  test("giniStump finds the perfectly separating threshold with zero impurity") {
    val df = Seq((1L, "n"), (2L, "n"), (5L, "p"), (6L, "p"))
      .toDF("v", "cls")
    val got = Profile.giniStump(df, "v", col("cls") === "p")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(got === ((2L, 2L, 2L, 0L, 2L, 0L)))
    // A single distinct value has no valid split -> empty, not an error.
    val const = Seq((3L, "p"), (3L, "n")).toDF("v", "cls")
    assert(Profile.giniStump(const, "v", col("cls") === "p").count() === 0L)
  }

  test("ksTest finds full separation, zero for identical samples") {
    // g=1: A={1,2} strictly below B={3,4} -> D = 1 (ks_micro 1e6).
    // g=2: identical samples -> D = 0.
    val df = Seq(
      (1L, 1.0, "a"), (1L, 2.0, "a"), (1L, 3.0, "b"), (1L, 4.0, "b"),
      (2L, 1.0, "a"), (2L, 2.0, "a"), (2L, 1.0, "b"), (2L, 2.0, "b"))
      .toDF("g", "v", "cls")
    val got = Profile.ksTest(df, "g", "v",
        col("cls") === "a", col("cls") === "b")
      .orderBy("g").as[(Long, Long, Long, Long, Long)].collect()
    assert(got(0) === ((1L, 2L, 2L, 4L, 1000000L)))
    assert(got(1) === ((2L, 2L, 2L, 0L, 0L)))
    // One-class groups are dropped, not divided by zero.
    val one = Seq((9L, 1.0, "a")).toDF("g", "v", "cls")
    assert(Profile.ksTest(one, "g", "v",
      col("cls") === "a", col("cls") === "b").count() === 0L)
  }

  test("spearmanRho is ±1 on monotone data, 0 crossed, null degenerate") {
    val df = Seq(
      // g=1 perfectly increasing, g=2 perfectly decreasing
      (1L, 1.0, 10L), (1L, 2.0, 20L), (1L, 3.0, 30L),
      (2L, 1.0, 30L), (2L, 2.0, 20L), (2L, 3.0, 10L),
      // g=3: symmetric cross -> rho = 0
      (3L, 1.0, 10L), (3L, 1.0, 20L), (3L, 2.0, 10L), (3L, 2.0, 20L),
      // g=4: x constant -> null (zero variance)
      (4L, 5.0, 1L), (4L, 5.0, 2L))
      .toDF("g", "x", "y")
    val got = Profile.spearmanRho(df, "g", col("x"), col("y"))
      .orderBy("g").as[(Long, Long, Option[Double])].collect()
    assert(got(0) === ((1L, 3L, Some(1.0))))
    assert(got(1) === ((2L, 3L, Some(-1.0))))
    assert(got(2) === ((3L, 4L, Some(0.0))))
    assert(got(3) === ((4L, 2L, None)))
  }
  test("inclusionCheck measures coverage and orphans without asserting") {
    val child = Seq((1L, "a"), (1L, "b"), (2L, "c"), (9L, "d"), (9L, "e"),
      (9L, "f")).toDF("fk", "payload")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Profile.inclusionCheck(child, "fk", parent, "pk", "t").head()
    assert(got.getAs[Long]("n_child_distinct") === 3L)
    assert(got.getAs[Long]("n_child_rows") === 6L)
    assert(got.getAs[Long]("n_orphan_distinct") === 1L)
    assert(got.getAs[Long]("n_orphan_rows") === 3L)
    assert(got.getAs[Long]("worst_orphan_rows") === 3L)
    assert(!got.getAs[Boolean]("included"))
    assert(got.getAs[Long]("coverage_micro") === 666666L)
    // full inclusion
    val ok = Profile.inclusionCheck(
      Seq(1L, 2L).toDF("fk"), "fk", parent, "pk", "ok").head()
    assert(ok.getAs[Boolean]("included")
      && ok.getAs[Long]("coverage_micro") === 1000000L)
  }

  test("saltPlan salts only over-target keys with exact integer ceil") {
    val df = (Seq.fill(2500)("hot") ++ Seq.fill(1000)("warm")
      ++ Seq.fill(10)("cold")).toDF("k")
    val got = Profile.saltPlan(df, "k", targetPerTask = 1000L)
      .orderBy($"k").as[(String, Long, Long)].collect()
    assert(got === Array(("hot", 2500L, 3L)),
      "warm sits exactly AT target (no salt) and cold is under it")
  }

  test("corpusDatasheet composes volumes, diversity, and duplication in one row") {
    val docs = Seq(
      (1L, "alpha beta gamma", "en", "web"),
      (2L, "alpha beta gamma", "en", "web"),   // exact dup of 1
      (3L, "uno dos tres", "es", "books"))
      .toDF("doc_id", "text", "lang", "source")
    val noPairs = Seq.empty[(Long, Long, Double)].toDF("d1", "d2", "jaccard")
    val r = Profile.corpusDatasheet(docs, "doc_id", "text", "lang",
      "source", noPairs).head()
    assert(r.getAs[Long]("n_docs") === 3L)
    assert(r.getAs[Long]("n_langs") === 2L && r.getAs[Long]("n_sources") === 2L)
    assert(r.getAs[Long]("tokens_total") === 9L)
    assert(r.getAs[Long]("n_content_groups") === 2L)
    assert(r.getAs[Long]("n_exact_dups") === 1L)
    assert(r.getAs[Long]("n_near_dup_pairs") === 0L)
    assert(r.getAs[Long]("exact_dup_micro") === 333333L)
  }

  test("groupedCorr recovers +1/-1/null on planted per-group relationships") {
    val df = Seq(
      ("up", 1L, 10L), ("up", 2L, 20L), ("up", 3L, 30L),
      ("down", 1L, 30L), ("down", 2L, 20L), ("down", 3L, 10L),
      ("flat", 1L, 5L), ("flat", 2L, 5L), ("flat", 3L, 5L))
      .toDF("g", "x", "y")
    val got = Profile.groupedCorr(df, col("g"), "x" -> col("x"), "y" -> col("y"))
      .orderBy(col("g")).as[(String, Long, Option[Double])].collect()
    assert(got === Array(
      ("down", 3L, Some(-1.0)),
      ("flat", 3L, None), // zero variance on y -> null, never NaN
      ("up", 3L, Some(1.0))))
  }

  test("fdDiscovery flags exactly the planted dependencies") {
    val df = Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "b", "y"), (4L, "b", "y"))
      .toDF("id", "v", "w")
    val got = Profile.fdDiscovery(df, Seq("id", "v", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("extra"), r.getAs[Boolean]("holds")))).toMap
    assert(got(("id", "v")) === ((0L, true)))  // unique key determines all
    assert(got(("v", "w")) === ((0L, true)))   // planted v -> w
    assert(got(("w", "v")) === ((0L, true)))   // bijective here
    assert(got(("v", "id")) === ((2L, false))) // v cannot determine id
  }

  test("gkLambda is 1 when det predicts dep perfectly, 0 when useless") {
    val det = (Seq.fill(5)(("x", "p")) ++ Seq.fill(5)(("y", "q")))
      .toDF("a", "b")
    val d1 = Profile.gkLambda(det, col("a"), col("b"))
      .orderBy(col("direction")).collect()
    assert(d1.forall(_.getAs[Long]("lambda_micro") === 1000000L))
    // b constant: knowing a reduces nothing AND the margin degenerates.
    val useless = Seq(("x", "p"), ("y", "p"), ("x", "p")).toDF("a", "b")
    val d2 = Profile.gkLambda(useless, col("a"), col("b"))
      .orderBy(col("direction")).collect()
    assert(d2.head.isNullAt(4), "degenerate margin must be null (a_to_b)")
  }

  test("cramersV is 1 on a determined table, ~0 on an independent one") {
    // Fully determined: b = f(a), 2x2, 10 rows each diagonal cell.
    val det = (Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q")))
      .toDF("a", "b")
    val r1 = Profile.cramersV(det, col("a"), col("b")).head()
    // chi2 = n * (10²·1e6/(10·10) + 10²·1e6/(10·10) - 1e6·n)/... s_micro
    //      = 2·1e6 -> chi2_micro = 20·2e6 - 20e6 = 20e6 -> chi2 = 20 = n.
    assert(r1.getAs[Long]("chi2_micro") === 20000000L)
    assert(r1.getAs[Double]("cramers_v") === 1.0)
    // Independent: every (a, b) cell equally filled.
    val ind = (for { a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val r2 = Profile.cramersV(ind, col("a"), col("b")).head()
    assert(r2.getAs[Long]("chi2_micro") === 0L)
    assert(r2.getAs[Double]("cramers_v") === 0.0)
    // Degenerate: single category on one side -> null, never NaN.
    val deg = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    assert(Profile.cramersV(deg, col("a"), col("b"))
      .head().isNullAt(4))
  }

  test("profileDiff reports per-side counts, nulls, distincts in one pass") {
    val df = Seq(
      (1L, Some("a"), "x"), (2L, Some("b"), "x"), (3L, None, "x"),
      (4L, Some("a"), "y"), (5L, Some("a"), "y"))
      .toDF("id", "cat", "side")
    val got = Profile.profileDiff(df, col("side") === "x", Seq("cat", "id"))
      .orderBy(col("column"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got === Array(
      // cat: side A has {a, b, null}; side B has {a, a}
      ("cat", 3L, 1L, 2L, 2L, 0L, 1L, -1L),
      ("id", 3L, 0L, 3L, 2L, 0L, 2L, -1L)))
  }

  test("anovaTable yields the textbook mean squares and F") {
    // a = {1,2,3}, b = {5,6,7}: SSB = 240000 cents², SSW = 40000 ->
    // MSB = 240000/1, MSW = 40000/4 = 10000, F = 24 exactly.
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 6.0), ("b", 7.0)).toDF("g", "v")
    val got = Profile.anovaTable(df, col("g"), col("v"))
      .select($"k", $"n", $"ms_between", $"ms_within", $"f_micro")
      .as[(Long, Long, Long, Long, Option[Long])].collect()
    assert(got === Array((2L, 6L, 240000L, 10000L, Some(24000000L))))
  }

  test("anovaTable on identical groups clamps MSB to zero, F to zero") {
    val df = Seq(("a", 2.0), ("a", 4.0), ("b", 2.0), ("b", 4.0))
      .toDF("g", "v")
    val got = Profile.anovaTable(df, col("g"), col("v"))
      .select($"ms_between", $"f_micro")
      .as[(Long, Option[Long])].collect()
    assert(got === Array((0L, Some(0L))))
  }

  test("kruskalWallis matches the hand-worked H, with and without ties") {
    // Separated groups A={1,2} B={3,4} C={5,6}: R2 = 6/14/22,
    // H = 12/(6·7)·(1.5²+3.5²+5.5²... ) → classic value 32/7 ≈ 4.571428.
    val sep = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0),
      ("C", 5.0), ("C", 6.0)).toDF("g", "v")
    val s = Profile.kruskalWallis(sep, "g", col("v"))
      .as[(Long, Long, Long, Option[Long], Option[Long])].head()
    assert(s === ((6L, 3L, 0L, Some(4571428L), Some(4571428L))))
    // Full ties within values: A={1,1} B={2,2} → H=2.4, C=0.8 → H/C=3.
    val tied = Seq(("A", 1.0), ("A", 1.0), ("B", 2.0), ("B", 2.0))
      .toDF("g", "v")
    val t = Profile.kruskalWallis(tied, "g", col("v"))
      .as[(Long, Long, Long, Option[Long], Option[Long])].head()
    assert(t === ((4L, 2L, 12L, Some(2400000L), Some(3000000L))))
    // Everything tied: C = 0 → adjusted H is null, raw H is 0.
    val allTied = Seq(("A", 1.0), ("B", 1.0)).toDF("g", "v")
    val a = Profile.kruskalWallis(allTied, "g", col("v"))
      .as[(Long, Long, Long, Option[Long], Option[Long])].head()
    assert(a === ((2L, 2L, 6L, Some(0L), None)))
  }

  test("kruskalWallis unquantized path equals the windowed path") {
    val df = (1 to 400).map { i =>
      (s"g${i % 3}", math.sin(i.toDouble) * 1000.0)
    }.toDF("g", "v")
    val a = Profile.kruskalWallis(df, "g", col("v"), quantized = true)
      .collect().toSeq
    val b = Profile.kruskalWallis(df, "g", col("v"), quantized = false)
      .collect().toSeq
    assert(a === b)
  }

  test("mcnemar counts discordant cells, clamps b=c, nulls b+c=0") {
    val df = Seq(
      // g1: b (A-only) = 3, c (B-only) = 1 → (|2|−1)²·1e6/4 = 250000
      ("g1", true, false), ("g1", true, false), ("g1", true, false),
      ("g1", false, true), ("g1", true, true), ("g1", false, false),
      // g2: b = c = 1 → clamp (|0|−1)₊ = 0 → statistic 0
      ("g2", true, false), ("g2", false, true),
      // g3: perfectly concordant → b+c = 0 → null
      ("g3", true, true), ("g3", false, false)).toDF("g", "a", "b2")
    val got = Profile.mcnemar(df, "g", col("a"), col("b2"))
      .orderBy("g")
      .as[(String, Long, Long, Long, Option[Long])].collect()
    assert(got === Array(
      ("g1", 6L, 3L, 1L, Some(250000L)),
      ("g2", 2L, 1L, 1L, Some(0L)),
      ("g3", 2L, 0L, 0L, None)))
  }

  test("conformalIntervals equals a brute fold over the same hash split") {
    val rnd = new scala.util.Random(364)
    val rows = (1L to 400L).map { k =>
      val g = s"g${k % 3}"
      (g, k, (k % 3) * 1000L + rnd.nextInt(500).toLong)
    }
    val df = rows.toDF("g", "k", "y")
    val alpha = 200000L // 80% nominal
    val got = Profile.conformalIntervals(df, col("g"), col("k"), col("y"),
        alphaMicro = alpha)
      .orderBy("g")
      .as[(String, Long, Long, Long, Long, Option[Long], Long, Long, Long)]
      .collect()

    // Independent brute fold, reusing only the operator's split column.
    val splits = df.select(col("g"), col("k"), col("y"),
        graft.operators.PipelineOps.splitAssign(col("k"),
          Seq("train" -> 128, "cal" -> 64, "test" -> 64)).as("split"))
      .as[(String, Long, Long, String)].collect()
    val expect = splits.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (g, rs) =>
        val tr = rs.filter(_._4 == "train").map(_._3)
        val cal = rs.filter(_._4 == "cal").map(_._3)
        val te = rs.filter(_._4 == "test").map(_._3)
        if (tr.isEmpty || cal.isEmpty || te.isEmpty) None
        else {
          val yhat = tr.sum / tr.length // nonneg here, floor div OK
          val rsCal = cal.map(y => math.abs(y - yhat)).sorted
          val k = ((cal.length + 1) * (1000000L - alpha) + 999999L) / 1000000L
          val radius = if (k > cal.length) None else Some(rsCal(k.toInt - 1))
          val covered = te.count(y => radius.forall(math.abs(y - yhat) <= _))
          Some((g, tr.length.toLong, yhat, cal.length.toLong, k, radius,
            te.length.toLong, covered.toLong,
            1000000L * covered / te.length))
        }
    }
    assert(got.toSeq === expect)
    // Finite-sample conformal coverage should land near nominal.
    got.foreach(r => assert(r._9 >= 700000L,
      s"coverage far below the 80% nominal: $r"))

    // alpha so tight that k > n_cal: infinite interval, full coverage.
    val inf = Profile.conformalIntervals(df, col("g"), col("k"), col("y"),
        alphaMicro = 1L)
      .as[(String, Long, Long, Long, Long, Option[Long], Long, Long, Long)]
      .collect()
    assert(inf.nonEmpty && inf.forall(r =>
      r._5 == r._4 + 1 && r._6.isEmpty && r._9 == 1000000L))
  }

  test("cochranArmitage recovers the exact z of a clean linear trend") {
    // Tiers 1/2/3, n=2 each, successes 0/1/2 → z² = 4 exactly, z = 2.
    val df = Seq((1L, false), (1L, false), (2L, true), (2L, false),
      (3L, true), (3L, true)).toDF("w", "y")
    val got = Profile.cochranArmitage(df, col("w"), col("y"))
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(got === ((6L, 3L, 3L, 12L, Some(2.0))))
    // All successes → zero variance → null z.
    val flat = Seq((1L, true), (2L, true)).toDF("w", "y")
    val f = Profile.cochranArmitage(flat, col("w"), col("y"))
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(f._5 === None)
  }

  test("brownForsythe flags a spread difference the mean F misses") {
    // Same median/mean per group, radically different spreads: the
    // mean ANOVA sees nothing (F ~ 0), Brown–Forsythe fires.
    val a = Seq(98.0, 99.0, 100.0, 101.0, 102.0).map(("a", _))
    val b = Seq(40.0, 70.0, 100.0, 130.0, 160.0).map(("b", _))
    val df = (a ++ b).toDF("g", "v")
    val got = Profile.brownForsythe(df, col("g"), col("v"))
      .as[(Long, Long, Long, Long, Option[Long])].head()
    // Brute integer mirror (lower median, exact cents, the shared
    // ANOVA algebra with truncating division — all values nonneg here).
    val cents = Map("a" -> a.map(r => math.floor(r._2 * 100).toLong),
      "b" -> b.map(r => math.floor(r._2 * 100).toLong))
    val devs = cents.map { case (g, cs) =>
      val med = cs.sorted.apply(((cs.size + 1) / 2 - 1))
      g -> cs.map(c => math.abs(c - med))
    }
    val k = devs.size.toLong
    val n = devs.values.map(_.size).sum.toLong
    val s = devs.values.flatten.sum
    val q = devs.values.flatten.map(c => BigInt(c) * c).sum
    val t = devs.values.map(cs => BigInt(cs.sum) * cs.sum / cs.size).sum
    val ssb = ((BigInt(n) * t - BigInt(s) * s) / n).max(0)
    val sst = (BigInt(n) * q - BigInt(s) * s) / n
    val msb = (ssb / (k - 1)).toLong
    val msw = ((sst - ssb) / (n - k)).toLong
    val f = (BigInt(msb) * 1000000L / math.max(msw, 1L)).toLong
    assert(got === ((k, n, msb, msw, Some(f))))
    assert(f > 2000000L, s"spread difference must drive F well above 1: $f")
    val meanF = Profile.anovaTable(df, col("g"), col("v"))
      .as[(Long, Long, Long, Long, Option[Long])].head()._5.get
    assert(meanF < f / 100,
      s"the mean F ($meanF) must be blind to the pure spread shift ($f)")
  }

  test("conformalFdrOutliers selects planted drift and equals a brute BH fold") {
    // Reference cohort: 600 values near 1000; test cohort: 20 inliers
    // from the same band plus 6 planted far outliers. (Conformal p's
    // are floored at 1/(n_cal + 1), so BH detection needs a test cohort
    // commensurate with the calibration size — m·p_min ≤ k*·α.) The
    // 10%-FDR screen must select every planted outlier; FDR permits
    // ~α·k* false inlier selections, so allow at most one.
    val rnd = new scala.util.Random(373)
    val ref = (1L to 600L).map(k => ("g1", k, 1000L + rnd.nextInt(101) - 50, true))
    val inl = (601L to 620L).map(k => ("g1", k, 1000L + rnd.nextInt(101) - 50, false))
    val out = (621L to 626L).map(k => ("g1", k, 5000L + rnd.nextInt(100), false))
    val df = (ref ++ inl ++ out).toDF("g", "k", "y", "ref")
    val got = Profile.conformalFdrOutliers(df, col("g"), col("k"), col("y"),
        col("ref"), alphaMicro = 100000L)
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq
    val sel = got.filter(_._8).map(_._2).toSet
    assert((621L to 626L).forall(sel), s"planted outliers not all selected: $sel")
    assert(sel.count(_ <= 620L) <= 1, s"false selections among inliers: $sel")

    // Brute mirror on a random multi-group instance, reusing only the
    // operator's split column: p = (1 + #{cal >= r}) / (n_cal + 1), BH
    // with exact cross-products, ties to the lower id.
    val rows = (1L to 500L).map { k =>
      (s"g${k % 2}", k, rnd.nextInt(2000).toLong, rnd.nextInt(4) != 0)
    }
    val rdf = rows.toDF("g", "k", "y", "ref")
    val alpha = 200000L
    val gotR = Profile.conformalFdrOutliers(rdf, col("g"), col("k"),
        col("y"), col("ref"), alphaMicro = alpha)
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq.sortBy(r => (r._1, r._6))
    val splits = rdf.filter(col("ref"))
      .select(col("g"), col("k"),
        graft.operators.PipelineOps.splitAssign(col("k"),
          Seq("train" -> 192, "cal" -> 64)).as("split"))
      .as[(String, Long, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val expect = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (g, rs) =>
        def split(r: (String, Long, Long, Boolean)) =
          if (!r._4) "test" else splits((g, r._2))
        val tr = rs.filter(split(_) == "train").map(_._3)
        val cal = rs.filter(split(_) == "cal").map(_._3)
        val te = rs.filter(split(_) == "test").map(r => (r._2, r._3))
        if (tr.isEmpty || te.isEmpty) Nil
        else {
          val yhat = tr.sum / tr.length
          val rCal = cal.map(y => math.abs(y - yhat))
          val scored = te.map { case (id, y) =>
            val r = math.abs(y - yhat)
            val p = (1L + rCal.count(_ >= r)) * 1000000L / (cal.length + 1)
            (id, r, p)
          }
          val m = scored.length.toLong
          val ranked = scored.sortBy(s => (s._3, s._1)).zipWithIndex
            .map { case ((id, r, p), i) => (id, r, p, (i + 1).toLong) }
          val kStar = ranked.collect {
            case (_, _, p, rk) if p * m <= rk * alpha => rk
          }.sorted.lastOption
          ranked.map { case (id, r, p, rk) =>
            (g, id, r, cal.length.toLong, p, rk, m,
              kStar.exists(rk <= _))
          }
        }
    }
    assert(gotR === expect)
  }

}
