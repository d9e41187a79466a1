package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish skew: key k appears ~200/k times — heavy head, long tail.
  private def skewed = (1 to 40).flatMap(k => Seq.fill(200 / k)(k.toLong))
    .toDF("key")

  test("CMS estimates dominate exact counts on every key (one-sided error)") {
    val cells = Sketches.cmsCells(skewed, "key", depth = 4, width = 32)
    val exact = skewed.groupBy($"key").agg(count(lit(1)).as("n_exact"))
    val got = exact.join(
        Sketches.cmsEstimate(cells, exact, "key", 4, 32), Seq("key"))
      .select($"key", $"n_exact", $"n_cms")
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (k, ex, est) =>
      assert(est >= ex, s"CMS must never under-count (key $k: $est < $ex)")
    }
    // width 32 on 40 keys: total inflation is bounded by collisions, and
    // the heaviest key's estimate is within one tail-mass of exact.
    val (_, ex0, est0) = got.maxBy(_._2)
    assert(est0 - ex0 <= skewed.count(), "inflation cannot exceed N")
  }

  test("CMS cells are additive (mergeable) and partitioning-invariant") {
    val all = Sketches.cmsCells(skewed, "key", 4, 32)
      .orderBy($"d", $"bucket").as[(Int, Long, Long)].collect()
    val repart = Sketches.cmsCells(skewed.repartition(13), "key", 4, 32)
      .orderBy($"d", $"bucket").as[(Int, Long, Long)].collect()
    assert(all === repart)
    // Sketch of a union == sum of the parts' cells.
    val (a, b) = (skewed.filter($"key" <= 10), skewed.filter($"key" > 10))
    val merged = Sketches.cmsCells(a, "key", 4, 32)
      .union(Sketches.cmsCells(b, "key", 4, 32))
      .groupBy($"d", $"bucket").agg(sum($"c").as("c"))
      .orderBy($"d", $"bucket").as[(Int, Long, Long)].collect()
    assert(merged === all)
  }

  test("HLL registers are max-mergeable and the raw estimate lands in the envelope") {
    val n = 5000L
    val df = spark.range(0, n).select(($"id" * 7919L + 13L).as("key"))
    val m = 64
    val regs = Sketches.hllRegisters(df, "key", m)
      .orderBy($"j").as[(Long, Long)].collect()
    val repart = Sketches.hllRegisters(df.repartition(11), "key", m)
      .orderBy($"j").as[(Long, Long)].collect()
    assert(regs === repart)
    // max-merge of two halves == registers of the whole
    val (a, b) = (df.filter($"key" % 2 === 0), df.filter($"key" % 2 =!= 0))
    val merged = Sketches.hllRegisters(a, "key", m)
      .union(Sketches.hllRegisters(b, "key", m))
      .groupBy($"j").agg(max($"mj").as("mj"))
      .orderBy($"j").as[(Long, Long)].collect()
    assert(merged === regs)
    // raw-regime estimate: ±3σ = 3·1.04/√64 = 39%
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df, "key", m), m)
      .as[Long].head()
    assert(math.abs(est - n).toDouble / n < 0.39,
      s"HLL estimate $est too far from $n")
  }

  test("HLL small-range correction beats the raw estimate on tiny cardinalities") {
    val m = 64
    // 20 distinct keys against 64 registers: V ≈ 64·e^(-20/64) > 0 and
    // the raw harmonic estimate is known-biased here.
    val tiny = spark.range(0, 2000).select(($"id" % 20 * 7919L + 13L).as("key"))
    val est = Sketches.hllEstimate(Sketches.hllRegisters(tiny, "key", m), m)
      .as[Long].head()
    assert(math.abs(est - 20L) <= 5,
      s"linear counting must land near 20, got $est")
    // The raw harmonic estimate (reconstructed) must be WORSE — the
    // correction genuinely replaces a biased number.
    val regs = Sketches.hllRegisters(tiny, "key", m)
      .as[(Long, Long)].collect()
    val s = regs.map { case (_, mj) => 1L << (40 - mj).toInt }.sum
    val raw = math.floor(0.709 * 1099511627776.0 * m * m / s).toLong
    assert(math.abs(raw - 20L) > math.abs(est - 20L),
      s"raw=$raw should be further from 20 than corrected=$est")
    // Raw-regime inputs are untouched by the correction branch.
    val big = spark.range(0, 5000).select(($"id" * 7919L + 13L).as("key"))
    val bigRegs = Sketches.hllRegisters(big, "key", m).as[(Long, Long)].collect()
    val bigS = bigRegs.map { case (_, mj) => 1L << (40 - mj).toInt }.sum
    val bigRaw = math.floor(0.709 * 1099511627776.0 * m * m / bigS).toLong
    val bigEst = Sketches.hllEstimate(Sketches.hllRegisters(big, "key", m), m)
      .as[Long].head()
    assert(bigEst === bigRaw, "above the corrected regime the raw estimate stands")
  }

  test("ddBins are additive and the quantile audit stays inside the bound") {
    val xs = spark.range(1, 5001).select(($"id" * 37L % 99991L + 1L).as("v"))
    val whole = Sketches.ddBins(xs, $"v", subBits = 4)
      .orderBy($"e", $"sub").as[(Long, Long, Long, Long)].collect()
    // bins(A) + bins(B) == bins(A ∪ B): the mergeability law.
    val (a, b) = (xs.filter($"v" % 2 === 0), xs.filter($"v" % 2 =!= 0))
    val summed = Sketches.ddBins(a, $"v", 4)
      .unionByName(Sketches.ddBins(b, $"v", 4))
      .groupBy($"e", $"sub", $"rep").agg(sum($"c").as("c"))
      .select($"e", $"sub", $"rep", $"c")
      .orderBy($"e", $"sub").as[(Long, Long, Long, Long)].collect()
    assert(summed === whole)
    // Partitioning-independence.
    val repart = Sketches.ddBins(xs.repartition(13), $"v", 4)
      .orderBy($"e", $"sub").as[(Long, Long, Long, Long)].collect()
    assert(repart === whole)
    // Every requested percentile lands inside the sketch's error bound.
    val audit = Sketches.ddQuantileAudit(xs, $"v", 4, Seq(10, 50, 90, 99))
      .head()
    Seq("p10_ok", "p50_ok", "p90_ok", "p99_ok").foreach { c =>
      assert(audit.getAs[Boolean](c), s"$c must hold: $audit")
    }
    // rep is a LOWER bound of its bin: estimate <= exact always.
    Seq(10, 50, 90, 99).foreach { p =>
      assert(audit.getAs[Long](s"p${p}_est") <= audit.getAs[Long](s"p${p}_exact"))
    }
  }

  test("hllColumnProfile reads every column's cardinality from one register pass") {
    val df = spark.range(0, 3000).select(
      ($"id" % 7).cast("string").as("status"),
      $"id".as("ident"),
      ($"id" % 400).as("bucket"))
    val got = Sketches.hllColumnProfile(df, Seq("status", "ident", "bucket"), 64)
      .orderBy($"col_name")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq("bucket", "ident", "status"))
    got.foreach { case (name, nn, exact, est, _) =>
      assert(nn === 3000L)
      val want = Map("status" -> 7L, "ident" -> 3000L, "bucket" -> 400L)(name)
      assert(exact === want, s"$name exact")
      // corrected small-range columns are near-exact; the id column gets
      // the raw-regime 3σ envelope (3·1.04/√64 = 39%)
      assert(math.abs(est - want).toDouble / want < 0.39,
        s"$name est=$est want~$want")
    }
    // the tiny-cardinality column reads near-exactly under linear
    // counting (a register collision among the 7 values can shave one)
    assert(math.abs(got.find(_._1 == "status").get._4 - 7L) <= 1L)
  }

  test("star contraction labels a long chain (diameter stress) with its min") {
    // A 33-node chain: min-label propagation needs 32 rounds; the
    // alternating star algorithm converges in a handful.
    val chain = (1L to 32L).map(i => (i, i + 1)).toDF("u", "v")
    val got = Graph.connectedComponentsStars(chain, "u", "v", rounds = 6)
      .as[(Long, Long, Boolean)].collect()
    assert(got.length === 33)
    assert(got.forall(_._3), "6 star rounds must reach the chain fixpoint")
    assert(got.forall(_._2 === 1L), "every chain node joins component 1")
    // Truncated run reports non-convergence instead of lying.
    val cut = Graph.connectedComponentsStars(chain, "u", "v", rounds = 1)
      .as[(Long, Long, Boolean)].collect()
    assert(cut.forall(!_._3), "round 1 cannot finish a 33-node chain")
  }

  test("star contraction agrees with min-label propagation on a multi-component graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 9L), (9L, 8L), (20L, 21L),
      (21L, 20L), (5L, 4L)).toDF("d1", "d2")
    val stars = Graph.connectedComponentsStars(edges, "d1", "d2", rounds = 4)
      .select($"node_id", $"component")
      .orderBy($"node_id").as[(Long, Long)].collect()
    val prop = Dedup.dedupClusters(edges, "d1", "d2")
      .orderBy($"doc_id").as[(Long, Long)].collect()
    assert(stars === prop)
  }

  test("grouped HLL registers max-merge to exactly the ungrouped sketch") {
    val df = (1 to 500).map(k => (if (k % 3 == 0) "a" else "b", k.toLong))
      .toDF("g", "key")
    val merged = Sketches.hllRegistersBy(df, "g", "key", 64)
      .groupBy($"j").agg(max($"mj").as("mj"))
      .orderBy($"j").as[(Long, Long)].collect()
    val direct = Sketches.hllRegisters(df, "key", 64)
      .orderBy($"j").as[(Long, Long)].collect()
    assert(merged === direct)
    // Every group gets its full 64-register spine (empties included).
    val spine = Sketches.hllRegistersBy(df, "g", "key", 64)
      .groupBy($"g").count().as[(String, Long)].collect().toMap
    assert(spine === Map("a" -> 64L, "b" -> 64L))
  }

  test("cmsJoinSize upper-bounds the true join cardinality and tightens with width") {
    val a = (1 to 30).flatMap(k => Seq.fill(3)(k.toLong)).toDF("key")
    val b = (20 to 50).flatMap(k => Seq.fill(2)(k.toLong)).toDF("key")
    // true |A join B| = overlap keys 20..30 -> 11 keys * 3 * 2 = 66.
    def est(w: Int): Long = Sketches.cmsJoinSize(
      Sketches.cmsCells(a, "key", 4, w),
      Sketches.cmsCells(b, "key", 4, w)).as[Long].head()
    assert(est(16) >= 66L, "estimate is one-sided")
    assert(est(256) >= 66L)
    assert(est(256) <= est(16), "wider sketch cannot be looser")
  }

  test("slidingDistinct exact counts the trailing window; sketch stays in envelope") {
    // Day d carries keys d*100 .. d*100+199: consecutive days share 100
    // keys, so 3-day windows hold min(d+1, 3)*100 + 100 distinct keys -
    // large enough for HLL(64)'s raw-estimate regime (n >~ 2.5m).
    val rows = for (d <- 0 until 6; k <- 0 until 200)
      yield (java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(d * 86400L + 10)), d * 100L + k)
    val df = rows.toDF("ts", "k")
    val got = Sketches.slidingDistinct(df, "ts", "k", windowDays = 3, m = 64)
      .orderBy($"day").as[(Long, Long, Long, Long)].collect()
    val exact = got.map(_._2)
    assert(exact === Array(200L, 300L, 400L, 400L, 400L, 400L))
    got.foreach { case (_, ex, est, err) =>
      assert(est > 0 && err === math.abs(est - ex) * 1000000L / ex)
      // near the raw-regime boundary (n ~ 2.5m) bias is still settling;
      // the tight ±1.04/sqrt(m) envelope is pinned by the q168 spec in
      // the deep-raw regime - here pin sanity, exactness of the err
      // column, and that merging never loses keys entirely.
      assert(err < 600000L, s"register-merged estimate way off: $err")
    }
  }

  test("bloomAudit never misses a member and measures false positives") {
    val members = (1L to 50L).toDF("k")
    val probes = (1L to 500L).toDF("k")
    val got = Sketches.bloomAudit(members, probes, "k",
        numHashes = 3, mBits = 256)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    val (bits, nProbes, nMembers, nFlagged, nFalse, nMissed, fpr) = got
    assert(nMissed === 0L, "a Bloom filter must have no false negatives")
    assert(nProbes === 500L && nMembers === 50L)
    assert(nFlagged === nMembers + nFalse)
    assert(bits > 0L && bits <= 150L) // <= k * |members|, dedup'd
    assert(fpr === nFalse * 1000000L / (nProbes - nMembers))
    // 256 bits at ~44% fill, k=3: expect a visibly nonzero FPR.
    assert(nFalse > 0L)
  }

  test("bloomBits of a union is the union of the bit sets (mergeable)") {
    val a = (1L to 40L).toDF("k")
    val b = (30L to 80L).toDF("k")
    val merged = Sketches.bloomBits(a.union(b), "k", 3, 512)
    val unioned = Sketches.bloomBits(a, "k", 3, 512)
      .union(Sketches.bloomBits(b, "k", 3, 512)).distinct()
    assert(merged.exceptAll(unioned).count() === 0L)
    assert(unioned.exceptAll(merged).count() === 0L)
  }
  test("ddDrift reads the KS gap from two sketches: zero for identical, large for shifted") {
    val a = spark.range(1, 4001).select(($"id" % 500L + 1L).as("v"))
    // Identical distributions -> gap 0 at bin resolution.
    val same = Sketches.ddDrift(
      Sketches.ddBins(a, $"v", 4), Sketches.ddBins(a, $"v", 4)).head()
    assert(same.getAs[Long]("ks_micro") === 0L)
    assert(same.getAs[Long]("n_a") === 4000L && same.getAs[Long]("n_b") === 4000L)
    // A 64x magnitude shift separates the CDFs almost completely.
    val b = spark.range(1, 4001).select(($"id" % 500L + 1L) * 64L as "v")
    val far = Sketches.ddDrift(
      Sketches.ddBins(a, $"v", 4), Sketches.ddBins(b, $"v", 4)).head()
    assert(far.getAs[Long]("ks_micro") > 900000L,
      s"shifted populations must show near-total drift: $far")
    // The sketch KS can never exceed the exact KS by construction
    // (bin-resolution merge only absorbs gaps); sanity: <= 1e6.
    assert(far.getAs[Long]("ks_micro") <= 1000000L)
  }

  test("ddQuantilesBy estimates hold the sketch error bound per group") {
    import spark.implicits._
    val s2 = 16L
    // Two groups with very different scales; exact quantiles computed
    // sequentially, estimates must sit within the bin-width bound.
    val rows = (1 to 2000).map(i => ("lo", (i % 97 + 1).toLong)) ++
      (1 to 2000).map(i => ("hi", (i.toLong * 37) % 99991L + 1L))
    val got = Sketches.ddQuantilesBy(rows.toDF("g", "v"), col("g"), col("v"),
        subBits = 4, ps = Seq(50, 99))
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap
    def exact(g: String, p: Int): Long = {
      val vs = rows.filter(_._1 == g).map(_._2).sorted
      vs(((vs.size * p + 99) / 100) - 1)
    }
    for (g <- Seq("lo", "hi"); p <- Seq(50, 99)) {
      val est = got((g, p.toLong))
      val ex = exact(g, p)
      assert(est <= ex && (ex - est) * s2 <= est + s2,
        s"$g p$p: est $est must bracket exact $ex within the bin bound")
    }
  }

  test("embeddingAudit counts zero-norm rows and exact micro norms") {
    import spark.implicits._
    val rows = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(0.0f, 0.0f)), (1, Seq(0.5f, 0.5f)))
      .toDF("label", "embedding")
    val got = Similarity.embeddingAudit(rows, col("label"), col("embedding"))
      .orderBy(col("g")).as[(Int, Long, Long, Long, Long, Long)].collect()
    // label 0: norms 1.0 and 0.0 -> min 0, max 1e6, mean 5e5, one zero.
    assert(got(0) === ((0, 2L, 1L, 0L, 1000000L, 500000L)))
    // label 1: norm 0.5 -> 500000 everywhere.
    assert(got(1) === ((1, 1L, 0L, 500000L, 500000L, 500000L)))
  }

  test("minhash segment signatures obey the union-min merge law") {
    val a = (1L to 40L).map(("a", _))
    val b = (25L to 70L).map(("b", _))
    val u = (a ++ b).map { case (_, m) => ("u", m) }
    val df = (a ++ b ++ u).toDF("seg", "m")
    val sig = Sketches.minhashSegments(df, col("seg"), col("m"), 32)
      .as[(String, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(x => x._2 -> x._3).toMap).toMap
    // signature of the union == element-wise min of the signatures
    (0 until 32).foreach { d =>
      assert(sig("u")(d) === math.min(sig("a")(d), sig("b")(d)))
    }
  }

  test("audienceSketchReport is exact on identical segments") {
    val df = ((1L to 50L).map(("x", _)) ++ (1L to 50L).map(("y", _)))
      .toDF("seg", "m")
    val got = Sketches.audienceSketchReport(df, col("seg"), col("m"), 64)
      .select($"n_matches", $"est_micro", $"exact_micro", $"err_micro")
      .as[(Long, Long, Long, Long)].collect()
    assert(got === Array((64L, 1000000L, 1000000L, 0L)))
  }

}
