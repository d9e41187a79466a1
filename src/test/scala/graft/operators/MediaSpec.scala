package graft.operators

import graft.SparkSpec
import graft.operators.Media.{decode => mediaDecode, _}

class MediaSpec extends SparkSpec {
  import spark.implicits._

  test("decode preserves row count and derives deterministic metadata") {
    val media = mediaTable(spark, sf)
    val meta = mediaDecode(media)
    assert(meta.count() === media.count())
    // Video rows are REAL frame-by-frame GIF decodes.
    val v = meta.filter($"doc_id" === 3).head()
    assert(v.format === "gif")
    assert(v.n_bytes % (v.width.toLong * v.height) === 0,
      "decoded payload must be a whole number of w*h frames")
    // Audio rows are REAL javax.sound decodes of the synthesized WAV.
    val a = meta.filter($"doc_id" === 1).head()
    assert(a.format === "wav")
    assert(a.width === 1 && a.height === 8, "mono 8-bit PCM header fields")
    // Image rows are REAL ImageIO decodes of the synthesized PNG.
    val i = meta.filter($"doc_id" === 0).head()
    assert(i.format === "png")
    assert(i.n_bytes === i.width.toLong * i.height)
  }

  test("synthWav round-trips through the real WAV decoder bit-exactly") {
    // 77 chars → 78 samples of (docId + i) % 256 at 8 kHz mono 8-bit.
    val docId = 33L
    val bytes = MediaCodec.synthWav(docId, nChars = 77L)
    assert(MediaCodec.isWav(bytes), "container must carry the RIFF magic")
    assert(bytes.length > 78, "a real WAV wraps the PCM in a RIFF header")
    val m = MediaCodec.decodeMeta(MediaRow(docId, "audio", bytes))
    assert(m.format === "wav")
    assert(m.n_bytes === 78L, "decoded frame count comes from the header")
    val s = (0 until 78).map(i => (docId + i) % 256).sum
    assert(m.mean_byte_micro === 1000000L * s / 78L)
  }

  test("synthPng round-trips through the real PNG decoder bit-exactly") {
    // 77 chars → 14×30 gradient, pixel(x,·) = (docId + x) % 256. The
    // decode must recover the generative dims and the exact integer
    // pixel mean — only a genuine lossless encode+decode does that.
    val docId = 250L
    val bytes = MediaCodec.synthPng(docId, nChars = 77L)
    assert(MediaCodec.isPng(bytes), "container must carry the PNG magic")
    val m = MediaCodec.decodeMeta(MediaRow(docId, "image", bytes))
    assert(m.width === 14 && m.height === 30)
    val sx = (0 until 14).map(x => (docId + x) % 256).sum
    assert(m.mean_byte_micro === 1000000L * (30L * sx) / (14L * 30L))
    // Feature histogram walks the decoded raster: bins must hold exactly
    // the gradient's pixel population, L1-normalized.
    val f = MediaCodec.extractFeatures(MediaRow(docId, "image", bytes))
    val expected = (0 until 14).map(x => ((docId + x) % 256).toInt / 16)
      .groupBy(identity).view.mapValues(_.size * 30.0 / (14 * 30)).toMap
    (0 until 16).foreach { b =>
      assert(math.abs(f.features(b) - expected.getOrElse(b, 0.0)) < 1e-12)
    }
  }

  test("synthGif round-trips every frame through the real GIF decoder bit-exactly") {
    // 77 chars → 6 frames of 14×6, frame f pixel(x,·) = (docId+f+x) % 256.
    val docId = 251L
    val bytes = MediaCodec.synthGif(docId, nChars = 77L)
    assert(MediaCodec.isGif(bytes), "container must carry the GIF8 magic")
    val (w, h, nF) = (14, 6, 6)
    val m = MediaCodec.decodeMeta(MediaRow(docId, "video", bytes))
    assert(m.format === "gif")
    assert(m.width === w && m.height === h)
    assert(m.n_bytes === w.toLong * h * nF,
      "frame count must come from the decoded sequence")
    val s = (0 until nF).map(f =>
      h.toLong * (0 until w).map(x => (docId + f + x) % 256).sum).sum
    assert(m.mean_byte_micro === 1000000L * s / (w.toLong * h * nF))
    // Frame sampling keeps indices 0 and 4 of the 6 decoded frames, each
    // emitted as its w*h decoded grayscale pixels.
    val frames = MediaCodec.sampleFrames(MediaRow(docId, "video", bytes), 32, 4)
    assert(frames.map(_.frame_idx) === Seq(0, 4))
    frames.foreach { fr =>
      assert(fr.media.length === w * h)
      // pixel (x, 0) of frame f is (docId + f + x) % 256
      (0 until w).foreach { x =>
        assert((fr.media(x) & 0xff) === ((docId + fr.frame_idx + x) % 256).toInt)
      }
    }
  }

  test("decodeMeta falls back to the byte stub when the magic is absent") {
    val bytes = "not a png at all".getBytes("UTF-8")
    val m = MediaCodec.decodeMeta(MediaRow(9L, "image", bytes))
    assert(m.width === 1 + bytes.length % 64)
    assert(m.n_bytes === bytes.length.toLong)
  }

  test("features are L1-normalized 16-bin histograms") {
    val f = features(mediaTable(spark, sf)).head()
    assert(f.dim === 16 && f.features.length === 16)
    assert(math.abs(f.features.sum - 1.0) < 1e-9)
  }

  test("frameSample keeps every k-th fixed-size frame") {
    val one = mediaTable(spark, sf).filter($"doc_id" === 1)
    val bytes = one.head().media.length
    val frames = frameSample(one, 32, 4).collect()
    val totalFrames = (bytes + 31) / 32
    assert(frames.length === (totalFrames + 3) / 4)
    assert(frames.forall(_.media.length <= 32))
  }

  test("clampBytes truncates or pads an opaque payload to the byte budget") {
    val m = MediaRow(7L, "raw", Array[Byte](1, 2, 3, 4, 5))
    assert(MediaCodec.clampBytes(m, 3).media.toSeq === Seq[Byte](1, 2, 3))
    assert(MediaCodec.clampBytes(m, 8).media.length === 8)
  }

  test("resizeImage re-encodes a real PNG at the target resolution") {
    // A genuine 16x12 PNG goes in; a genuine 8x6 PNG must come out.
    val m = MediaRow(2L, "image", MediaCodec.synthPng(2L, 15L)) // w=16,h=12
    val r = MediaCodec.resizeImage(m, 8, 6)
    assert(MediaCodec.isPng(r.media))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.media))
    assert(img.getWidth === 8 && img.getHeight === 6)
  }

  test("resizeImage bilinear interpolation preserves constant and order") {
    // Constant image: every interpolated pixel equals the constant.
    val w = 16; val h = 16
    val const = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      const.getRaster.setSample(x, y, 0, 99)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(const, "png", out)
    val rc = MediaCodec.resizeImage(
      MediaRow(1L, "image", out.toByteArray), 4, 4)
    val ri = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rc.media))
    for (y <- 0 until 4; x <- 0 until 4)
      assert(ri.getRaster.getSample(x, y, 0) === 99)

    // Gradient image (pixel(x,·) = (docId + x) % 256 with x < 32 so it is
    // monotone in x): downscaling must keep the left half darker.
    val g = MediaRow(0L, "image", MediaCodec.synthPng(0L, 31L)) // w=32,h=32
    val rg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(
        MediaCodec.resizeImage(g, 8, 8).media))
    def mean(x0: Int, x1: Int): Double =
      (for (y <- 0 until 8; x <- x0 until x1)
        yield rg.getRaster.getSample(x, y, 0)).sum / (8.0 * (x1 - x0))
    assert(mean(0, 4) < mean(4, 8))
  }

  test("resizeImage passes non-image payloads through untouched") {
    val m = MediaRow(5L, "audio", MediaCodec.synthWav(5L, 100L))
    val r = MediaCodec.resizeImage(m, 8, 6)
    assert(r.media.toSeq === m.media.toSeq)
  }

  test("audioWindows decodes real PCM into exact per-window energies") {
    // doc_id = 5, nChars = 300 -> 301 samples of (5 + i) % 256: one full
    // 256-sample window plus a 45-sample tail. Expectation computed from
    // the generative formula the real decode must reproduce.
    val row = MediaRow(5L, "audio", MediaCodec.synthWav(5L, 300L))
    def energy(from: Int, until: Int): Long =
      (from until until).map { i =>
        val c = ((5 + i) % 256) - 128; c.toLong * c
      }.sum
    val got = MediaCodec.audioWindows(row, 256)
    assert(got === Seq(
      AudioWindow(5L, 0L, 256L, energy(0, 256)),
      AudioWindow(5L, 1L, 45L, energy(256, 301))))
    // Non-WAV payloads produce no windows (skipped, never stubbed).
    assert(MediaCodec.audioWindows(
      MediaRow(2L, "image", MediaCodec.synthPng(2L, 10L)), 256) === Seq())
  }

  test("imageDHash packs lattice comparisons of the REAL decoded pixels") {
    // doc_id = 4, nChars = 20 -> a 21x21 gradient PNG with
    // pixel(x, y) = (4 + x) % 256: brute-compute the 56-bit dHash from
    // the generative formula; the codec must reproduce it through a
    // genuine PNG decode.
    val m = MediaRow(4L, "image", MediaCodec.synthPng(4L, 20L))
    val w = 21
    def px(x: Int): Int = (4 + x) % 256
    var want = 0L
    for (j <- 0 until 8; i <- 0 until 7) {
      val x1 = i * (w - 1) / 7
      val x2 = (i + 1) * (w - 1) / 7
      if (px(x2) > px(x1)) want |= 1L << (j * 7 + i)
    }
    assert(MediaCodec.imageDHash(m) === Some((4L, want)))
    // A 1x1 image has no adjacent samples: hash 0, not an error.
    assert(MediaCodec.imageDHash(
      MediaRow(6L, "image", MediaCodec.synthPng(6L, 0L))) === Some((6L, 0L)))
    // Undecodable payloads are SKIPPED, never fabricated.
    assert(MediaCodec.imageDHash(
      MediaRow(5L, "audio", MediaCodec.synthWav(5L, 10L))) === None)
  }

  test("synthPngXY dHashes through real decodes land in the banded Hamming join") {
    import spark.implicits._
    // Constructed near-pair: same (w, h) class, doc_ids 2 apart — the
    // XY gradient makes their 56-bit hashes differ in a handful of bits
    // (verified below from the generative formula), and the banded join
    // must surface exactly the brute-force <= 7 relation over the set.
    val docs = Seq((100L, 20L), (102L, 20L), (104L, 20L), (300L, 33L),
      (301L, 33L), (555L, 47L))
    def predictHash(docId: Long, nChars: Long): Long = {
      val w = (1 + nChars % 64).toInt
      val h = (1 + nChars % 48).toInt
      def px(x: Int, y: Int): Long = (docId + x + 7L * y) % 256
      var hash = 0L
      for (j <- 0 until 8; i <- 0 until 7) {
        val y = j * (h - 1) / 7
        val x1 = i * (w - 1) / 7
        val x2 = (i + 1) * (w - 1) / 7
        if (px(x2, y) > px(x1, y)) hash |= 1L << (j * 7 + i)
      }
      hash
    }
    // The real decode path must reproduce the predicted hashes...
    val rows = docs.map { case (id, n) =>
      MediaRow(id, "image", MediaCodec.synthPngXY(id, n)) }
    rows.zip(docs).foreach { case (m, (id, n)) =>
      assert(MediaCodec.imageDHash(m) === Some((id, predictHash(id, n))))
    }
    // ...and hashes must NOT be row-degenerate (y-dependence is the
    // fixture's whole point: Hamming distances off the 8-multiples grid).
    val predicted = docs.map { case (id, n) => (id, predictHash(id, n)) }
    val brute = (for {
      (d1, h1) <- predicted; (d2, h2) <- predicted
      if d1 < d2 && java.lang.Long.bitCount(h1 ^ h2) <= 7
    } yield (d1, d2, java.lang.Long.bitCount(h1 ^ h2).toLong)).toSet
    assert(brute.exists(_._3 > 0), s"fixture needs a non-exact near pair")
    val hashes = Media.imageDHashes(spark.createDataset(rows))
      .toDF("doc_id", "dhash")
    val got = Dedup.hammingPairs(hashes, "doc_id", "dhash",
        bands = 8, bandBits = 7, maxHamming = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === brute)
  }

  test("imagePHash survives pixel noise that buries dHash, and rides the banded join") {
    import spark.implicits._
    // 32×32 base image seeding ALL 63 low-band DCT modes with separated
    // amplitudes (so every pHash bit is a decided comparison, not a
    // near-zero coin flip); the two copies differ ONLY in deterministic
    // per-pixel ±30 noise. dHash compares individual sampled pixels —
    // noise-dominated; each pHash bit averages 1024 samples — the mode
    // pattern survives. Tuned empirically: observed pHash Hamming 2,
    // dHash Hamming 13 for these seeds.
    def noise(seed: Long, x: Int, y: Int): Int = {
      var z = seed * 0x9E3779B97F4A7C15L + x * 0xBF58476D1CE4E5B9L +
        y * 0x94D049BB133111EBL
      z ^= (z >>> 31); z *= 0xD6E8FEB86659FD93L; z ^= (z >>> 27)
      java.lang.Long.remainderUnsigned(z, 61L).toInt - 30
    }
    def mkImg(seed: Long): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 32; x <- 0 until 32) {
        var v = 128.0
        var idx = 0
        for (u <- 0 until 8; w <- 0 until 8) {
          if (u != 0 || w != 0) {
            val amp = (if (idx % 2 == 0) 1 else -1) * (4 + 2 * (idx % 13))
            v += amp * math.cos(math.Pi * (2 * x + 1) * u / 64.0) *
              math.cos(math.Pi * (2 * y + 1) * w / 64.0)
            idx += 1
          }
        }
        val p = math.max(0, math.min(255,
          math.round(v).toInt + noise(seed, x, y)))
        img.getRaster.setSample(x, y, 0, p)
      }
      img
    }
    def png(img: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val (ia, ib) = (mkImg(11L), mkImg(22L))
    val a = MediaRow(1L, "image", png(ia))
    val b = MediaRow(2L, "image", png(ib))
    // PNG is lossless: the decode path must equal the raw-raster hash.
    assert(MediaCodec.imagePHash(a) === Some((1L, MediaCodec.pHash(ia))))
    val Some((_, pa)) = MediaCodec.imagePHash(a)
    val Some((_, pb)) = MediaCodec.imagePHash(b)
    val Some((_, da)) = MediaCodec.imageDHash(a)
    val Some((_, db)) = MediaCodec.imageDHash(b)
    val pd = java.lang.Long.bitCount(pa ^ pb)
    val dd = java.lang.Long.bitCount(da ^ db)
    assert(pd <= 8, s"pHash must survive the noise: Hamming $pd")
    assert(dd > 8, s"the fixture must bury dHash: Hamming $dd")
    // The banded join surfaces the pair in pHash space only (dHash's
    // exact ball is radius 7 at 8 bands — the pair is far outside it).
    val rows = spark.createDataset(Seq(a, b))
    val gotP = Dedup.hammingPairs(
      Media.imagePHashes(rows).toDF("doc_id", "phash"),
      "doc_id", "phash", bands = 9, bandBits = 7, maxHamming = 8).count()
    val gotD = Dedup.hammingPairs(
      Media.imageDHashes(rows).toDF("doc_id", "dhash"),
      "doc_id", "dhash", bands = 8, bandBits = 7, maxHamming = 7).count()
    assert(gotP === 1L && gotD === 0L, s"pairs: phash=$gotP dhash=$gotD")
  }

  test("gifFrameDHashes hashes every REAL decoded frame to the predicted lattice pack") {
    // doc_id = 250, nChars = 29 -> F = 1 + 29 % 12 = 6 frames of
    // (1 + 29 % 32) x (1 + 29 % 24) = 30 x 6; frame f is y-constant with
    // pixel(x, .) = (250 + f + x) % 256, so each frame's 56-bit hash is
    // its 7-bit row pattern times sum_j 2^(7j) = 567382630219905 — and
    // the 256-wrap lands at a DIFFERENT lattice position per frame, so
    // the six hashes genuinely differ.
    val (id, nChars) = (250L, 29L)
    val m = MediaRow(id, "video", MediaCodec.synthGif(id, nChars))
    val (fcnt, w) = ((1 + nChars % 12).toInt, (1 + nChars % 32).toInt)
    def predict(f: Int): Long = {
      var rp = 0L
      for (i <- 0 until 7) {
        val x1 = i * (w - 1) / 7
        val x2 = (i + 1) * (w - 1) / 7
        if ((id + f + x2) % 256 > (id + f + x1) % 256) rp |= 1L << i
      }
      rp * 567382630219905L
    }
    val want = (0 until fcnt).map(f => (id, f.toLong, predict(f)))
    assert(MediaCodec.gifFrameDHashes(m) === want)
    assert(want.map(_._3).distinct.size > 1,
      "fixture should produce several distinct frame hashes")
    // Non-GIF payloads are skipped, never fabricated.
    assert(MediaCodec.gifFrameDHashes(
      MediaRow(2L, "image", MediaCodec.synthPng(2L, 10L))) === Seq.empty)
  }

  test("audioFingerprint packs window-energy comparisons of REAL PCM decodes") {
    // doc_id = 9, nChars picked so the clip spans several 16-sample
    // windows: predict every window energy from the generative formula
    // sample(i) = (9 + i) % 256 and pack the comparison bits; the codec
    // must reproduce the print through a genuine RIFF/PCM parse.
    val (id, nChars) = (9L, 200L)
    val m = MediaRow(id, "audio", MediaCodec.synthWav(id, nChars))
    val n = (1 + nChars % 2048).toInt
    val W = 16
    def energy(w: Int): Long =
      (w * W until math.min(n, (w + 1) * W)).map { i =>
        val c = (id + i) % 256 - 128; c * c
      }.sum
    val nw = (n + W - 1) / W
    var want = 0L
    for (w <- 0 until math.min(nw - 1, 56))
      if (energy(w + 1) > energy(w)) want |= 1L << w
    assert(MediaCodec.audioFingerprint(m, W) === Some((id, want)))
    assert(want !== 0L, "fixture should exercise at least one set bit")
    // A clip shorter than two windows prints 0 (no adjacent pair).
    assert(MediaCodec.audioFingerprint(
      MediaRow(3L, "audio", MediaCodec.synthWav(3L, 4L)), 256) ===
      Some((3L, 0L)))
    // Non-WAV payloads are skipped, never fabricated.
    assert(MediaCodec.audioFingerprint(
      MediaRow(2L, "image", MediaCodec.synthPng(2L, 10L)), W) === None)
  }

  test("media decode spreads across cores and never shuffles media bytes") {
    val df = mediaDecode(mediaTable(spark, sf))
    val plan = df.queryExecution.executedPlan.toString
    // The ONE allowed exchange is the tiny (doc_id, n_chars) spread
    // BEFORE the synth/decode map — media payload bytes must never
    // cross a shuffle (the r12 map-side contract, sharpened: the old
    // zero-exchange form silently pinned the whole codec chain to the
    // parquet scan's task count — one task at bench scale).
    val exchanges = "\\bExchange ".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly the pre-synth spread:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(doc_id#"),
      s"the one exchange must be the pre-synth id spread:\n$plan")
    // And the spread genuinely widens the decode: as many partitions as
    // the cluster offers (capped by row count upstream of the map).
    assert(df.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism,
      "decode parallelism must not be pinned to the scan's split count")
  }
}
