package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary-column) plumbing (SURVEY.md §2.6 north-star surface).
  *
  * Media lives in DataFrames as an opaque `BinaryType` column plus a typed
  * metadata struct — the same envelope discipline as the stream payload. The
  * decode / feature-extract / resize / frame-sample operators below have the
  * real Spark plumbing (schema, typed mapPartitions batch shape,
  * partition-preserving execution).
  *
  * The IMAGE path is a real codec: `javax.imageio` (java.desktop ships in
  * this JVM) parses genuine PNG containers — width/height come from the
  * decoded header and the pixel statistics from the decoded raster, and the
  * fixture synthesizes real PNG bytes (gradient grayscale) so the oracle can
  * predict the decoded values from the generative parameters. The AUDIO path
  * is likewise real: `javax.sound.sampled` writes and parses genuine WAV
  * (RIFF/PCM) containers — frame count, channels, and sample width come
  * from the decoded format header and the mean from the decoded PCM frames.
  * The MOTION path is real too: multi-frame ANIMATED GIF containers are
  * encoded and frame-by-frame decoded via `ImageIO`'s sequence API — frame
  * count, dims, per-frame pixel payloads, and the every-k-th frame sampling
  * all come from genuine decodes. `resize` is real as well: decodable
  * images rescale through Graphics2D bilinear interpolation and re-encode
  * as genuine PNGs at the target resolution. What remains a stub is only
  * the H.264-class compressed-video branch (no such codec ships in this
  * JVM; non-container payloads fall back to deterministic byte
  * arithmetic); swapping a codec in changes only `MediaCodec.decode*`
  * bodies — not the operator shape, schema, or distribution.
  *
  * Scale design: all operators are map-side (mapPartitions — one pass, no
  * shuffle, no driver collection); at 100 TB, media decode is embarrassingly
  * parallel and the only cross-row operator (per-format stats) is a tiny
  * aggregation of the already-extracted metadata. Pixel means are emitted as
  * BIGINT micros ((1e6·Σpixels) div n — exact integer algebra), so the
  * downstream aggregate is engine- and partitioning-deterministic.
  */
object Media {

  /** Typed media record entering the pipeline: opaque bytes + claimed kind. */
  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])

  /** Decoded metadata. For a decoded image, `n_bytes` is the DECODED
    * payload size (width·height·channels — what the pixels occupy), not
    * the container length: container length is `length(media)` upstream
    * without any codec. `mean_byte_micro` is the mean decoded pixel (or
    * raw payload byte, for stub kinds) in integer micros.
    */
  final case class MediaMeta(
      doc_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, mean_byte_micro: Long, format: String)

  /** Extracted features: fixed-width vector per media item. */
  final case class MediaFeatures(doc_id: Long, dim: Int, features: Array[Double])

  /** One sampled frame, keyed by (source doc, frame index). */
  final case class FrameRow(doc_id: Long, frame_idx: Int, kind: String, media: Array[Byte])

  /** One fixed-length analysis window of a decoded audio stream:
    * `energy` = Σ (sample − 128)² over the window's 8-bit unsigned PCM
    * samples — exact BIGINT, the VAD/silence-gate feature. */
  final case class AudioWindow(
      doc_id: Long, window_idx: Long, n_samples: Long, energy: Long)

  /** The codec seam. The PNG branch is a real decoder (ImageIO);
    * non-image kinds keep deterministic byte-arithmetic stubs.
    */
  object MediaCodec {

    private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')

    def isPng(bytes: Array[Byte]): Boolean =
      bytes.length >= 4 &&
        bytes(0) == PngMagic(0) && bytes(1) == PngMagic(1) &&
        bytes(2) == PngMagic(2) && bytes(3) == PngMagic(3)

    def isWav(bytes: Array[Byte]): Boolean =
      bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F'

    def isGif(bytes: Array[Byte]): Boolean =
      bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8'

    /** Synthesize a REAL multi-frame animated GIF (the motion format this
      * JVM genuinely encodes AND decodes — the video stand-in): nFrames =
      * 1 + nChars % 12 grayscale frames of w = 1 + nChars % 32 by
      * h = 1 + nChars % 24, frame f pixel(x, ·) = (docId + f + x) mod 256.
      * GIF is lossless for ≤256-color frames, so the per-frame pixel sums
      * decode bit-exactly and the oracle predicts them from the
      * generative parameters.
      */
    def synthGif(docId: Long, nChars: Long): Array[Byte] = {
      val w = (1 + nChars % 32).toInt
      val h = (1 + nChars % 24).toInt
      val nFrames = (1 + nChars % 12).toInt
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val out = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      // Interlace OFF: the default sequence metadata interlaces frames,
      // and the JDK reader drops rows of interlaced frames shorter than
      // one interlace pass (h < 8) — non-interlaced frames round-trip
      // bit-exactly at every size.
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, (((docId + f + x) % 256) + 256) % 256)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
        f += 1
      }
      writer.endWriteSequence()
      ios.close()
      writer.dispose()
      out.toByteArray
    }

    /** Decode every frame of a GIF container (animated or single). */
    def gifFrames(bytes: Array[Byte]): IndexedSeq[java.awt.image.BufferedImage] = {
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      reader.setInput(iis, false)
      val n = reader.getNumImages(true)
      val frames = (0 until n).map(reader.read)
      reader.dispose()
      iis.close()
      frames
    }

    /** Gray value (r = g = b for a grayscale palette) of one pixel. */
    private def gray(img: java.awt.image.BufferedImage, x: Int, y: Int): Int =
      img.getRGB(x, y) & 0xff

    /** Synthesize a REAL WAV container (RIFF + PCM_UNSIGNED 8-bit mono at
      * 8 kHz) with n = 1 + nChars % 2048 samples, sample(i) =
      * (docId + i) mod 256 — the audio twin of [[synthPng]]'s gradient:
      * PCM is lossless, so the decode recovers the samples bit-exactly
      * and the oracle predicts the mean from the generative parameters.
      */
    def synthWav(docId: Long, nChars: Long): Array[Byte] = {
      val n = (1 + nChars % 2048).toInt
      val samples = new Array[Byte](n)
      var i = 0
      while (i < n) {
        samples(i) = ((((docId + i) % 256) + 256) % 256).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
        8000f, 8, 1, 1, 8000f, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(samples), fmt, n.toLong)
      val out = new ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Synthesize a REAL grayscale PNG: width = 1 + nChars % 64, height =
      * 1 + nChars % 48, pixel(x, y) = (docId + x) mod 256 (a horizontal
      * gradient — every row identical, so the exact mean is
      * h·Σx (docId+x)%256 over w·h, which the oracle reproduces in
      * integer algebra). PNG is lossless, so the decode below recovers
      * these pixels bit-exactly.
      */
    def synthPng(docId: Long, nChars: Long): Array[Byte] = {
      val w = (1 + nChars % 64).toInt
      val h = (1 + nChars % 48).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, (((docId + x) % 256) + 256) % 256)
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** XY-gradient variant of [[synthPng]]: pixel(x, y) = (docId + x +
      * 7·y) mod 256 — the y-dependence makes the 8 dHash lattice rows
      * carry DIFFERENT 7-bit patterns, so cross-document Hamming
      * distances take every value in 0..56 instead of multiples of 8
      * (the plain [[synthPng]] gradient is y-constant, which collapses
      * the 56-bit hash to one repeated row pattern and makes "near"
      * degenerate to "equal"). The q351 near-dup fixture.
      */
    def synthPngXY(docId: Long, nChars: Long): Array[Byte] = {
      val w = (1 + nChars % 64).toInt
      val h = (1 + nChars % 48).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, (((docId + x + 7L * y) % 256) + 256) % 256)
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Decode: REAL for PNG payloads (header dims + raster pixel mean via
      * ImageIO) and for WAV payloads (format header + PCM sample mean via
      * javax.sound — `width` carries channels, `height` the sample bits,
      * `n_bytes` the decoded frame count); deterministic byte-arithmetic
      * stub for everything else (video — no codec ships in this JVM).
      */
    def decodeMeta(m: MediaRow): MediaMeta = {
      if (isWav(m.media)) {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(m.media))
        val fmt = ais.getFormat
        val n = ais.getFrameLength
        val frameBytes = fmt.getFrameSize
        val buf = ais.readAllBytes()
        var s = 0L
        var i = 0
        while (i < buf.length) { s += buf(i) & 0xff; i += 1 }
        MediaMeta(m.doc_id, m.kind, n_bytes = n,
          width = fmt.getChannels, height = fmt.getSampleSizeInBits,
          mean_byte_micro =
            if (buf.isEmpty) 0L else 1000000L * s / (n * frameBytes),
          format = "wav")
      } else if (isPng(m.media)) {
        val img = ImageIO.read(new ByteArrayInputStream(m.media))
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        val bands = raster.getNumBands
        var s = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h * bands
        MediaMeta(m.doc_id, m.kind, n, w, h,
          mean_byte_micro = 1000000L * s / n, format = "png")
      } else if (isGif(m.media)) {
        val frames = gifFrames(m.media)
        val w = frames.head.getWidth
        val h = frames.head.getHeight
        var s = 0L
        frames.foreach { img =>
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { s += gray(img, x, y); x += 1 }
            y += 1
          }
        }
        val n = w.toLong * h * frames.length
        MediaMeta(m.doc_id, m.kind, n, w, h,
          mean_byte_micro = 1000000L * s / n, format = "gif")
      } else {
        val n = m.media.length
        val sum = { var s = 0L; var i = 0; while (i < n) { s += m.media(i) & 0xff; i += 1 }; s }
        MediaMeta(m.doc_id, m.kind, n.toLong,
          width = 1 + n % 64, height = 1 + n % 48,
          mean_byte_micro = if (n == 0) 0L else 1000000L * sum / n,
          format = if (n % 2 == 0) "png" else "jpg")
      }
    }

    /** Feature extraction: 16-bin L1-normalized histogram over DECODED
      * pixels for PNG (real raster walk), over raw payload bytes
      * otherwise — the stand-in for an embedding model.
      */
    def extractFeatures(m: MediaRow): MediaFeatures = {
      val bins = new Array[Double](16)
      var n = 0L
      if (isWav(m.media)) {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(m.media))
        val buf = ais.readAllBytes()
        buf.foreach(b => bins((b & 0xff) / 16) += 1.0)
        n = buf.length.toLong
      } else if (isPng(m.media)) {
        val raster = ImageIO.read(new ByteArrayInputStream(m.media)).getRaster
        val (w, h, bands) =
          (raster.getWidth, raster.getHeight, raster.getNumBands)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) {
              bins(raster.getSample(x, y, b) / 16) += 1.0; b += 1
            }
            x += 1
          }
          y += 1
        }
        n = w.toLong * h * bands
      } else if (isGif(m.media)) {
        val frames = gifFrames(m.media)
        frames.foreach { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { bins(gray(img, x, y) / 16) += 1.0; x += 1 }
            y += 1
          }
          n += w.toLong * h
        }
      } else {
        m.media.foreach(b => bins((b & 0xff) / 16) += 1.0)
        n = m.media.length.toLong
      }
      val d = math.max(1L, n).toDouble
      MediaFeatures(m.doc_id, 16, bins.map(_ / d))
    }

    /** REAL windowed audio energy: decode the WAV container
      * (javax.sound — RIFF header + PCM frames), center the 8-bit
      * unsigned samples at 128, and emit per fixed-length window the
      * sample count and Σ(s−128)² — the energy curve a voice-activity /
      * silence-split stage thresholds on. Exact BIGINT (≤ 128²·W per
      * window); the last window may be short and reports its true
      * sample count. Non-WAV payloads yield no windows (skipped, not
      * stubbed — energy of undecoded bytes would be noise).
      */
    def audioWindows(m: MediaRow, windowSamples: Int): Seq[AudioWindow] =
      if (!isWav(m.media)) Seq.empty
      else {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(m.media))
        val buf = ais.readAllBytes()
        val out = scala.collection.mutable.ArrayBuffer.empty[AudioWindow]
        var w = 0
        while (w * windowSamples < buf.length) {
          val start = w * windowSamples
          val end = math.min(buf.length, start + windowSamples)
          var e = 0L
          var i = start
          while (i < end) {
            val c = (buf(i) & 0xff) - 128
            e += c.toLong * c
            i += 1
          }
          out += AudioWindow(m.doc_id, w.toLong, (end - start).toLong, e)
          w += 1
        }
        out.toSeq
      }

    /** Difference-fingerprint of a decodable audio payload — the
      * [[imageDHash]] discipline applied to the time axis: one bit per
      * adjacent WINDOW pair (bit w set iff window w+1's energy exceeds
      * window w's), packed LSB-first and capped at 56 bits so the print
      * stays in positive BIGINT range. Energy windows are GENUINE PCM
      * decodes ([[audioWindows]]); volume-scaling robustness comes from
      * comparing energies, not thresholding them. None for payloads
      * without a WAV container — skip, never fabricate; a single-window
      * clip prints 0 (no adjacent pair), not an error.
      */
    def audioFingerprint(m: MediaRow, windowSamples: Int): Option[(Long, Long)] = {
      val ws = audioWindows(m, windowSamples)
      if (ws.isEmpty) None
      else {
        var h = 0L
        val nBits = math.min(ws.size - 1, 56)
        var w = 0
        while (w < nBits) {
          if (ws(w + 1).energy > ws(w).energy) h |= 1L << w
          w += 1
        }
        Some((m.doc_id, h))
      }
    }

    /** REAL image resize for the container formats this JVM decodes (PNG
      * and GIF — GIF resizes its first frame, ImageIO's read contract):
      * decode, rescale through `Graphics2D.drawImage` with BILINEAR
      * interpolation (java.desktop ships the full AffineTransform
      * rasterizer), re-encode as a genuine PNG at the target resolution.
      * Non-image payloads pass through unchanged — resampling audio or
      * compressed video needs codecs this JVM doesn't ship, and silently
      * truncating them would corrupt, not resize.
      */
    def resizeImage(m: MediaRow, targetW: Int, targetH: Int): MediaRow = {
      // ImageIO.read returns null on a truncated/corrupt container even
      // when the magic bytes matched — route such rows through unchanged
      // (the opaque fallback) instead of NPE-failing the whole stage.
      val src = if (isPng(m.media) || isGif(m.media))
        ImageIO.read(new ByteArrayInputStream(m.media)) else null
      if (src != null) {
        val dst = new java.awt.image.BufferedImage(targetW, targetH,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g = dst.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, targetW, targetH, null)
        g.dispose()
        val out = new ByteArrayOutputStream()
        ImageIO.write(dst, "png", out)
        m.copy(media = out.toByteArray)
      } else m
    }

    /** Difference hash (dHash) of a decodable image: sample a
      * `grid`×`grid` lattice of EXACT pixel positions spanning the frame
      * (x_i = i·(w−1) div (grid−1), likewise y), set one bit per
      * horizontally-adjacent pair where the right sample is brighter,
      * pack row-major into a BIGINT — (grid−1)·grid bits, 56 for the
      * default 8, so the pack stays in positive BIGINT range on every
      * engine. The perceptual-dedup primitive for images: near-identical
      * frames hash equal (or within a small Hamming ball — compose with
      * the [[graft.operators.Dedup]] clustering the way [[SimHash]]
      * consumers do). No resize pass: exact lattice sampling keeps the
      * hash integer-deterministic where an interpolating rescale would
      * drag in rasterizer-specific rounding.
      *
      * Returns None for payloads this JVM cannot decode (opaque kinds,
      * truncated containers) — skip, never fabricate. GIF hashes its
      * first frame (the ImageIO read contract).
      */
    def imageDHash(m: MediaRow, grid: Int = 8): Option[(Long, Long)] = {
      val src = if (isPng(m.media) || isGif(m.media))
        ImageIO.read(new ByteArrayInputStream(m.media)) else null
      if (src == null || grid < 2) None
      else Some((m.doc_id, latticeHash(src, grid)))
    }

    /** The (grid−1)·grid-bit lattice pack shared by [[imageDHash]] and
      * [[gifFrameDHashes]]. Raw raster samples for single-band (gray)
      * rasters — getRGB would run the gray→sRGB color transform and
      * distort the comparison; multi-band/indexed rasters fall back to
      * the low RGB byte (the GIF-frame convention).
      */
    private def latticeHash(src: java.awt.image.BufferedImage,
        grid: Int): Long = {
      val (w, h) = (src.getWidth, src.getHeight)
      val raster = src.getRaster
      val oneBand = raster.getNumBands == 1
      def px(x: Int, y: Int): Int =
        if (oneBand) raster.getSample(x, y, 0) else gray(src, x, y)
      var hash = 0L
      var b = 0
      var j = 0
      while (j < grid) {
        val y = j * (h - 1) / (grid - 1)
        var i = 0
        while (i < grid - 1) {
          val x1 = i * (w - 1) / (grid - 1)
          val x2 = (i + 1) * (w - 1) / (grid - 1)
          if (px(x2, y) > px(x1, y)) hash |= 1L << b
          b += 1
          i += 1
        }
        j += 1
      }
      hash
    }

    /** Integer DCT-II basis for [[imagePHash]], quantized to micros:
      * T(u, i) = floor(cos(π(2i+1)u/64)·1e6). The q368 oracle SQL
      * interpolates THIS array as a literal, so engine/oracle agreement
      * never depends on two libm cos implementations rounding the last
      * ulp identically — and because every downstream product/sum stays
      * in exact BIGINT range (|p·T·T| ≤ 255·10¹² per term, ≤ 2.7·10¹⁷
      * per coefficient), the whole hash is integer-deterministic.
      */
    private[operators] val PHashTab: Array[Long] = Array.tabulate(8 * 32) { t =>
      val u = t / 32
      val i = t % 32
      math.floor(math.cos(math.Pi * (2 * i + 1) * u / 64.0) * 1e6).toLong
    }

    /** DCT-based perceptual hash (pHash) — the crop/noise-tolerant
      * complement to [[imageDHash]] (VERDICT r8 Next #7): dHash compares
      * INDIVIDUAL sampled pixels, so per-pixel noise (dither, JPEG
      * artifacts) flips its bits wholesale; pHash thresholds the 63
      * low-band 8×8 DCT-II coefficients (DC excluded) of a 32×32 exact
      * lattice sample against their median, so each bit averages 1024
      * samples and survives noise that buries dHash. Same packing
      * discipline: 63 bits, positive BIGINT, rides
      * [[graft.operators.Dedup.hammingPairs]] at 9 bands × 7 bits
      * (exact for Hamming ≤ 8). No float leaves the kernel: pixels are
      * ints, the basis is the integer [[PHashTab]], coefficients are
      * exact BIGINTs, and the median of 63 is the 32nd smallest — an
      * order statistic, not an average.
      */
    def imagePHash(m: MediaRow): Option[(Long, Long)] = {
      val src = if (isPng(m.media) || isGif(m.media))
        ImageIO.read(new ByteArrayInputStream(m.media)) else null
      if (src == null) None
      else Some((m.doc_id, pHash(src)))
    }

    private[operators] def pHash(src: java.awt.image.BufferedImage): Long = {
      val (w, h) = (src.getWidth, src.getHeight)
      val raster = src.getRaster
      val oneBand = raster.getNumBands == 1
      def px(x: Int, y: Int): Long =
        (if (oneBand) raster.getSample(x, y, 0) else gray(src, x, y)).toLong
      // 32×32 exact lattice sample (the latticeHash discipline — no
      // interpolating resize, so no rasterizer-specific rounding).
      val p = Array.tabulate(32, 32)((j, i) =>
        px(i * (w - 1) / 31, j * (h - 1) / 31))
      val coeffs = new Array[Long](63)
      var idx = 0
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          if (u != 0 || v != 0) {
            // Σ_j (Σ_i p(j)(i)·T(u,i)) · T(v,j) — exact-integer, so the
            // factored form equals the oracle's flat triple-product sum.
            var acc = 0L
            var j = 0
            while (j < 32) {
              var row = 0L
              var i = 0
              while (i < 32) {
                row += p(j)(i) * PHashTab(u * 32 + i)
                i += 1
              }
              acc += row * PHashTab(v * 32 + j)
              j += 1
            }
            coeffs(idx) = acc
            idx += 1
          }
          v += 1
        }
        u += 1
      }
      val med = coeffs.sorted.apply(31)
      var hash = 0L
      idx = 0
      u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          if (u != 0 || v != 0) {
            if (coeffs(idx) > med) hash |= 1L << (u * 8 + v - 1)
            idx += 1
          }
          v += 1
        }
        u += 1
      }
      hash
    }

    /** dHash of EVERY genuinely decoded frame of a GIF container —
      * (doc_id, frame_idx, hash) rows, the per-frame primitive the
      * video near-dup containment (q355) consumes. Empty for non-GIF
      * payloads (no codec in this JVM decodes other video containers —
      * skip, never fabricate).
      */
    def gifFrameDHashes(m: MediaRow, grid: Int = 8): Seq[(Long, Long, Long)] =
      if (!isGif(m.media) || grid < 2) Seq.empty
      else gifFrames(m.media).zipWithIndex.map { case (img, f) =>
        (m.doc_id, f.toLong, latticeHash(img, grid))
      }

    /** Byte-budget clamp for OPAQUE payloads (truncate/zero-pad) — the
      * storage-cap primitive for kinds with no decoder, NOT an image
      * operation; image resolution changes go through [[resizeImage]].
      */
    def clampBytes(m: MediaRow, targetBytes: Int): MediaRow =
      m.copy(media = java.util.Arrays.copyOf(m.media, targetBytes))

    /** Frame sampling. GIF containers are REAL: every k-th genuinely
      * decoded frame is emitted as its raw grayscale pixel bytes (w·h per
      * frame — `frameBytes` is ignored; the container defines its frames).
      * Non-container payloads keep the byte-chunk stub (fixed-size chunks,
      * every k-th — a real video impl would seek keyframes; no H.264-class
      * codec ships in this JVM). The frame identity is a (doc_id,
      * frame_idx) struct — NOT an arithmetic doc_id*k+i encoding, which
      * silently aliases across documents once a payload exceeds k frames
      * (unbounded media at 100 TB guarantees that).
      */
    def sampleFrames(m: MediaRow, frameBytes: Int, everyK: Int): Seq[FrameRow] =
      if (isGif(m.media)) {
        gifFrames(m.media).zipWithIndex
          .collect { case (img, i) if i % everyK == 0 =>
            val (w, h) = (img.getWidth, img.getHeight)
            val px = new Array[Byte](w * h)
            var y = 0
            var p = 0
            while (y < h) {
              var x = 0
              while (x < w) { px(p) = gray(img, x, y).toByte; p += 1; x += 1 }
              y += 1
            }
            FrameRow(m.doc_id, i, m.kind, px)
          }
      } else {
        m.media.grouped(frameBytes).zipWithIndex
          .collect { case (f, i) if i % everyK == 0 =>
            FrameRow(m.doc_id, i, m.kind, f)
          }.toSeq
      }
  }

  /** Media table synthesized from documents: even doc_ids carry REAL PNG
    * bytes (ImageIO-encoded gradient, executor-side — one encoder per
    * partition task, no driver work), doc_id ≡ 1 (mod 4) REAL WAV bytes
    * (javax.sound-encoded PCM gradient), and doc_id ≡ 3 (mod 4) REAL
    * multi-frame animated GIF bytes — the motion format this JVM
    * genuinely encodes and decodes, standing in for video.
    */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    // Only (doc_id, n_chars) feed the synthesizers — selecting `text`
    // here shipped the corpus' heaviest column through an opaque typed
    // map for nothing (guide §2.3: project before opaque operations).
    // The repartition spreads the CPU-bound codec loops over every core:
    // the documents scan is a handful of parquet splits (one, at bench
    // scale), and an un-spread mapPartitions pins the whole encode +
    // decode chain of every downstream media operator to that task count
    // (guide §2.5 input skew; hash on the unique doc_id, sized by the
    // cluster's defaultParallelism — never a local[32] constant).
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        if (id % 2 == 0) MediaRow(id, "image", MediaCodec.synthPng(id, nChars))
        else if (id % 4 == 1)
          MediaRow(id, "audio", MediaCodec.synthWav(id, nChars))
        else MediaRow(id, "video", MediaCodec.synthGif(id, nChars))
      })
  }

  /** Decode: partition-wise map over typed rows — the mapPartitions batch
    * shape a vectorized codec binding uses (one codec instance per
    * partition, streamed rows).
    */
  def decode(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // codec init happens once per partition here
      it.map(MediaCodec.decodeMeta)
    }
  }

  def features(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(MediaCodec.extractFeatures))
  }

  def frameSample(media: Dataset[MediaRow], frameBytes: Int, everyK: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(MediaCodec.sampleFrames(_, frameBytes, everyK)))
  }

  /** Windowed audio energy over genuinely decoded PCM — map-side like
    * every media operator (one decode per row inside the partition
    * iterator, zero shuffle). */
  def audioEnergy(media: Dataset[MediaRow], windowSamples: Int): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(MediaCodec.audioWindows(_, windowSamples)))
  }

  /** Per-image difference hashes over genuinely decoded pixels —
    * map-side like every media operator (one decode per row inside the
    * partition iterator, zero shuffle); undecodable rows are skipped.
    * The output (doc_id, dhash) relation composes with the exact/Hamming
    * dedup family the way text fingerprints do. */
  def imageDHashes(media: Dataset[MediaRow],
      grid: Int = 8): Dataset[(Long, Long)] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(MediaCodec.imageDHash(_, grid)))
  }

  /** Per-image DCT perceptual hashes — map-side like every media
    * operator; undecodable rows are skipped. See
    * [[MediaCodec.imagePHash]] for why this catches noise/dither
    * near-dups that [[imageDHashes]] misses; the (doc_id, phash)
    * relation rides the same banded Hamming join. */
  def imagePHashes(media: Dataset[MediaRow]): Dataset[(Long, Long)] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(MediaCodec.imagePHash))
  }

  /** Per-clip audio difference-fingerprints over genuinely decoded PCM —
    * map-side like every media operator; undecodable rows are skipped.
    * The (doc_id, fingerprint) relation composes with
    * [[Dedup.hammingPairs]] exactly as the image dHashes do — the same
    * banded near-dup join serves both modalities. */
  def audioFingerprints(media: Dataset[MediaRow],
      windowSamples: Int): Dataset[(Long, Long)] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(MediaCodec.audioFingerprint(_, windowSamples)))
  }

  /** Real resolution change for every decodable image in the set —
    * map-side (decode → bilinear rescale → PNG re-encode per row inside
    * the partition iterator, zero shuffle; at 100 TB this is the
    * embarrassingly-parallel preprocessing stage before feature
    * extraction, exactly as distributed as the decode). */
  def resizeImages(media: Dataset[MediaRow], targetW: Int,
      targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(MediaCodec.resizeImage(_, targetW, targetH)))
  }

  // ---- q32: decode → per-format metadata stats -------------------------------
  private def q32(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    decode(mediaTable(s, d)).toDF()
      .groupBy(col("kind"), col("format"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("bytes_total"),
        round(avg(col("width")), 4).as("width_avg"),
        expr("sum(mean_byte_micro) div count(1)").as("mean_byte_micro_avg"))
      .orderBy(col("kind"), col("format"))
  }
  // Image rows are REAL decodes of the synthesized PNGs, so the oracle
  // predicts width/height/pixel-mean from the generative parameters
  // (w = 1 + n_chars % 64, h = 1 + n_chars % 48, pixel(x,·) =
  // (doc_id + x) % 256 ⇒ Σpixels = h·Σx): the engine must round-trip a
  // genuine PNG encode+decode to reproduce these numbers. Audio rows are
  // the same contract through a genuine WAV (RIFF/PCM) round trip:
  // n = 1 + n_chars % 2048 samples of (doc_id + i) % 256. Video rows are
  // the same contract through a genuine multi-frame ANIMATED GIF round
  // trip: F = 1 + n_chars % 12 frames of (1 + n_chars % 32) ×
  // (1 + n_chars % 24), frame f pixel(x,·) = (doc_id + f + x) % 256, so
  // the decoded frame count, dims, and per-frame pixel sums are all
  // oracle-predicted. All means in integer micros.
  private val q32Sql =
    """SELECT kind, format, count(*) AS n,
       sum(n_bytes)::BIGINT AS bytes_total,
       round(avg(width), 4) AS width_avg,
       (sum(mean_byte_micro) // count(*))::BIGINT AS mean_byte_micro_avg
       FROM (SELECT
         CASE WHEN doc_id % 2 = 0 THEN 'image'
              WHEN doc_id % 4 = 1 THEN 'audio' ELSE 'video' END AS kind,
         CASE WHEN doc_id % 2 = 0 THEN 'png'
              WHEN doc_id % 4 = 1 THEN 'wav' ELSE 'gif' END AS format,
         CASE WHEN doc_id % 2 = 0
              THEN (1 + n_chars % 64) * (1 + n_chars % 48)
              WHEN doc_id % 4 = 1 THEN 1 + n_chars % 2048
              ELSE (1 + n_chars % 32) * (1 + n_chars % 24)
                * (1 + n_chars % 12) END AS n_bytes,
         CASE WHEN doc_id % 2 = 0 THEN 1 + n_chars % 64
              WHEN doc_id % 4 = 1 THEN 1
              ELSE 1 + n_chars % 32 END AS width,
         CASE WHEN doc_id % 2 = 0 THEN
             (1000000 * (1 + n_chars % 48)
                * list_sum(list_transform(range(0, (1 + n_chars % 64)::INT),
                    x -> (doc_id + x) % 256))::BIGINT)
               // ((1 + n_chars % 64) * (1 + n_chars % 48))
           WHEN doc_id % 4 = 1 THEN
             (1000000 * list_sum(list_transform(
                  range(0, (1 + n_chars % 2048)::INT),
                  i -> (doc_id + i) % 256))::BIGINT)
               // (1 + n_chars % 2048)
           ELSE
             (1000000 * (1 + n_chars % 24)
                * list_sum(list_transform(range(0, (1 + n_chars % 12)::INT),
                    f -> list_sum(list_transform(
                      range(0, (1 + n_chars % 32)::INT),
                      x -> (doc_id + f + x) % 256))))::BIGINT)
               // ((1 + n_chars % 32) * (1 + n_chars % 24)
                  * (1 + n_chars % 12))
         END AS mean_byte_micro
       FROM documents) t
       GROUP BY kind, format ORDER BY kind, format"""

  // ---- q33: frame sampling → per-doc sampled frame counts --------------------
  private val FrameBytes = 32
  private val EveryK = 4
  private def q33(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    frameSample(mediaTable(s, d).filter(col("kind") === "video"),
        FrameBytes, EveryK).toDF()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("media"))).as("sampled_bytes"))
      .orderBy(col("doc_id"))
  }
  // Video rows are animated GIFs, so the sampled frames are GENUINE
  // decodes: F = 1 + n_chars % 12 frames per doc, indices 0, K, 2K, …
  // survive, and each sampled frame's payload is its decoded w·h
  // grayscale pixels — the engine must parse the real container to
  // reproduce both columns.
  private val q33Sql =
    s"""SELECT doc_id,
         ((1 + n_chars % 12 + $EveryK - 1) // $EveryK)::BIGINT AS n_frames,
         (((1 + n_chars % 12 + $EveryK - 1) // $EveryK)
           * (1 + n_chars % 32) * (1 + n_chars % 24))::BIGINT
           AS sampled_bytes
       FROM documents WHERE doc_id % 4 = 3 ORDER BY doc_id"""

  // ---- q275: windowed energy of the decoded audio streams ---------------------
  // Audio rows are real RIFF/PCM WAVs with sample(i) = (doc_id + i) % 256,
  // so the oracle predicts every window's exact energy from the
  // generative parameters — the engine must genuinely parse the
  // container and decode the frames to reproduce the table.
  private val WindowSamples = 256
  private def q275(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    audioEnergy(mediaTable(s, d).filter(col("kind") === "audio"),
        WindowSamples).toDF()
      .orderBy(col("doc_id"), col("window_idx"))
  }
  private val q275Sql =
    s"""WITH a AS (
         SELECT doc_id, (1 + n_chars % 2048)::BIGINT AS n FROM documents
         WHERE doc_id % 4 = 1),
       w AS (
         SELECT doc_id, n,
           unnest(range(0, ((n + ${WindowSamples - 1}) // $WindowSamples)::INT))::BIGINT
             AS window_idx
         FROM a)
       SELECT doc_id, window_idx,
         (least(n, (window_idx + 1) * $WindowSamples)
           - window_idx * $WindowSamples)::BIGINT AS n_samples,
         list_sum(list_transform(
           range((window_idx * $WindowSamples)::INT,
             least(n, (window_idx + 1) * $WindowSamples)::INT),
           i -> ((doc_id + i) % 256 - 128) * ((doc_id + i) % 256 - 128)))::BIGINT
           AS energy
       FROM w ORDER BY doc_id, window_idx"""

  // ---- q339: resize every decodable image, then decode what came out ----------
  // The resized payloads are REAL PNG containers at the target
  // resolution: decodeMeta must parse them back to (8, 6, 48 decoded
  // bytes, format png) for every image/video row — a genuine
  // decode → rescale → re-encode → decode round trip. Pixel values are
  // interpolator-specific and deliberately NOT asserted here (the spec
  // pins their invariants); the oracle pins everything structural.
  private def q339(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    decode(resizeImages(
        mediaTable(s, d).filter(col("kind") =!= "audio"), 8, 6)).toDF()
      .groupBy(col("kind"), col("format"), col("width"), col("height"),
        col("n_bytes"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("kind"))
  }
  private val q339Sql =
    """SELECT CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS kind,
         'png' AS format, 8::INT AS width, 6::INT AS height,
         48::BIGINT AS n_bytes, count(*) AS n
       FROM documents WHERE doc_id % 2 = 0 OR doc_id % 4 = 3
       GROUP BY 1 ORDER BY kind"""

  // ---- q346: perceptual-hash collision report over the image corpus -----------
  // dHash every REAL PNG (decode → 8×8 lattice → 56-bit pack) and report
  // the biggest hash-collision clusters — the image near-dup readout.
  // The oracle predicts each hash from the generative parameters
  // (pixel(x,·) = (doc_id + x) % 256, y-independent, so every lattice
  // row carries the same 7-bit pattern and the 56-bit hash is
  // rowpat · Σ_{j<8} 2^{7j} = rowpat · 567382630219905): the engine must
  // round-trip a genuine PNG decode to reproduce the histogram.
  private def q346(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    imageDHashes(mediaTable(s, d).filter(col("kind") === lit("image"))
        .as[MediaRow])
      .toDF("doc_id", "dhash")
      .groupBy(col("dhash")).agg(count(lit(1)).as("n_images"))
      .orderBy(col("n_images").desc, col("dhash"))
      .limit(25)
  }
  private val q346Sql =
    """WITH img AS (
         SELECT doc_id, 1 + n_chars % 64 AS w
         FROM documents WHERE doc_id % 2 = 0),
       bits AS (
         SELECT doc_id,
           sum(CASE WHEN (doc_id + ((i.i + 1) * (w - 1)) // 7) % 256
                  > (doc_id + (i.i * (w - 1)) // 7) % 256
                THEN (1::BIGINT << i.i) ELSE 0 END)::BIGINT AS rowpat
         FROM img CROSS JOIN (SELECT unnest(range(7)) AS i) i
         GROUP BY doc_id),
       hashes AS (
         SELECT doc_id, (rowpat * 567382630219905)::BIGINT AS dhash
         FROM bits)
       SELECT dhash, count(*)::BIGINT AS n_images FROM hashes
       GROUP BY dhash ORDER BY n_images DESC, dhash LIMIT 25"""

  // ---- q351: perceptual (Hamming) image near-dup over banded dHashes ----------
  // The missing read-out of q346: not just exact hash collisions but
  // pairs within a Hamming ball — dHash every REAL PNG of an XY-gradient
  // corpus (y-dependent pixels so hashes genuinely spread; see
  // [[MediaCodec.synthPngXY]]), then the banded pigeonhole join
  // ([[Dedup.hammingPairs]], 8 bands x 7 bits — EXACT for radius <= 7).
  // The oracle predicts every hash bit from the generative parameters
  // (pixel(x,y) = (doc_id + x + 7y) mod 256 at the exact lattice
  // positions) and computes the all-pairs Hamming relation in SQL: the
  // engine must round-trip genuine PNG decodes AND its banded join must
  // reproduce the full <= 7 ball, not just band-collision candidates.
  // doc_id < 4096 bounds the oracle's quadratic check (the ENGINE path
  // stays banded at any corpus size).
  private def q351(s: SparkSession, d: String): DataFrame =
    Dedup.hammingPairs(xyHashes(s, d), "doc_id", "dhash",
        bands = 8, bandBits = 7, maxHamming = 7)
      .groupBy(col("hamming")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("hamming"))
  private lazy val q351Sql =
    s"""WITH $xyBitsCtes,
       pairs AS (
         SELECT bit_count(xor(a.dhash, b.dhash))::BIGINT AS hamming
         FROM bits a JOIN bits b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.dhash, b.dhash)) <= 7)
       SELECT hamming, count(*)::BIGINT AS n_pairs
       FROM pairs GROUP BY hamming ORDER BY hamming"""

  // ---- q353: perceptual image DUP CLUSTERS (pairs closed transitively) --------
  // The q351 Hamming ball read as dedup families: banded pairs →
  // min-label fixpoint ([[Dedup.dedupClusters]]) → community size table.
  // "How many distinct images does the corpus really contain" — the
  // actionable form of a near-dup report. Oracle: predicted-hash pairs
  // closed with a recursive reach CTE, min reachable id per node (the
  // q60/q289 closure discipline).
  private def q353(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.hammingPairs(xyHashes(s, d), "doc_id", "dhash",
      bands = 8, bandBits = 7, maxHamming = 7)
    Dedup.dedupClusters(pairs, "d1", "d2")
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("n_members"))
      .orderBy(col("n_members").desc, col("cluster_id"))
      .limit(25)
  }
  /** The q351 XY-gradient dHash fixture (shared by q351/q353). */
  private def xyHashes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val imgs = Tables.documents(s, d)
      .filter(col("doc_id") % 2 === 0 && col("doc_id") < 4096)
      .select(col("doc_id"), col("n_chars"))
      // spread the PNG encode+decode over every core (see [[mediaTable]])
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        MediaRow(id, "image", MediaCodec.synthPngXY(id, nChars)) })
    imageDHashes(imgs).toDF("doc_id", "dhash")
  }
  private val xyBitsCtes =
    """img AS (
         SELECT doc_id, 1 + n_chars % 64 AS w, 1 + n_chars % 48 AS h
         FROM documents WHERE doc_id % 2 = 0 AND doc_id < 4096),
       bits AS (
         SELECT doc_id,
           sum(CASE WHEN (doc_id + ((i.i + 1) * (w - 1)) // 7
                  + 7 * ((j.j * (h - 1)) // 7)) % 256
                > (doc_id + (i.i * (w - 1)) // 7
                  + 7 * ((j.j * (h - 1)) // 7)) % 256
              THEN (1::BIGINT << (j.j * 7 + i.i)) ELSE 0 END)::BIGINT
             AS dhash
         FROM img
         CROSS JOIN (SELECT unnest(range(8)) AS j) j
         CROSS JOIN (SELECT unnest(range(7)) AS i) i
         GROUP BY doc_id)"""
  private val q353Sql =
    s"""WITH RECURSIVE $xyBitsCtes,
       dup AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2
         FROM bits a JOIN bits b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.dhash, b.dhash)) <= 7),
       edges AS (SELECT d1 AS a, d2 AS b FROM dup
                 UNION SELECT d2, d1 FROM dup),
       reach(a, b) AS (
         SELECT a, b FROM edges
         UNION
         SELECT reach.a, e.b FROM reach JOIN edges e ON reach.b = e.a),
       clusters AS (
         SELECT a AS doc_id, least(a, min(b)) AS cluster_id
         FROM reach GROUP BY a)
       SELECT cluster_id, count(*)::BIGINT AS n_members
       FROM clusters GROUP BY 1
       ORDER BY n_members DESC, cluster_id LIMIT 25"""

  // ---- q368: DCT perceptual-hash (pHash) near-dup over the XY corpus ----------
  // pHash every REAL PNG of the XY-gradient corpus (decode → 32×32 exact
  // lattice → integer 8×8 DCT-II low band → median threshold → 63-bit
  // pack) and histogram the Hamming ball via the same banded pigeonhole
  // join as q351 (9 bands × 7 bits — EXACT for radius ≤ 8). The oracle
  // predicts every sampled pixel from the generative parameters and
  // recomputes the integer DCT with the ENGINE'S OWN quantized basis
  // table interpolated as a SQL literal (see [[MediaCodec.PHashTab]]),
  // so the whole hash is cross-engine integer-exact. doc_id < 1024
  // bounds the oracle's 33M-term DCT + quadratic Hamming check (the
  // ENGINE path stays map-side + banded at any corpus size).
  private def q368(s: SparkSession, d: String): DataFrame =
    Dedup.hammingPairs(pxyHashes(s, d), "doc_id", "phash",
        bands = 9, bandBits = 7, maxHamming = 8)
      .groupBy(col("hamming")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("hamming"))
  /** The q368 XY-gradient pHash fixture (q351's corpus, tighter bound). */
  private def pxyHashes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val imgs = Tables.documents(s, d)
      .filter(col("doc_id") % 2 === 0 && col("doc_id") < 1024)
      .select(col("doc_id"), col("n_chars"))
      // spread the PNG encode+decode over every core (see [[mediaTable]])
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        MediaRow(id, "image", MediaCodec.synthPngXY(id, nChars)) })
    imagePHashes(imgs).toDF("doc_id", "phash")
  }
  private lazy val q368Sql =
    s"""WITH imgs AS (
         SELECT doc_id, 1 + n_chars % 64 AS w, 1 + n_chars % 48 AS h
         FROM documents WHERE doc_id % 2 = 0 AND doc_id < 1024),
       tab AS (SELECT ${MediaCodec.PHashTab.mkString("[", ", ", "]")}::BIGINT[] AS t),
       uv AS (
         SELECT u.u, v.v
         FROM (SELECT unnest(range(8)) AS u) u
         CROSS JOIN (SELECT unnest(range(8)) AS v) v
         WHERE NOT (u.u = 0 AND v.v = 0)),
       coeffs AS (
         SELECT doc_id, uv.u, uv.v,
           list_sum(list_transform(range(1024), s ->
             ((doc_id + ((s % 32) * (w - 1)) // 31
                + 7 * (((s // 32) * (h - 1)) // 31)) % 256)
             * t[(uv.u * 32 + (s % 32) + 1)::INT]
             * t[(uv.v * 32 + (s // 32) + 1)::INT]))::BIGINT AS c
         FROM imgs CROSS JOIN tab CROSS JOIN uv),
       med AS (
         SELECT doc_id, quantile_disc(c, 0.5) AS m
         FROM coeffs GROUP BY doc_id),
       hashes AS (
         SELECT c.doc_id,
           sum(CASE WHEN c.c > m.m
               THEN (1::BIGINT << (c.u * 8 + c.v - 1)::INT)
               ELSE 0 END)::BIGINT AS phash
         FROM coeffs c JOIN med m ON c.doc_id = m.doc_id
         GROUP BY c.doc_id),
       pairs AS (
         SELECT bit_count(xor(a.phash, b.phash))::BIGINT AS hamming
         FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.phash, b.phash)) <= 8)
       SELECT hamming, count(*)::BIGINT AS n_pairs
       FROM pairs GROUP BY hamming ORDER BY hamming"""

  // ---- q354: audio near-dup via banded Hamming over PCM fingerprints ----------
  // The second modality through the SAME banded join as q351: genuine
  // WAV decodes → windowed-energy difference fingerprints → 7x8 banded
  // pigeonhole pairs at radius 6 (< bands, so EXACT). The oracle
  // predicts every window energy from the generative PCM formula
  // (sample(i) = (doc_id + i) % 256), packs the bits in SQL, and
  // computes the all-pairs Hamming relation — the engine must parse the
  // real RIFF container to reproduce the histogram.
  private val FpWindow = 16
  private def q354(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fps = audioFingerprints(
        mediaTable(s, d).filter(col("kind") === "audio"), FpWindow)
      .toDF("doc_id", "fp")
    Dedup.hammingPairs(fps, "doc_id", "fp",
        bands = 7, bandBits = 8, maxHamming = 6)
      .groupBy(col("hamming")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("hamming"))
  }
  private val q354Sql =
    s"""WITH au AS (
         SELECT doc_id, (1 + n_chars % 2048)::BIGINT AS n
         FROM documents WHERE doc_id % 4 = 1),
       en AS (
         SELECT a.doc_id, w.w,
           list_sum(list_transform(
             range((w.w * $FpWindow)::INT,
               least(a.n, (w.w + 1) * $FpWindow)::INT),
             i -> ((a.doc_id + i) % 256 - 128)
                * ((a.doc_id + i) % 256 - 128)))::BIGINT AS e
         FROM au a
         CROSS JOIN (SELECT unnest(range(0, 128)) AS w) w
         WHERE w.w * $FpWindow < a.n),
       bitsrc AS (
         SELECT e1.doc_id,
           CASE WHEN e2.e > e1.e THEN (1::BIGINT << e1.w::INT)
                ELSE 0 END AS b
         FROM en e1 JOIN en e2
           ON e1.doc_id = e2.doc_id AND e2.w = e1.w + 1
         WHERE e1.w < 56),
       fps AS (
         SELECT a.doc_id, coalesce(sum(b.b), 0)::BIGINT AS fp
         FROM au a LEFT JOIN bitsrc b ON a.doc_id = b.doc_id
         GROUP BY a.doc_id),
       pairs AS (
         SELECT bit_count(xor(a.fp, b.fp))::BIGINT AS hamming
         FROM fps a JOIN fps b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.fp, b.fp)) <= 6)
       SELECT hamming, count(*)::BIGINT AS n_pairs
       FROM pairs GROUP BY hamming ORDER BY hamming"""

  /** Per-frame dHashes of every GIF in the set — map-side (container
    * parse + per-frame lattice hash inside the partition iterator, zero
    * shuffle); the per-frame primitive [[Dedup.itemContainmentPairs]]
    * consumes for video near-dup.
    */
  def gifFrameHashes(media: Dataset[MediaRow],
      grid: Int = 8): Dataset[(Long, Long, Long)] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(MediaCodec.gifFrameDHashes(_, grid)))
  }

  // ---- q355: video near-dup via frame-hash set containment --------------------
  // The third modality: every GIF frame genuinely decoded and dHashed,
  // then documents paired by DISTINCT-frame-hash containment
  // (|A∩B| / min|A|,|B| — the asymmetric measure that catches a clip
  // embedded in a longer one). Oracle: the generative frames are
  // y-constant, so each frame's 56-bit hash is its 7-bit row pattern
  // times 567382630219905 (the q346 identity) — predicted per (doc,
  // frame) in SQL, deduplicated, intersected all-pairs. The engine must
  // parse real multi-frame containers to reproduce the histogram; its
  // pair join shuffles only frame-hash values, never a doc cross join.
  private def q355(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fh = gifFrameHashes(mediaTable(s, d).filter(col("kind") === "video"))
      .toDF("doc_id", "frame_idx", "fhash")
    Dedup.itemContainmentPairs(fh, "doc_id", "fhash")
      .groupBy(col("containment_micro")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("containment_micro"))
  }
  private val q355Sql =
    """WITH vid AS (
         SELECT doc_id, 1 + n_chars % 12 AS fcnt, 1 + n_chars % 32 AS w
         FROM documents WHERE doc_id % 4 = 3),
       fh0 AS (
         SELECT v.doc_id, f.f,
           (sum(CASE WHEN (v.doc_id + f.f + ((i.i + 1) * (v.w - 1)) // 7) % 256
                  > (v.doc_id + f.f + (i.i * (v.w - 1)) // 7) % 256
                THEN (1::BIGINT << i.i) ELSE 0 END)
             * 567382630219905)::BIGINT AS fhash
         FROM vid v
         CROSS JOIN (SELECT unnest(range(12)) AS f) f
         CROSS JOIN (SELECT unnest(range(7)) AS i) i
         WHERE f.f < v.fcnt
         GROUP BY v.doc_id, f.f),
       fh AS (SELECT DISTINCT doc_id, fhash FROM fh0),
       sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM fh GROUP BY 1),
       inter AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2, count(*)::BIGINT AS inter
         FROM fh a JOIN fh b ON a.fhash = b.fhash AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       pairs AS (
         SELECT (inter * 1000000 // least(s1.n, s2.n))::BIGINT
           AS containment_micro
         FROM inter JOIN sz s1 ON d1 = s1.doc_id
                    JOIN sz s2 ON d2 = s2.doc_id)
       SELECT containment_micro, count(*)::BIGINT AS n_pairs
       FROM pairs GROUP BY 1 ORDER BY 1"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q32_media_decode", q32, Some(q32Sql)),
    QueryDef("q33_media_frames", q33, Some(q33Sql)),
    QueryDef("q275_audio_energy", q275, Some(q275Sql)),
    QueryDef("q339_image_resize", q339, Some(q339Sql)),
    QueryDef("q346_image_dhash", q346, Some(q346Sql)),
    QueryDef("q351_image_neardup", q351, Some(q351Sql)),
    QueryDef("q353_image_dup_clusters", q353, Some(q353Sql)),
    QueryDef("q354_audio_neardup", q354, Some(q354Sql)),
    QueryDef("q368_phash_neardup", q368, Some(q368Sql)),
    QueryDef("q355_video_neardup", q355, Some(q355Sql)))
}
