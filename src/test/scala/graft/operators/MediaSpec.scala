package graft.operators

import graft.SparkSpec
import graft.operators.Media.{decode => mediaDecode, _}

class MediaSpec extends SparkSpec {
  import spark.implicits._

  test("decode preserves row count and derives deterministic metadata") {
    val media = mediaTable(spark, sf)
    val meta = mediaDecode(media)
    assert(meta.count() === media.count())
    val m = meta.filter($"doc_id" === 0).head()
    assert(m.width === 1 + m.n_bytes.toInt % 64)
    assert(m.format === (if (m.n_bytes % 2 == 0) "png" else "jpg"))
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

  test("resize truncates or pads to the byte budget") {
    val m = MediaRow(7L, "image", Array[Byte](1, 2, 3, 4, 5))
    assert(MediaCodec.resize(m, 3).media.toSeq === Seq[Byte](1, 2, 3))
    assert(MediaCodec.resize(m, 8).media.length === 8)
  }

  test("media pipeline stays map-side (no shuffle before the final agg)") {
    val plan = mediaDecode(mediaTable(spark, sf)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode should not shuffle:\n$plan")
  }
}
