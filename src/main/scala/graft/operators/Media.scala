package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary-column) plumbing (SURVEY.md §2.6 north-star surface).
  *
  * Media lives in DataFrames as an opaque `BinaryType` column plus a typed
  * metadata struct — the same envelope discipline as the stream payload. The
  * decode / feature-extract / resize / frame-sample operators below have the
  * REAL Spark plumbing (schema, typed mapPartitions batch shape,
  * partition-preserving execution) with the innermost codec call STUBBED as a
  * deterministic byte-level computation, because no image/audio codec ships
  * in this container. Swapping in a real codec changes only the bodies of
  * `MediaCodec.decode*` — not the operator shape, schema, or distribution.
  *
  * Scale design: all operators are map-side (mapPartitions — one pass, no
  * shuffle, no driver collection); at 100 TB, media decode is embarrassingly
  * parallel and the only cross-row operator (per-format stats) is a tiny
  * aggregation of the already-extracted metadata.
  *
  * The test fixture synthesizes media bytes from `documents.text` (UTF-8
  * encode), so every byte-level result is reproducible by the DuckDB oracle
  * via ord()/string arithmetic — the stub is deterministic, not random.
  */
object Media {

  /** Typed media record entering the pipeline: opaque bytes + claimed kind. */
  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])

  /** Decoded metadata (what a real codec would return). */
  final case class MediaMeta(
      doc_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, mean_byte: Double, format: String)

  /** Extracted features: fixed-width vector per media item. */
  final case class MediaFeatures(doc_id: Long, dim: Int, features: Array[Double])

  /** One sampled frame, keyed by (source doc, frame index). */
  final case class FrameRow(doc_id: Long, frame_idx: Int, kind: String, media: Array[Byte])

  /** The codec seam. Bodies are STUBs: deterministic byte arithmetic in
    * place of a real image/audio library (absent in this container). The
    * signatures and batch shape are the real contract.
    */
  object MediaCodec {
    /** STUB decode: a real impl would parse the container header; the stub
      * derives dimensions from byte statistics deterministically.
      */
    def decodeMeta(m: MediaRow): MediaMeta = {
      val n = m.media.length
      val sum = { var s = 0L; var i = 0; while (i < n) { s += m.media(i) & 0xff; i += 1 }; s }
      val mean = if (n == 0) 0.0 else sum.toDouble / n
      MediaMeta(m.doc_id, m.kind, n.toLong,
        width = 1 + n % 64, height = 1 + n % 48, mean_byte = mean,
        format = if (n % 2 == 0) "png" else "jpg")
    }

    /** STUB feature extraction: 16-bin byte histogram, L1-normalized — the
      * stand-in for an embedding model / spectral features.
      */
    def extractFeatures(m: MediaRow): MediaFeatures = {
      val bins = new Array[Double](16)
      m.media.foreach(b => bins((b & 0xff) / 16) += 1.0)
      val n = math.max(1, m.media.length).toDouble
      MediaFeatures(m.doc_id, 16, bins.map(_ / n))
    }

    /** STUB resize: truncate/zero-pad to the target byte budget (a real impl
      * would re-encode at the target resolution).
      */
    def resize(m: MediaRow, targetBytes: Int): MediaRow =
      m.copy(media = java.util.Arrays.copyOf(m.media, targetBytes))

    /** STUB frame sampling: treat the payload as fixed-size frames and keep
      * every k-th (a real impl would seek keyframes). The frame identity is
      * a (doc_id, frame_idx) struct — NOT an arithmetic doc_id*k+i encoding,
      * which silently aliases across documents once a payload exceeds k
      * frames (unbounded media at 100 TB guarantees that).
      */
    def sampleFrames(m: MediaRow, frameBytes: Int, everyK: Int): Seq[FrameRow] =
      m.media.grouped(frameBytes).zipWithIndex
        .collect { case (f, i) if i % everyK == 0 =>
          FrameRow(m.doc_id, i, m.kind, f)
        }.toSeq
  }

  /** Media table synthesized from documents (bytes = UTF-8 of text). */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
  }

  /** Decode: partition-wise map over typed rows — the mapPartitions batch
    * shape a real vectorized codec binding would use (one codec instance per
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

  // ---- q32: decode → per-format metadata stats -------------------------------
  private def q32(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    decode(mediaTable(s, d)).toDF()
      .groupBy(col("kind"), col("format"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("bytes_total"),
        round(avg(col("width")), 4).as("width_avg"),
        round(avg(col("mean_byte")), 4).as("mean_byte_avg"))
      .orderBy(col("kind"), col("format"))
  }
  // Oracle reproduces the stub arithmetic from the text bytes (ASCII soup →
  // ord == byte; octet_length == length for this fixture, asserted by the
  // n_bytes sum matching).
  private val q32Sql =
    """SELECT kind, format, count(*) AS n,
       sum(n_bytes)::BIGINT AS bytes_total,
       round(avg(width), 4) AS width_avg,
       round(avg(mean_byte), 4) AS mean_byte_avg
       FROM (SELECT
         CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS kind,
         CASE WHEN strlen(text) % 2 = 0 THEN 'png' ELSE 'jpg' END AS format,
         strlen(text) AS n_bytes,
         1 + strlen(text) % 64 AS width,
         list_avg(list_transform(string_split(text, ''), c -> ord(c)::DOUBLE))
           AS mean_byte
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
  // Correlated scalar range + unnest — one row per ACTUAL frame, so there is
  // no fixed frame cap to silently overflow on large payloads.
  private val q33Sql =
    s"""SELECT doc_id, count(*) AS n_frames,
         sum(least($FrameBytes, len - i * $FrameBytes))::BIGINT AS sampled_bytes
       FROM (SELECT doc_id, strlen(text) AS len,
               unnest(range(0, (strlen(text) + $FrameBytes - 1) // $FrameBytes)) AS i
             FROM documents WHERE doc_id % 2 = 1) t
       WHERE i % $EveryK = 0
       GROUP BY doc_id ORDER BY doc_id"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q32_media_decode", q32, Some(q32Sql)),
    QueryDef("q33_media_frames", q33, Some(q33Sql)))
}
