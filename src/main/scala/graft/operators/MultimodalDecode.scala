package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-shaped multimodal decode over an opaque binary column — the
  * Scala analog of a mapInPandas decode stage: rows stream through
  * `mapPartitions` in partition-sized batches, the decoder sees raw
  * bytes, and the output is a typed Dataset.
  *
  * ===== STUB BOUNDARY =====
  * The container ships no image/audio codecs, so [[decodeOne]] is a
  * clearly-marked deterministic fake computed from the bytes (length +
  * first byte). Swapping in a real codec (JPEG header parse, ffprobe,
  * etc.) changes ONLY the body of decodeOne — the schema, partitioning,
  * signature, and batch shape are the real, tested plumbing.
  */
object MultimodalDecode {

  final case class MediaMeta(doc_id: Long, n_bytes: Long, format: String,
      width: Long, height: Long, n_frames: Long)

  private val formats = Array("jpeg", "png", "wav")

  /** STUB: a real decoder would parse `bytes` with a codec here. The
    * fake is pure arithmetic on (length, first byte) so the DuckDB
    * oracle can replicate it and verify the plumbing end-to-end. */
  private def decodeOne(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    val first = if (bytes.isEmpty) 0L else (bytes(0) & 0xFF).toLong
    MediaMeta(
      doc_id = docId,
      n_bytes = n,
      format = formats(((n + first) % 3).toInt),
      width = 32 + (n * 7) % 640,
      height = 32 + (n * 5) % 480,
      n_frames = 1 + first % 4)
  }

  /** df(doc_id: long, blob: binary) → typed decode via mapPartitions. */
  def decode(df: DataFrame): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeOne(id, bytes) })
  }

  /** Corpus entry: documents.text treated as the opaque blob. */
  def decodeDocuments(s: SparkSession, d: String): DataFrame =
    decode(graft.queries.Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("blob")))
      .toDF()
      .orderBy(col("doc_id"))

  /** One row per sampled frame + resize + feature-extract — the full
    * video-style stage chain in one generator-shaped pass:
    * frame-sample is a flatMap (1 row → n_frames rows, the UDTF shape),
    * resize/feature-extract are per-frame arithmetic. Real codecs would
    * seek keyframes / resample pixels / run a vision encoder where the
    * STUB arithmetic stands (same boundary as [[decodeOne]]): `offset`/
    * `frame_bytes` delimit the byte range a demuxer would hand over,
    * `checksum` stands for resampled pixel content, `feat_sum` for an
    * 8-dim feature vector (summed to stay scalar — the driver's compare
    * cannot hash array cells). Everything is deterministic arithmetic
    * on (length, first byte) so the DuckDB oracle replays it exactly. */
  final case class FrameMeta(doc_id: Long, frame_idx: Long, frame_offset: Long,
      frame_bytes: Long, resized_w: Long, resized_h: Long,
      checksum: Long, feat_sum: Long)

  def frameSample(df: DataFrame, targetW: Long, targetH: Long): Dataset[FrameMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val n = bytes.length.toLong
        val first = if (bytes.isEmpty) 0L else (bytes(0) & 0xFF).toLong
        val nFrames = math.max(1L, math.min(1 + first % 4, n)).toInt
        val frameLen = math.max(1L, n / nFrames)
        (0 until nFrames).iterator.map { i =>
          val off = i * frameLen
          val len = if (i == nFrames - 1) n - off else frameLen
          FrameMeta(id, i.toLong, off, len, targetW, targetH,
            checksum = (len * 31 + i * 7) % 1000,
            feat_sum = (0 until 8).map(k => (len * (k + 3)) % 97).sum)
        }
      }
  }

  /** Corpus entry: sample/resize frames of every document blob. */
  def frameDocuments(s: SparkSession, d: String): DataFrame =
    frameSample(graft.queries.Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("blob")), 64L, 64L)
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
}
