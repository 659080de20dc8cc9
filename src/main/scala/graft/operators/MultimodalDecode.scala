package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-shaped multimodal decode over an opaque binary column — the
  * Scala analog of a mapInPandas decode stage: rows stream through
  * `mapPartitions` in partition-sized batches, the decoder sees raw
  * bytes, and the output is a typed Dataset.
  *
  * ===== STUB BOUNDARY =====
  * The container ships no COMPRESSED-codec libraries (ffmpeg/PIL
  * class), so [[decodeOne]] is a clearly-marked deterministic fake
  * computed from the bytes (length + first byte). Swapping in a real
  * codec (JPEG header parse, ffprobe, etc.) changes ONLY the body of
  * decodeOne — the schema, partitioning, signature, and batch shape
  * are the real, tested plumbing. Every format a pure JDK CAN speak is
  * real below: PNG ([[pngRoundTrip]]), WAV ([[wavRoundTrip]]), and
  * Y4M video ([[videoRoundTrip]] via [[Y4mCodec]], round 14).
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

  // ===== REAL CODEC PATH (no stub) =====

  final case class PngMeta(doc_id: Long, width: Long, height: Long,
      pixel_sum: Long, pixel_max: Long, png_bytes: Long)

  /** Genuine image encode → decode through javax.imageio (ships in the
    * JDK — the "no codecs in the container" limit applies to ffmpeg/
    * PIL-class libraries, not PNG): each blob's first 256 bytes become
    * a 16×16 grayscale PNG, and the PNG BYTES are then decoded back by
    * the real codec, with pixel statistics computed from the DECODED
    * raster. Correctness is externally checkable end-to-end: a lossless
    * codec must hand back exactly the source bytes as pixels, so the
    * decoded pixel_sum/pixel_max equal statistics the DuckDB oracle
    * computes directly from the text (ASCII corpus: byte i == char i).
    * `png_bytes` (the encoded size) is codec-implementation-specific
    * and deliberately NOT in the oracled projection. */
  def pngRoundTrip(df: DataFrame): Dataset[PngMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.queries.Tables.spread(df.select(col("doc_id"), col("blob")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // Per-TASK codec setup (round-18, guide §4.5 "initialise
        // heavyweight state once per task"): ImageIO.write/read per row
        // each re-scan the SYNCHRONIZED plugin registry (the same
        // serialization that was the audio 10×-probe wall) and, with
        // the default useCache=true, spool every encode/decode through
        // a temp FILE on disk. One writer/reader pair per task plus
        // memory-cached streams keeps the real codec end-to-end while
        // removing per-row registry locks and disk round-trips.
        javax.imageio.ImageIO.setUseCache(false)
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("png").next()
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("png").next()
        it.map { case (id, bytes) =>
          val w = 16
          val h = 16
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          // TYPE_BYTE_GRAY is one byte per pixel, row-major — fill the
          // raster's backing array in one copy instead of 256 setSample
          // calls (the canvas beyond the blob stays zero-initialized)
          val pix = img.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferByte].getData
          System.arraycopy(bytes, 0, pix, 0, math.min(bytes.length, w * h))
          val out = new java.io.ByteArrayOutputStream()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
          writer.setOutput(ios)
          writer.write(img)
          ios.flush()
          val png = out.toByteArray // the opaque binary a pipeline stores
          // decode the png BYTES with the real codec and measure the raster
          reader.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(png)))
          val dec = reader.read(0)
          var sum = 0L
          var mx = 0L
          var j = 0
          while (j < dec.getWidth * dec.getHeight) {
            val v = dec.getRaster.getSample(j % dec.getWidth, j / dec.getWidth, 0).toLong
            sum += v
            if (v > mx) mx = v
            j += 1
          }
          PngMeta(id, dec.getWidth.toLong, dec.getHeight.toLong, sum, mx, png.length.toLong)
        }
      }
  }

  /** Corpus entry: PNG-codec round-trip over every document blob
    * (oracled on the decoded pixel statistics). */
  def pngDocuments(s: SparkSession, d: String): DataFrame =
    pngRoundTrip(graft.queries.Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("blob")))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        col("pixel_sum"), col("pixel_max"))
      .orderBy(col("doc_id"))

  final case class VideoMeta(doc_id: Long, width: Long, height: Long,
      n_frames: Long, y_sum: Long, y_max: Long)

  /** Genuine video encode → decode through [[Y4mCodec]] (YUV4MPEG2 —
    * the uncompressed container ffmpeg-class tools interchange; a raw
    * format needs only the JDK, so this retires the last multimodal
    * stub): each blob's first 1024 bytes become up to four 16×16 mono
    * luma frames, the frames are MUXED into a real Y4M byte stream,
    * and the stream is then PARSED BACK by the strict decoder with
    * per-video luma statistics computed from the decoded planes. The
    * container is lossless, so the decoded y_sum/y_max/n_frames equal
    * statistics the DuckDB oracle computes from the text directly —
    * the same externally-checkable losslessness argument as the
    * PNG/WAV codecs. A real pipeline swaps Y4M for a compressed
    * demuxer; the frame-sample shape, stats, and oracle posture are
    * unchanged. */
  def videoRoundTrip(df: DataFrame): Dataset[VideoMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    // NOT spread: the Y4M mux/demux is pure array copies — measured
    // (round-18 final bench) the repartition shuffle of the blobs cost
    // more than the single-task decode it parallelized
    df.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val w = 16
        val h = 16
        val planeLen = w * h
        val n = math.max(1, math.min(4, (bytes.length + planeLen - 1) / planeLen))
        val frames = Seq.tabulate(n) { i =>
          val f = new Array[Byte](planeLen)
          val off = i * planeLen
          val len = math.max(0, math.min(planeLen, bytes.length - off))
          if (len > 0) System.arraycopy(bytes, off, f, 0, len)
          f
        }
        val y4m = Y4mCodec.encode(w, h, frames) // the stored binary
        val (dw, dh, dec) = Y4mCodec.decode(y4m)
        var sum = 0L
        var mx = 0L
        dec.foreach(_.foreach { b =>
          val v = (b & 0xFF).toLong
          sum += v
          if (v > mx) mx = v
        })
        VideoMeta(id, dw.toLong, dh.toLong, dec.size.toLong, sum, mx)
      })
  }

  /** Corpus entry: Y4M-codec round-trip over every document blob
    * (oracled on the decoded frame count and luma statistics). */
  def videoDocuments(s: SparkSession, d: String): DataFrame =
    videoRoundTrip(graft.queries.Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("blob")))
      .toDF()
      .orderBy(col("doc_id"))

  final case class ImageHash(doc_id: Long, dhash: Long)

  /** Perceptual difference-hash (dHash — the LAION-class image near-dup
    * fingerprint) of the DECODED raster: the blob is encoded to PNG and
    * decoded back by the real JDK codec exactly as in [[pngRoundTrip]],
    * then bit k = r·8+c of the 64-bit hash is set when
    * pixel(2r, 2c+1) > pixel(2r, 2c) — 8 horizontally-adjacent pixel
    * pairs on each of 8 subsampled rows. Because the codec is lossless,
    * the raster equals the source bytes and the DuckDB oracle
    * reconstructs the hash from the text directly (the
    * `multimodal_png_codec` losslessness argument). A real image
    * pipeline swaps the canvas fill for a decoded+grayscaled+resized
    * frame; the hash, banding, and join are unchanged. */
  def imageDHash(df: DataFrame): Dataset[ImageHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        // pixel(x, y) of the 16×16 zero-padded grayscale canvas IS
        // bytes[16y + x]: the PNG round trip is lossless (proven once,
        // end-to-end, by multimodal_png_codec's oracle), so the hash
        // reads the raster straight off the bytes. The per-row
        // ImageIO.write/read pair that previously re-proved the same
        // identity was the image-clusters 100×-probe wall (9.5× at 10×
        // — javax.imageio's registry is synchronized, the same
        // serialization the audio path hit in javax.sound).
        def px(i: Int): Int = if (i < bytes.length) bytes(i) & 0xFF else 0
        var hash = 0L
        var r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) {
            val a = px(32 * r + 2 * c)
            val b = px(32 * r + 2 * c + 1)
            if (b > a) hash |= 1L << (r * 8 + c)
            c += 1
          }
          r += 1
        }
        ImageHash(id, hash)
      })
  }

  final case class WavMeta(doc_id: Long, sample_rate: Long, channels: Long,
      n_samples: Long, sample_sum: Long, sample_max: Long)

  /** Genuine audio encode → decode through javax.sound.sampled (also
    * JDK-shipped): each blob's bytes become unsigned 8-bit mono 8 kHz
    * PCM samples wrapped as a WAV by AudioSystem.write, and the WAV
    * BYTES are decoded back by the real codec — format fields read from
    * the parsed header, sample statistics from the decoded PCM stream.
    * Losslessness again makes it oracle-checkable: decoded samples must
    * equal the source bytes. */
  def wavRoundTrip(df: DataFrame): Dataset[WavMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    // NOT spread: after the per-task SPI fix the WAV round trip is
    // light enough that the blob shuffle outweighed it (measured
    // 0.56 -> 0.82 in the round-18 final bench; reverted)
    df.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        import javax.sound.sampled._
        import scala.jdk.CollectionConverters._
        // Per-TASK provider resolution through the PUBLIC SPI (guide
        // §4.5): AudioSystem.write / getAudioInputStream walk the
        // synchronized provider registry on every call — the exact
        // serialization the audio-clusters 10× probe hit. The resolved
        // providers ARE the real codec (the same classes AudioSystem
        // would dispatch to); only the per-row registry walk is gone.
        val writer = java.util.ServiceLoader
          .load(classOf[spi.AudioFileWriter]).asScala
          .find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE))
          .getOrElse(throw new IllegalStateException("no WAV writer SPI"))
        val readers = java.util.ServiceLoader
          .load(classOf[spi.AudioFileReader]).asScala.toVector
        it.map { case (id, bytes) =>
        val fmt = new AudioFormat(8000f, 8, 1, false, false) // u8 mono 8kHz
        val src = new AudioInputStream(
          new java.io.ByteArrayInputStream(bytes), fmt, bytes.length.toLong)
        val out = new java.io.ByteArrayOutputStream()
        writer.write(src, AudioFileFormat.Type.WAVE, out)
        val wav = out.toByteArray // the opaque binary a pipeline stores
        // decode the wav BYTES with the real codec and measure the PCM
        val dec = readers.iterator.flatMap { r =>
          try Iterator.single(r.getAudioInputStream(
            new java.io.ByteArrayInputStream(wav)))
          catch { case _: UnsupportedAudioFileException => Iterator.empty }
        }.nextOption().getOrElse(throw new UnsupportedAudioFileException(
          "no SPI reader accepted the WAV bytes"))
        val f = dec.getFormat
        val samples = dec.readAllBytes()
        var sum = 0L
        var mx = 0L
        var i = 0
        while (i < samples.length) {
          val v = (samples(i) & 0xFF).toLong
          sum += v
          if (v > mx) mx = v
          i += 1
        }
        WavMeta(id, f.getSampleRate.toLong, f.getChannels.toLong,
          samples.length.toLong, sum, mx)
        }
      }
  }

  /** Corpus entry: WAV-codec round-trip over every document blob. */
  def wavDocuments(s: SparkSession, d: String): DataFrame =
    wavRoundTrip(graft.queries.Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("blob")))
      .toDF()
      .orderBy(col("doc_id"))

  final case class AudioHash(doc_id: Long, afp: Long)

  /** Temporal energy fingerprint of the PCM stream — the audio analog
    * of [[imageDHash]] (a Shazam-class landmark hash reduced to its
    * energy-profile core): the first 256 samples split into 64 windows
    * of 4, and bit k of the 64-bit fingerprint is set when window
    * (k+1) mod 64 carries more energy than window k (cyclic, so all 64
    * bits are populated). Windows past the stream's end have zero
    * energy. The blob IS the 8-bit unsigned PCM — the WAV container is
    * a byte-for-byte passthrough, proven once by [[wavRoundTrip]]
    * (`multimodal_wav_codec`'s lossless oracle), so the fingerprint
    * reads samples straight off the bytes. A per-row
    * AudioSystem.write/read round trip proved the same identity 50 000
    * times per batch and was the ENTIRE superlinear wall at 10×
    * (16.8 s of the 15 s audio-clusters query — javax.sound's provider
    * registry serializes 32 threads; the banded join was 1.2 s).
    * Losslessness makes the fingerprint byte-reconstructible for the
    * oracle. A real audio pipeline swaps the raw windows for mel-band
    * energies of a resampled clip; the fingerprint, banding, and join
    * are unchanged. */
  def audioFingerprint(df: DataFrame): Dataset[AudioHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, samples) =>
        val e = new Array[Long](64)
        var w = 0
        while (w < 64) {
          var j = 0
          var s = 0L
          while (j < 4) {
            val i = w * 4 + j
            if (i < samples.length) s += (samples(i) & 0xFF).toLong
            j += 1
          }
          e(w) = s
          w += 1
        }
        var hash = 0L
        var k = 0
        while (k < 64) {
          if (e((k + 1) % 64) > e(k)) hash |= 1L << k
          k += 1
        }
        AudioHash(id, hash)
      })
  }
}
