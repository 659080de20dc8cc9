package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{MultimodalDecode, Salting}

/** Corpus entries for the standalone operators in graft.operators. */
object OperatorQueries {
  import Tables._

  /** Salted two-phase aggregation, oracle-equal to a direct groupBy. */
  def qSaltedAgg(s: SparkSession, d: String): DataFrame =
    Salting.saltedStats(lineitem(s, d), Seq("l_returnflag"), "l_quantity")
      .orderBy(col("l_returnflag"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_salted_agg" -> qSaltedAgg,
    "multimodal_decode" -> ((s, d) => MultimodalDecode.decodeDocuments(s, d)),
    "multimodal_frames" -> ((s, d) => MultimodalDecode.frameDocuments(s, d)),
    "multimodal_png_codec" -> ((s, d) => MultimodalDecode.pngDocuments(s, d)),
    "multimodal_wav_codec" -> ((s, d) => MultimodalDecode.wavDocuments(s, d)),
  )

  val oracles: Map[String, String] = Map(
    // the REAL-codec check: a lossless PNG round-trip must return
    // exactly the source bytes as pixels, so the decoded raster's
    // statistics equal byte statistics computed straight off the text
    // (ASCII corpus: byte i == char i; positions beyond the 16x16
    // canvas are zero-padded)
    "multimodal_png_codec" ->
      """WITH px AS (
        |  SELECT doc_id, ascii(substring(text, i + 1, 1)) AS v
        |  FROM documents, (SELECT unnest(range(least(length(text), 256))) AS i) t
        |), agg AS (
        |  SELECT doc_id, CAST(sum(v) AS BIGINT) AS s, CAST(max(v) AS BIGINT) AS m
        |  FROM px GROUP BY doc_id
        |)
        |-- LEFT JOIN keeps zero-length documents (range(0) unnests to no
        |-- rows; the Spark side still emits an all-zero canvas for them)
        |SELECT d.doc_id, CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
        |  coalesce(agg.s, 0) AS pixel_sum,
        |  coalesce(agg.m, 0) AS pixel_max
        |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    // same losslessness argument for audio: decoded u8 PCM samples must
    // equal the source bytes, format fields come from the parsed header
    "multimodal_wav_codec" ->
      """WITH sm AS (
        |  SELECT doc_id, ascii(substring(text, i + 1, 1)) AS v
        |  FROM documents, (SELECT unnest(range(length(text))) AS i) t
        |), agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS s, CAST(max(v) AS BIGINT) AS m
        |  FROM sm GROUP BY doc_id
        |)
        |-- LEFT JOIN keeps zero-length documents (empty PCM stream)
        |SELECT d.doc_id, CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  coalesce(agg.n, 0) AS n_samples,
        |  coalesce(agg.s, 0) AS sample_sum,
        |  coalesce(agg.m, 0) AS sample_max
        |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_v, count(*) AS n,
        |  min(l_quantity) AS min_v, max(l_quantity) AS max_v
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // replicates the deterministic decode stub's arithmetic exactly —
    // verifies the mapPartitions plumbing end-to-end
    "multimodal_decode" ->
      """SELECT doc_id,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  CASE (octet_length(CAST(text AS BLOB)) + ascii(substring(text, 1, 1))) % 3
        |    WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'wav' END AS format,
        |  32 + (octet_length(CAST(text AS BLOB)) * 7) % 640 AS width,
        |  32 + (octet_length(CAST(text AS BLOB)) * 5) % 480 AS height,
        |  CAST(1 + ascii(substring(text, 1, 1)) % 4 AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    // replays the frame-sample/resize/feature stub arithmetic: lateral
    // range over the per-doc frame count = the flatMap generator shape
    "multimodal_frames" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n,
        |    CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, n,
        |    greatest(1, least(1 + first % 4, n)) AS nf,
        |    greatest(1, n // greatest(1, least(1 + first % 4, n))) AS flen
        |  FROM m
        |), fr AS (
        |  -- "offset" is reserved in DuckDB, hence frame_offset
        |  SELECT doc_id, CAST(i AS BIGINT) AS frame_idx, i * flen AS frame_offset,
        |    CASE WHEN i = nf - 1 THEN n - i * flen ELSE flen END AS frame_bytes
        |  FROM f, (SELECT unnest(range(nf)) AS i) t
        |)
        |SELECT doc_id, frame_idx, frame_offset, frame_bytes,
        |  CAST(64 AS BIGINT) AS resized_w, CAST(64 AS BIGINT) AS resized_h,
        |  (frame_bytes * 31 + frame_idx * 7) % 1000 AS checksum,
        |  CAST(list_sum(list_transform(range(8),
        |    k -> (frame_bytes * (k + 3)) % 97)) AS BIGINT) AS feat_sum
        |FROM fr ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
