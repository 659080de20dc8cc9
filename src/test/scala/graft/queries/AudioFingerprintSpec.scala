package graft.queries

import org.apache.spark.sql.functions._
import graft.lake.LakeSuite
import graft.operators.MultimodalDecode

/** Pins the audio energy-fingerprint semantics the DuckDB oracle does
  * not state explicitly: the cyclic bit layout through the REAL WAV
  * codec round-trip, and the shared pair-budget refusal. */
class AudioFingerprintSpec extends LakeSuite {

  private def fpOf(texts: (Long, String)*): Map[Long, Long] = {
    val df = spark.createDataFrame(texts).toDF("doc_id", "t")
      .select(col("doc_id"), col("t").cast("binary").as("blob"))
    MultimodalDecode.audioFingerprint(df).collect()
      .map(h => h.doc_id -> h.afp).toMap
  }

  test("cyclic energy-comparison bit layout survives the WAV round-trip") {
    // "aaaabbbb": window 0 energy 4*97, window 1 energy 4*98, the
    // other 62 windows zero. bit 0 (e1 > e0) and bit 63 (cyclic:
    // e0 > e63=0) are the ONLY set bits — a lossy codec, a header
    // offset slip, or a broken cyclic wrap would change the value.
    val h = fpOf(1L -> "aaaabbbb", 2L -> "bbbbaaaa", 3L -> "aaaabbbb")
    assert(h(1L) == (1L | (1L << 63)), s"got ${h(1L).toHexString}")
    // reversed windows: e0 > e1, so bit 0 clear; bit 1 set? e2=0 is
    // not > e1=388... only the cyclic bit 63 (e0=392 > 0) remains
    assert(h(2L) == (1L << 63), s"got ${h(2L).toHexString}")
    assert(h(3L) == h(1L), "equal bytes must fingerprint equal")
    // silence (empty stream): all windows zero, no strict inequality
    assert(fpOf(4L -> "")(4L) == 0L)
  }

  test("audio pair-budget gate refuses past the budget") {
    val d = "/root/testdata/sf0.001"
    spark.conf.set("graft.audioDedup.pairBudget", "1")
    val e = intercept[IllegalStateException] {
      OperatorQueries.qAudioFingerprintDedup(spark, d).count()
    }
    assert(e.getMessage.contains("audio_fingerprint_dedup"))
    spark.conf.unset("graft.audioDedup.pairBudget")
  }
}
