package graft.queries

import org.apache.spark.sql.functions._
import graft.lake.LakeSuite
import graft.operators.MultimodalDecode

/** Pins the perceptual-hash semantics the DuckDB oracle (which fixes
  * the exact pair set) does not state explicitly: the bit layout of
  * the dHash through the REAL codec round-trip, and the pair-budget
  * refusal. */
class ImagePhashSpec extends LakeSuite {

  private def hashOf(texts: (Long, String)*): Map[Long, Long] = {
    val df = spark.createDataFrame(texts).toDF("doc_id", "t")
      .select(col("doc_id"), col("t").cast("binary").as("blob"))
    MultimodalDecode.imageDHash(df).collect().map(h => h.doc_id -> h.dhash).toMap
  }

  test("dHash bit layout survives the PNG round-trip exactly") {
    // "ab": pixel(0,0)=97 < pixel(0,1)=98 -> bit 0 set, all other
    // sampled pairs are 0 vs 0 -> the hash is exactly 1. "ba" reverses
    // the comparison -> 0. A lossy codec or a raster/byte order slip
    // would break these exact values.
    val h = hashOf(1L -> "ab", 2L -> "ba", 3L -> "ab", 4L -> "")
    assert(h(1L) == 1L, s"expected bit0 only, got ${h(1L)}")
    assert(h(2L) == 0L)
    assert(h(3L) == h(1L), "equal bytes must hash equal")
    assert(h(4L) == 0L, "empty blob is the all-zero canvas")
  }

  test("bit 63 round-trips (no sign accident in the banded join)") {
    // put an increasing pair at the LAST sampled position: row 7
    // (raster row 14), col pair (14, 15) -> byte indices 238, 239
    val txt = ("x" * 238) + "AZ" // 'A' < 'Z' at indices 238/239
    val h = hashOf(9L -> txt)
    assert((h(9L) & (1L << 63)) != 0L, s"bit 63 not set: ${h(9L)}")
  }

  test("pair-budget gate refuses past the budget and is conf-disabled") {
    val d = "/root/testdata/sf0.001"
    spark.conf.set("graft.imageDedup.pairBudget", "1")
    val e = intercept[IllegalStateException] {
      OperatorQueries.qImagePhashDedup(spark, d).count()
    }
    assert(e.getMessage.contains("image_phash_dedup"))
    spark.conf.set("graft.imageDedup.pairBudget", "0")
    try assert(OperatorQueries.qImagePhashDedup(spark, d).count() > 0)
    finally spark.conf.unset("graft.imageDedup.pairBudget")
  }
}
