package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The Y4M container codec the oracle cannot see into: byte-exact
  * losslessness under fuzz, header strictness, and the exact stream
  * layout the public yuv4mpeg format mandates. */
class Y4mCodecSpec extends AnyFunSuite {

  test("round trip is byte-exact for random frames and geometries") {
    val rnd = new scala.util.Random(14)
    (0 until 50).foreach { _ =>
      val w = 1 + rnd.nextInt(32)
      val h = 1 + rnd.nextInt(32)
      val n = rnd.nextInt(5)
      val frames = Seq.fill(n) {
        val f = new Array[Byte](w * h)
        rnd.nextBytes(f)
        f
      }
      val (dw, dh, dec) = Y4mCodec.decode(Y4mCodec.encode(w, h, frames))
      assert((dw, dh) == (w, h))
      assert(dec.size == n)
      frames.zip(dec).foreach { case (a, b) => assert(a.sameElements(b)) }
    }
  }

  test("stream layout matches the public format") {
    val bytes = Y4mCodec.encode(2, 2, Seq(Array[Byte](1, 2, 3, 4)))
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(s.startsWith("YUV4MPEG2 W2 H2 F25:1 Ip A1:1 Cmono\n"))
    assert(s.contains("FRAME\n"))
    assert(bytes.takeRight(4).toSeq == Seq[Byte](1, 2, 3, 4))
  }

  test("decoder refuses bad magic, geometry, chroma, and truncation") {
    val good = Y4mCodec.encode(4, 4, Seq(new Array[Byte](16)))
    intercept[IllegalArgumentException](
      Y4mCodec.decode("MPEG4 W4 H4\ngarbage".getBytes))
    intercept[IllegalArgumentException](
      Y4mCodec.decode("YUV4MPEG2 W4 F25:1\n".getBytes))
    intercept[IllegalArgumentException](
      Y4mCodec.decode("YUV4MPEG2 W4 H4 C420jpeg\nFRAME\n0123456789abcdef".getBytes))
    intercept[IllegalArgumentException](
      Y4mCodec.decode(good.dropRight(1))) // truncated luma plane
    // adversarial geometry: W*H overflows Int to 0 (65536²) or goes
    // negative (46341²) — must refuse on the Long-checked bound, not
    // loop over zero-length "frames" or throw raw copyOfRange errors
    intercept[IllegalArgumentException](
      Y4mCodec.decode("YUV4MPEG2 W65536 H65536 Cmono\nFRAME\nxx".getBytes))
    intercept[IllegalArgumentException](
      Y4mCodec.decode("YUV4MPEG2 W46341 H46341 Cmono\nFRAME\nxx".getBytes))
  }

  test("videoRoundTrip: frame count and stats reconstruct from the bytes") {
    // the SHARED test session, never a bare builder().getOrCreate():
    // suites run in parallel, and if this suite won the session race
    // its extension-less config poisoned every later lake SQL test —
    // `_row_id` metadata reads need LakeSqlExtensions' substitution
    // rule and failed with a spurious missing-column error (round 15)
    val spark = graft.lake.LakeSuite.spark
    import spark.implicits._
    val blobs = Seq(
      0L -> Array.empty[Byte],                     // 1 zero frame
      1L -> Array.fill(100)(7.toByte),             // 1 padded frame
      2L -> Array.tabulate(600)(i => (i % 251).toByte), // 3 frames
      3L -> Array.fill(5000)(9.toByte))            // capped at 4 frames
    val df = blobs.toDF("doc_id", "blob")
    val out = MultimodalDecode.videoRoundTrip(df).collect()
      .map(m => m.doc_id -> m).toMap
    assert(out(0L).n_frames == 1 && out(0L).y_sum == 0 && out(0L).y_max == 0)
    assert(out(1L).n_frames == 1 && out(1L).y_sum == 700 && out(1L).y_max == 7)
    assert(out(2L).n_frames == 3 &&
      out(2L).y_sum == (0 until 600).map(_ % 251).sum)
    assert(out(3L).n_frames == 4 && out(3L).y_sum == 9L * 1024)
    assert(out.values.forall(m => m.width == 16 && m.height == 16))
  }
}
