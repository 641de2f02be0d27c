package graft.multimodal

/** REAL pure-JVM image codec for the binary Netpbm formats — P5 (PGM,
  * grayscale) and P6 (PPM, RGB) — from the public Netpbm specification:
  * magic, then whitespace-separated decimal width/height/maxval with
  * `#`-comment support, one whitespace byte, then the raw raster
  * (1 byte/sample for maxval ≤ 255). This replaces the image leg of the
  * former all-stub codec boundary (the reference pipeline treats media as
  * opaque payloads; here the image decode is genuine). Audio/video stay
  * behind [[Multimodal.StubCodec]] — no audio/video containers or codec
  * libraries exist in this environment, and a hand-rolled MP3/H.264 would
  * be neither real nor useful.
  *
  * Encoding uses a FIXED-WIDTH header (`P5\n%05d %05d\n255\n` — leading
  * zeros are legal Netpbm decimals) so independent oracles can slice the
  * raster at a constant offset; the decoder is a full spec parser and
  * accepts any conformant header.
  */
object Netpbm {

  /** Fixed encoded header length (both P5 and P6): "Px\n" + "00000 00000\n"
    * + "255\n".
    */
  val HeaderLen: Int = 3 + 12 + 4

  final case class Image(format: String, width: Int, height: Int,
                         maxval: Int, raster: Array[Byte]) {
    /** Grayscale view: P5 raster verbatim; P6 reduced per pixel with the
      * integer BT.601 luma weights (r*299 + g*587 + b*114) / 1000.
      */
    def gray: Array[Byte] = format match {
      case "P5" => raster
      case "P6" =>
        val out = new Array[Byte](width * height)
        var i = 0
        while (i < out.length) {
          val r = raster(3 * i) & 0xff
          val g = raster(3 * i + 1) & 0xff
          val b = raster(3 * i + 2) & 0xff
          out(i) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
          i += 1
        }
        out
    }
  }

  def encodeP5(w: Int, h: Int, raster: Array[Byte]): Array[Byte] =
    encode("P5", w, h, raster, w * h)

  def encodeP6(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] =
    encode("P6", w, h, rgb, 3 * w * h)

  private def encode(magic: String, w: Int, h: Int, raster: Array[Byte],
                     expect: Int): Array[Byte] = {
    require(w > 0 && w <= 99999 && h > 0 && h <= 99999, s"netpbm dims $w x $h")
    require(raster.length == expect, s"raster ${raster.length} != $expect")
    val hdr = f"$magic%s\n$w%05d $h%05d\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](hdr.length + raster.length)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    System.arraycopy(raster, 0, out, hdr.length, raster.length)
    out
  }

  def isNetpbm(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'P' && (b(1) == '5' || b(1) == '6')

  /** Full spec parser. Throws IllegalArgumentException on malformed input
    * (callers' error lanes catch); handles comments and arbitrary
    * whitespace, rejects truncated rasters and maxval > 255 (2-byte
    * samples are out of scope for the pipeline's byte-feature path).
    */
  def decode(b: Array[Byte]): Image = {
    require(isNetpbm(b), "netpbm: bad magic")
    val format = new String(b, 0, 2, "US-ASCII")
    var p = 2
    def isWs(c: Byte) = c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
    def skipWs(): Unit = {
      var more = true
      while (more) {
        while (p < b.length && isWs(b(p))) p += 1
        if (p < b.length && b(p) == '#') { // comment to end of line
          while (p < b.length && b(p) != '\n') p += 1
        } else more = false
      }
    }
    def readInt(): Int = {
      skipWs()
      require(p < b.length && b(p) >= '0' && b(p) <= '9', "netpbm: expected digit")
      var v = 0L
      while (p < b.length && b(p) >= '0' && b(p) <= '9') {
        v = v * 10 + (b(p) - '0'); p += 1
        require(v <= Int.MaxValue, "netpbm: number overflow")
      }
      v.toInt
    }
    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    require(w > 0 && h > 0, "netpbm: non-positive dims")
    require(maxval > 0 && maxval <= 255, "netpbm: unsupported maxval")
    // exactly ONE whitespace byte separates maxval from the raster
    require(p < b.length && isWs(b(p)), "netpbm: missing raster separator")
    p += 1
    val n = (if (format == "P5") 1 else 3) * w * h
    require(b.length - p >= n, "netpbm: truncated raster")
    Image(format, w, h, maxval, java.util.Arrays.copyOfRange(b, p, p + n))
  }
}
