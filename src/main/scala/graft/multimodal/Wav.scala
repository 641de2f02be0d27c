package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM audio codec for the RIFF/WAVE PCM format (the public
  * Microsoft/IBM WAVE spec): `RIFF <size> WAVE`, an `fmt ` chunk
  * (PCM tag 1, channels, sample rate, block align, 16 bits/sample), then
  * a `data` chunk of little-endian int16 frames. This crosses the
  * real-codec boundary for the AUDIO leg the way [[Netpbm]] did for
  * images — the byte layout is fixed and public, so no codec library is
  * needed for uncompressed PCM. Video stays behind
  * [[Multimodal.StubCodec]] (every real-world video format is a
  * compressed container; a hand-rolled H.264 would be neither real nor
  * useful).
  *
  * The encoder emits the CANONICAL 44-byte header (fmt chunk first,
  * exactly 16 bytes of fmt payload) so independent oracles can slice
  * samples at a constant offset; the decoder is a spec-conformant chunk
  * WALKER — it skips unknown chunks (LIST/INFO/fact/cue are routine in
  * the wild), honors chunk word-alignment padding, and reads `fmt `
  * wherever it appears before `data`.
  */
object Wav {

  /** Canonical header length: RIFF(12) + fmt(8+16) + data header(8). */
  val HeaderLen: Int = 44

  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Encode 16-bit PCM mono/stereo with the canonical 44-byte header. */
  def encodePcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels >= 1, "bad wav params")
    require(samples.length % channels == 0, "sample count must align to frames")
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(HeaderLen + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Spec-conformant decode: walk chunks, require PCM16, return samples.
    * Throws IllegalArgumentException on non-RIFF/WAVE or missing chunks —
    * callers route malformed payloads to an error lane.
    */
  def decode(payload: Array[Byte]): Audio = {
    require(payload.length >= 12, "short wav")
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); bb.get(riff)
    require(new String(riff, "US-ASCII") == "RIFF", "not RIFF")
    bb.getInt // declared riff size (not trusted; we walk actual bytes)
    val wave = new Array[Byte](4); bb.get(wave)
    require(new String(wave, "US-ASCII") == "WAVE", "not WAVE")
    var rate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    while (bb.remaining() >= 8 && samples == null) {
      val tag = new Array[Byte](4); bb.get(tag)
      val len = bb.getInt
      require(len >= 0 && len <= bb.remaining(), "chunk overruns payload")
      new String(tag, "US-ASCII") match {
        case "fmt " =>
          require(len >= 16, "fmt chunk too short")
          val start = bb.position()
          val fmtTag = bb.getShort
          require(fmtTag == 1, s"not PCM (fmt tag $fmtTag)")
          channels = bb.getShort.toInt
          rate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align (derived)
          bits = bb.getShort.toInt
          require(bits == 16, s"only PCM16 supported, got $bits")
          bb.position(start + len + (len & 1)) // skip extension + pad byte
        case "data" =>
          require(rate > 0, "data chunk before fmt")
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
        case _ =>
          bb.position(bb.position() + len + (len & 1)) // skip + word-align pad
      }
    }
    require(samples != null, "no data chunk")
    Audio(rate, channels, samples)
  }
}
