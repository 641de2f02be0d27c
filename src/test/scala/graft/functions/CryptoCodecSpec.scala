package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Known-answer + roundtrip tests for the native crypto/codec expressions
  * (sha3, punycode, gzip/zlib, aes) — evaluated THROUGH Spark so codegen
  * paths run, with NIST / RFC reference vectors as ground truth.
  */
class CryptoCodecSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.cast("string")).as[String].head()

  test("sha3 matches the NIST example vectors") {
    // FIPS 202 example values for the empty string and "abc"
    assert(one(Vrl.sha3Hex(lit(""), 256)) ==
      "a7ffc6f8bf1ed76651c14756a061d662f580ff4de43b49fa82d80a4b80f8434a")
    assert(one(Vrl.sha3Hex(lit("abc"), 256)) ==
      "3a985da74fe225b2045c172d6bd390bd855f086e3e9d525b46bfe24511431532")
    assert(one(Vrl.sha3Hex(lit("abc"), 512)) ==
      "b751850b1a57168a5693cd924b6b096e08f621827444f70d884f5d0240d2712e" +
      "10e116e9192af3c91a7ec57647e3934057340b4cf408d5a56592f8274eec53f0")
  }

  test("punycode encodes IDN domains to xn-- form and back") {
    assert(one(Vrl.encodePunycode(lit("bücher.example"))) == "xn--bcher-kva.example")
    assert(one(Vrl.decodePunycode(lit("xn--bcher-kva.example"))) == "bücher.example")
    assert(one(Vrl.encodePunycode(lit("example.com"))) == "example.com") // ascii passthrough
  }

  test("gzip/zlib roundtrip unicode and empty payloads; zlib is tighter") {
    val s = "καλημέρα — log line κόσμε ✓ " * 20
    val df = Seq(s, "").toDF("t")
    val got = df.select(
      Vrl.decodeGzip(Vrl.encodeGzip(col("t"))).as("g"),
      Vrl.decodeZlib(Vrl.encodeZlib(col("t"))).as("z"),
      length(Vrl.encodeZlib(col("t"))).as("zl"),
      length(Vrl.encodeGzip(col("t"))).as("gl"))
      .as[(String, String, Int, Int)].collect()
    assert(got(0)._1 == s && got(0)._2 == s)
    assert(got(1)._1 == "" && got(1)._2 == "")
    got.foreach { case (_, _, zl, gl) => assert(zl < gl) } // no gzip header/trailer
  }

  test("gzip output is byte-deterministic (replay-stable payloads)") {
    val a = Seq("payload").toDF("t").select(hex(Vrl.encodeGzip(col("t")))).as[String].head()
    val b = Seq("payload").toDF("t").select(hex(Vrl.encodeGzip(col("t")))).as[String].head()
    assert(a == b)
  }

  test("aes encrypt/decrypt roundtrips in ECB and CBC-with-IV modes") {
    val key = "0123456789abcdef"
    val df = Seq("secret log line").toDF("t")
    val ecb = df.select(Vrl.decryptAes(Vrl.encryptAes(col("t"), key), key)).as[String].head()
    assert(ecb == "secret log line")
    val iv = lit(Array.fill[Byte](16)(7))
    val cbc = df.select(
      Vrl.decryptAes(Vrl.encryptAes(col("t"), key, "CBC", iv), key, "CBC")).as[String].head()
    assert(cbc == "secret log line")
    // explicit IV → deterministic ciphertext (replayable pipelines)
    val c1 = df.select(hex(Vrl.encryptAes(col("t"), key, "CBC", iv))).as[String].head()
    val c2 = df.select(hex(Vrl.encryptAes(col("t"), key, "CBC", iv))).as[String].head()
    assert(c1 == c2)
  }

  test("parse_bytes handles binary and decimal units, floors fractions") {
    val got = Seq("512B", "1.5KiB", "2MiB", "3GB", "1TiB", "750KB", "junk")
      .toDF("t").select(Vrl.parseBytes(col("t"))).as[Option[Long]].collect()
    assert(got.toSeq == Seq(Some(512L), Some(1536L), Some(2097152L),
      Some(3000000000L), Some(1099511627776L), Some(750000L), None))
  }

  test("parse_bytes rejects malformed interiors (fully anchored match)") {
    val got = Seq("1.5garbageKiB", "12KiBx", "x12KiB", "1.5 KiB", "KiB")
      .toDF("t").select(Vrl.parseBytes(col("t"))).as[Option[Long]].collect()
    assert(got.forall(_.isEmpty), got.toSeq.toString)
  }

  test("zstd/snappy/lz4 roundtrip, shrink repetitive payloads, deterministic") {
    val s = "status=200 method=GET path=/api/v1/items " * 40
    for (codec <- Seq("zstd", "snappy", "lz4")) {
      val df = Seq(s, "", "καλημέρα ✓").toDF("t")
      val got = df.select(
        Vrl.decodeCompressed(Vrl.encodeCompressed(col("t"), codec), codec).as("rt"),
        length(Vrl.encodeCompressed(col("t"), codec)).as("cl"),
        length(col("t")).as("ol")).as[(String, Int, Int)].collect()
      assert(got(0)._1 == s && got(1)._1 == "" && got(2)._1 == "καλημέρα ✓", codec)
      assert(got(0)._2 < got(0)._3, s"$codec did not shrink: ${got(0)}")
      val h1 = df.limit(1).select(hex(Vrl.encodeCompressed(col("t"), codec))).as[String].head()
      val h2 = df.limit(1).select(hex(Vrl.encodeCompressed(col("t"), codec))).as[String].head()
      assert(h1 == h2, s"$codec not deterministic")
    }
  }

  test("compressed frames carry the public magic numbers (interop vectors)") {
    // container formats are externally specified: zstd RFC 8878 magic
    // 28 B5 2F FD (LE), lz4 frame spec magic 04 22 4D 18 (LE); snappy raw
    // block = varint length + literal tag — "hello" → 05 10 68 65 6C 6C 6F
    def hexOf(codec: String) =
      Seq("hello").toDF("t").select(hex(Vrl.encodeCompressed(col("t"), codec)))
        .as[String].head()
    assert(hexOf("zstd").startsWith("28B52FFD"))
    assert(hexOf("lz4").startsWith("04224D18"))
    assert(hexOf("snappy") == "051068656C6C6F")
    assert(hexOf("gzip").startsWith("1F8B08"))
  }

  test("corrupt/truncated payloads decode to NULL, never hang or throw") {
    val garbage = lit("definitely not compressed".getBytes("UTF-8"))
    // zlib stream demanding a preset dictionary (FDICT bit set): inflate()
    // yields 0 bytes forever — the guard must null it out, not busy-loop
    val fdict = lit(Array[Byte](0x78, 0x3F.toByte, 0x01, 0x02, 0x03, 0x04))
    val gzBytes = Seq("a log line " * 10).toDF("t")
      .select(Vrl.encodeGzip(col("t")).as("b")).as[Array[Byte]].head()
    val gzTrunc = lit(gzBytes.take(10))
    val got = Seq(1).toDF("x").select(
      Vrl.decodeGzip(garbage).isNull.as("a"),
      Vrl.decodeZlib(garbage).isNull.as("b"),
      Vrl.decodeZlib(fdict).isNull.as("c"),
      Vrl.decodeGzip(gzTrunc).isNull.as("d"),
      Vrl.decodeZstd(garbage).isNull.as("e"),
      Vrl.decodeSnappy(garbage).isNull.as("f"),
      Vrl.decodeLz4(garbage).isNull.as("g"))
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)].head()
    assert(got == ((true, true, true, true, true, true, true)))
  }

  test("percent codec: cue vectors, set lattice, malformed passthrough, non-ASCII") {
    // cue examples
    assert(Percent.enc("foo bar?") == "foo%20bar%3F")
    assert(Percent.enc("foo \tbar", "CONTROLS") == "foo %09bar")
    assert(Percent.dec("foo%20bar%3F") == "foo bar?")
    // set lattice: '?' enters at PATH, '&' at COMPONENT, '~' only in
    // NON_ALPHANUMERIC and WWW_FORM_URLENCODED
    assert(Percent.enc("a b", "FRAGMENT") == "a%20b")
    assert(Percent.enc("?&~.", "QUERY") == "?&~.")
    assert(Percent.enc("?&~.", "PATH") == "%3F&~.")
    assert(Percent.enc("?&~.", "COMPONENT") == "%3F%26~.")
    assert(Percent.enc("?&~.", "WWW_FORM_URLENCODED") == "%3F%26%7E.")
    assert(Percent.enc("?&~.") == "%3F%26%7E%2E")
    // '+' is data, not space, in the percent codec — both directions
    assert(Percent.enc("a+b", "QUERY") == "a+b")
    assert(Percent.dec("a+b%20c") == "a+b c")
    // malformed % sequences pass through verbatim
    assert(Percent.dec("100%") == "100%")
    assert(Percent.dec("%zz%4") == "%zz%4")
    // non-ASCII bytes always encode (UTF-8 bytewise), and roundtrip
    assert(Percent.enc("é", "CONTROLS") == "%C3%A9")
    assert(Percent.dec("%C3%A9") == "é")
    // column path agrees with the JVM reference
    import spark.implicits._
    val got = Seq("foo bar?", "x é +/").toDF("s").select(
      Vrl.encodePercent(col("s")).as("e"),
      Vrl.decodePercent(Vrl.encodePercent(col("s"))).as("rt"))
      .as[(String, String)].collect()
    assert(got(0) == (("foo%20bar%3F", "foo bar?")))
    assert(got(1)._2 == "x é +/")
  }
}
