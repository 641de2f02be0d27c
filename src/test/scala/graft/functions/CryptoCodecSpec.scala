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
}
