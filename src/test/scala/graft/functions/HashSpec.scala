package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Crypto/checksum functions with no DuckDB twin — verified against the
  * JVM reference implementations instead (javax.crypto / java.util.zip).
  */
class HashSpec extends SparkSpec {
  import spark.implicits._

  private val inputs = Seq("", "a", "hello world", "The quick brown fox",
    "unicode: προφίλ ✓", "x" * 1000)

  private def jvmHmac(key: String, msg: String): String = {
    val keyBytes0 = key.getBytes("UTF-8")
    val keyBytes =
      if (keyBytes0.length <= 64) keyBytes0
      else java.security.MessageDigest.getInstance("SHA-256").digest(keyBytes0)
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      if (keyBytes.isEmpty) Array[Byte](0) else keyBytes, "HmacSHA256"))
    mac.doFinal(msg.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("hmac-sha256 (composed sha2 columns) matches javax.crypto.Mac") {
    for (key <- Seq("secret", "k", "K" * 70)) { // incl. key > block size
      val got = inputs.toDF("s")
        .select(col("s"), Vrl.hmacSha256Hex(key, col("s")).as("h"))
        .as[(String, String)].collect().toMap
      inputs.foreach(s => assert(got(s) == jvmHmac(key, s), s"key=$key input=$s"))
    }
  }

  test("crc32 matches java.util.zip.CRC32") {
    val got = inputs.toDF("s")
      .select(col("s"), Vrl.crc32Of(col("s")).as("c"))
      .as[(String, Long)].collect().toMap
    inputs.foreach { s =>
      val ref = new java.util.zip.CRC32
      ref.update(s.getBytes("UTF-8"))
      assert(got(s) == ref.getValue, s"input=$s")
    }
  }

  test("community_id v1 matches the spec's canonical vector and is symmetric") {
    val flows = Seq(
      ("128.232.110.120", "66.35.250.204", 34855, 80, 6),
      ("66.35.250.204", "128.232.110.120", 80, 34855, 6), // reversed direction
      ("10.0.0.1", "10.0.0.2", 1234, 80, 17)
    ).toDF("sip", "dip", "sport", "dport", "proto")
    val got = flows.select(Vrl.communityId(col("sip"), col("dip"),
      col("sport"), col("dport"), col("proto")).as("cid")).as[String].collect()
    // canonical test vector from the public community-id spec
    assert(got(0) == "1:LQU9qZlK+B5F3KDmev6m5PMibrg=")
    assert(got(1) == got(0)) // direction-independent
    assert(got(2) == "1:rMBNUdRdoGkBtgz02Zjj8IU8dN4=")
    // seed participates in the hash
    val seeded = flows.limit(1).select(Vrl.communityId(col("sip"), col("dip"),
      col("sport"), col("dport"), col("proto"), seed = 1)).as[String].head()
    assert(seeded != got(0))
  }

  test("sha512 matches MessageDigest") {
    val got = inputs.toDF("s")
      .select(col("s"), Vrl.sha512Hex(col("s")).as("h"))
      .as[(String, String)].collect().toMap
    inputs.foreach { s =>
      val ref = java.security.MessageDigest.getInstance("SHA-512")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(got(s) == ref, s"input=$s")
    }
  }
}
