package graft.enrich

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** A minimal MaxMind-DB WRITER built from the public file-format spec
  * (independent of the reader under test): binary trie → node records →
  * data section → metadata map. Validates [[Mmdb]] end-to-end: point
  * lookups, whole-tree extraction, and the broadcast CIDR-enrich path.
  */
object MmdbWriter {

  // ---- data-section encoders ----
  def str(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    require(b.length < 29)
    Array(((2 << 5) | b.length).toByte) ++ b
  }
  def u16(v: Int): Array[Byte] =
    if (v == 0) Array(((5 << 5) | 0).toByte)
    else if (v < 256) Array(((5 << 5) | 1).toByte, v.toByte)
    else Array(((5 << 5) | 2).toByte, (v >> 8).toByte, v.toByte)
  def u32(v: Long): Array[Byte] = {
    val payload = BigInt(v).toByteArray.dropWhile(_ == 0)
    Array(((6 << 5) | payload.length).toByte) ++ payload
  }
  def dbl(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    Array(((3 << 5) | 8).toByte) ++ (7 to 0 by -1).map(i => (bits >> (8 * i)).toByte)
  }
  def bool(v: Boolean): Array[Byte] =
    Array((0 << 5 | (if (v) 1 else 0)).toByte, (14 - 7).toByte)
  def map(kvs: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(kvs.length < 29)
    Array(((7 << 5) | kvs.length).toByte) ++
      kvs.flatMap { case (k, v) => str(k) ++ v }
  }
  def arr(items: Seq[Array[Byte]]): Array[Byte] = {
    require(items.length < 29)
    Array((0 << 5 | items.length).toByte, (11 - 7).toByte) ++ items.flatten
  }

  private final class Node {
    var left: Node = _
    var right: Node = _
    var data: Int = -1 // offset into data section
    var id: Int = -1
  }

  /** Build a v4 (ip_version=4, record_size=24) mmdb from cidr→record. */
  def write(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    // data section first (dedup by identity not needed for tests)
    val data = new ByteArrayOutputStream()
    val offsets = entries.map { case (_, rec) =>
      val off = data.size(); data.write(rec); off
    }
    // trie
    val root = new Node
    entries.zipWithIndex.foreach { case ((cidr, _), i) =>
      val Array(net, lenS) = cidr.split("/")
      val len = lenS.toInt
      val ip = net.split("\\.").map(_.toLong).reduce((a, b) => (a << 8) | b)
      var n = root
      for (b <- 0 until len) {
        // a covering network's data pushes down to both children when a
        // more-specific network splits it (the mmdb tree has data only
        // at leaves)
        if (n.data >= 0) {
          n.left = new Node; n.left.data = n.data
          n.right = new Node; n.right.data = n.data
          n.data = -1
        }
        val bit = (ip >> (31 - b)) & 1
        if (bit == 0) { if (n.left == null) n.left = new Node; n = n.left }
        else { if (n.right == null) n.right = new Node; n = n.right }
      }
      n.data = offsets(i)
    }
    // number internal nodes (nodes with children); data leaves are not nodes
    val internal = scala.collection.mutable.ArrayBuffer.empty[Node]
    def collect(n: Node): Unit = if (n != null && n.data < 0) {
      internal += n; collect(n.left); collect(n.right)
    }
    collect(root)
    internal.zipWithIndex.foreach { case (n, i) => n.id = i }
    val nodeCount = internal.length
    def recordOf(child: Node): Int =
      if (child == null) nodeCount
      else if (child.data >= 0) nodeCount + 16 + child.data
      else child.id
    val tree = new ByteArrayOutputStream()
    internal.foreach { n =>
      val l = recordOf(n.left); val r = recordOf(n.right)
      tree.write(Array((l >> 16).toByte, (l >> 8).toByte, l.toByte,
        (r >> 16).toByte, (r >> 8).toByte, r.toByte))
    }
    val meta = map(Seq(
      "binary_format_major_version" -> u16(2),
      "binary_format_minor_version" -> u16(0),
      "build_epoch" -> u32(1700000000L),
      "database_type" -> str("Test-City"),
      "description" -> map(Seq("en" -> str("test db"))),
      "ip_version" -> u16(4),
      "languages" -> arr(Seq(str("en"))),
      "node_count" -> u32(nodeCount.toLong),
      "record_size" -> u16(24)))
    val out = new ByteArrayOutputStream()
    out.write(tree.toByteArray)
    out.write(new Array[Byte](16))
    out.write(data.toByteArray)
    out.write(Array(0xab.toByte, 0xcd.toByte, 0xef.toByte))
    out.write("MaxMind.com".getBytes(StandardCharsets.US_ASCII))
    out.write(meta)
    out.toByteArray
  }
}

class MmdbSpec extends SparkSpec {

  private def rec(country: String, city: String, lat: Double): Array[Byte] =
    MmdbWriter.map(Seq(
      "city" -> MmdbWriter.map(Seq("names" -> MmdbWriter.map(Seq(
        "en" -> MmdbWriter.str(city))))),
      "country" -> MmdbWriter.map(Seq("iso_code" -> MmdbWriter.str(country))),
      "location" -> MmdbWriter.map(Seq("latitude" -> MmdbWriter.dbl(lat))),
      "is_eu" -> MmdbWriter.bool(country == "DE")))

  private val networks = Seq(
    "10.0.0.0/8" -> rec("US", "Springfield", 39.8),
    "10.42.0.0/16" -> rec("DE", "Berlin", 52.52), // longer prefix inside 10/8
    "192.168.1.0/24" -> rec("FR", "Paris", 48.86),
    "172.16.0.0/12" -> rec("JP", "Tokyo", 35.68))

  private lazy val db = new Mmdb(MmdbWriter.write(networks))

  test("metadata decodes") {
    assert(db.nodeCount > 0 && db.recordSize == 24 && db.ipVersion == 4)
    assert(db.metadataJson.contains("\"database_type\":\"Test-City\""))
  }

  test("point lookups: longest prefix wins, misses null, types decode") {
    assert(db.lookup("10.1.2.3").contains("\"iso_code\":\"US\""))
    assert(db.lookup("10.42.9.9").contains("\"iso_code\":\"DE\"")) // longer prefix
    assert(db.lookup("10.42.9.9").contains("\"is_eu\":true"))
    assert(db.lookup("192.168.1.77").contains("Paris"))
    assert(db.lookup("192.168.2.1") == null) // outside /24
    assert(db.lookup("8.8.8.8") == null)
    assert(db.lookup("not an ip") == null)
    assert(db.lookup("10.1.2.3").contains("\"latitude\":39.8"))
  }

  test("whole-tree walk: split covering networks still cover exactly") {
    val got = db.entries().toMap
    // the 10.42/16 carve-out splits 10/8 into /9../16 pieces, so exact
    // keys differ from the input list — the carved network and the
    // un-nested ones survive verbatim:
    assert(got("10.42.0.0/16").contains("Berlin"))
    assert(got("192.168.1.0/24").contains("Paris"))
    assert(got("172.16.0.0/12").contains("Tokyo"))
    // every other 10.x piece carries the covering /8 record
    assert(got.filter(_._1.startsWith("10.")).removed("10.42.0.0/16")
      .values.forall(_.contains("Springfield")))
    // and the pieces tile 10/8: sizes sum to 2^24
    val sizes = got.keys.toSeq.filter(_.startsWith("10."))
      .map(c => 1L << (32 - c.split("/")(1).toInt)).sum
    assert(sizes == (1L << 24))
  }

  test("corrupt pointer cycle: lookup returns null, never StackOverflowError") {
    // a data record that is a POINTER to data-section offset 0 — i.e. to
    // itself: ctrl 0x20 (type 1, ss=0, v=0) + 0x00. The spec forbids
    // pointers-to-pointers; a malicious/corrupt file must fail with the
    // caught error lane, not an uncatchable StackOverflowError.
    val evil = MmdbWriter.write(Seq("1.2.3.0/24" -> Array[Byte](0x20, 0x00)))
    val db = new Mmdb(evil)
    assert(db.lookup("1.2.3.4") == null)
    // and a healthy record in the same file still resolves
    val mixed = MmdbWriter.write(Seq(
      "1.2.3.0/24" -> Array[Byte](0x20, 0x00),
      "9.9.9.0/24" -> MmdbWriter.str("fine")))
    val db2 = new Mmdb(mixed)
    assert(db2.lookup("1.2.3.4") == null)
    assert(db2.lookup("9.9.9.9") == "\"fine\"")
  }

  test("enrich: broadcast cidr join matches point lookups") {
    import spark.implicits._
    val ips = Seq("10.1.2.3", "10.42.9.9", "192.168.1.77", "8.8.8.8").toDF("ip")
    val out = Mmdb.enrich(ips, db, col("ip"),
      Map("country" -> "country.iso_code", "city" -> "city.names.en"))
      .orderBy("ip").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq == Seq(
      ("10.1.2.3", "US", "Springfield"),
      ("10.42.9.9", "DE", "Berlin"),
      ("192.168.1.77", "FR", "Paris"),
      ("8.8.8.8", null, null)))
  }
}
