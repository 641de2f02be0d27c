package graft.enrich

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MaxMind DB (`.mmdb`) binary-format reader (reference:
  * src/enrichment_tables/mmdb.rs and the public MaxMind DB file-format
  * specification). Pure-Scala decode of the three sections — binary
  * search tree, data section, metadata map — with two consumption paths:
  *
  *  - [[lookup]]: point lookup of one IP (specs, driver-side probes);
  *  - [[toPrefixTable]]: walk the whole tree into `(cidr, json)` rows →
  *    [[Mmdb.enrich]] feeds them to [[Enrich.cidrLookup]]'s
  *    one-broadcast-join-per-prefix-length plan, so the fact table never
  *    shuffles and executors never touch the binary file. The table is
  *    model-sized (a GeoLite city file is a few million networks —
  *    broadcast-sized attributes, same justification as the IVF
  *    centroid collect in Similarity).
  *
  * Decoded values surface as JSON (maps/arrays nest arbitrarily in the
  * format); `get_json_object` / `from_json` take over column-side.
  */
final class Mmdb(bytes: Array[Byte]) {

  // ---- metadata -----------------------------------------------------

  private val MetaMarker: Array[Byte] =
    Array(0xab.toByte, 0xcd.toByte, 0xef.toByte) ++
      "MaxMind.com".getBytes(StandardCharsets.US_ASCII)

  private val metaStart: Int = {
    // last occurrence of the marker (the data section may contain it)
    var i = bytes.length - MetaMarker.length
    var found = -1
    while (i >= 0 && found < 0) {
      var j = 0
      while (j < MetaMarker.length && bytes(i + j) == MetaMarker(j)) j += 1
      if (j == MetaMarker.length) found = i
      i -= 1
    }
    require(found >= 0, "not an mmdb file: metadata marker missing")
    found + MetaMarker.length
  }

  /** Raw metadata map decoded to JSON (node_count, record_size, …). */
  val metadataJson: String = decode(metaStart, metaStart)._1

  private def metaLong(key: String): Long = {
    // cheap extraction from the metadata JSON (flat integer keys)
    val m = java.util.regex.Pattern.compile("\"" + key + "\":(\\d+)").matcher(metadataJson)
    require(m.find(), s"mmdb metadata missing $key")
    m.group(1).toLong
  }

  val nodeCount: Int = metaLong("node_count").toInt
  val recordSize: Int = metaLong("record_size").toInt
  val ipVersion: Int = metaLong("ip_version").toInt
  require(recordSize == 24 || recordSize == 28 || recordSize == 32,
    s"unsupported record_size $recordSize")

  private val nodeBytes = recordSize * 2 / 8
  private val treeSize = nodeCount * nodeBytes
  private val dataStart = treeSize + 16 // 16-byte zero separator

  // ---- tree ---------------------------------------------------------

  private def record(node: Int, right: Boolean): Int = {
    val base = node * nodeBytes
    recordSize match {
      case 24 =>
        val o = base + (if (right) 3 else 0)
        ((bytes(o) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) | (bytes(o + 2) & 0xff)
      case 28 =>
        val mid = bytes(base + 3) & 0xff
        if (!right)
          ((mid >> 4) << 24) | ((bytes(base) & 0xff) << 16) |
            ((bytes(base + 1) & 0xff) << 8) | (bytes(base + 2) & 0xff)
        else
          ((mid & 0xf) << 24) | ((bytes(base + 4) & 0xff) << 16) |
            ((bytes(base + 5) & 0xff) << 8) | (bytes(base + 6) & 0xff)
      case 32 =>
        val o = base + (if (right) 4 else 0)
        ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
          ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    }
  }

  /** Point lookup: dotted-quad or IPv6 text → decoded JSON, null if the
    * address has no record.
    */
  def lookup(ip: String): String =
    try lookupOrThrow(ip)
    catch { case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => null }

  private def lookupOrThrow(ip: String): String = {
    val addr16 = graft.functions.IpCrypt.toBytes16(ip)
    if (addr16 == null) return null
    val isV4 = (0 until 10).forall(addr16(_) == 0) &&
      addr16(10) == 0xff.toByte && addr16(11) == 0xff.toByte
    // v4-in-v6 trees sit under ::/96 (the spec's alias scheme); a
    // 4-byte tree consumes only the last 32 bits
    val bits: Seq[Int] =
      if (ipVersion == 4) {
        if (!isV4) return null
        (96 until 128).map(b => (addr16(b / 8) >> (7 - b % 8)) & 1)
      } else {
        val full = (0 until 128).map(b => (addr16(b / 8) >> (7 - b % 8)) & 1)
        if (isV4) Seq.fill(96)(0) ++ full.drop(96) else full
      }
    var node = 0
    var i = 0
    while (i < bits.length) {
      if (node >= nodeCount) {
        return if (node == nodeCount) null
        else decode(dataStart + (node - nodeCount - 16), dataStart)._1
      }
      node = record(node, bits(i) == 1)
      i += 1
    }
    if (node == nodeCount) null
    else if (node > nodeCount) decode(dataStart + (node - nodeCount - 16), dataStart)._1
    else null
  }

  /** Depth-first walk of the whole tree → `(cidr, json)` for every
    * network with a record. For ip_version=6 files only the ::ffff:0:0/96
    * v4 space plus native v6 space exist; v4 networks under ::/96 are
    * emitted in dotted CIDR form, other v6 networks in `v6hex/len` form.
    */
  def entries(): Iterator[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val totalBits = if (ipVersion == 4) 32 else 128
    def fmt(prefix: BigInt, len: Int): String = {
      if (ipVersion == 4 || (len >= 96 && (prefix >> (totalBits - 96)) == 0)) {
        // representable as v4 CIDR
        val v4 = if (ipVersion == 4) prefix else prefix & BigInt("ffffffff", 16)
        val p = v4.toLong
        val v4len = if (ipVersion == 4) len else len - 96
        s"${(p >> 24) & 0xff}.${(p >> 16) & 0xff}.${(p >> 8) & 0xff}.${p & 0xff}/$v4len"
      } else {
        val b = new Array[Byte](16)
        val pb = prefix.toByteArray.takeRight(16)
        System.arraycopy(pb, 0, b, 16 - pb.length, pb.length)
        graft.functions.IpCrypt.format(b) + s"/$len"
      }
    }
    def walk(node: Int, prefix: BigInt, len: Int): Unit = {
      if (node > nodeCount) {
        out += ((fmt(prefix << (totalBits - len), len),
          decode(dataStart + (node - nodeCount - 16), dataStart)._1))
      } else if (node < nodeCount && len < totalBits) {
        walk(record(node, right = false), prefix << 1, len + 1)
        walk(record(node, right = true), (prefix << 1) | 1, len + 1)
      }
    }
    walk(0, BigInt(0), 0)
    out.iterator
  }

  // ---- data-section decoding ---------------------------------------

  /** Decode the value at `off`; returns (json, offsetAfter). `base` is
    * the data-section start (pointer targets are relative to it).
    */
  private def decode(off: Int, base: Int, ptrDepth: Int = 0): (String, Int) = {
    val ctrl = bytes(off) & 0xff
    var typ = ctrl >> 5
    var p = off + 1
    if (typ == 0) { typ = (bytes(p) & 0xff) + 7; p += 1 } // extended type
    if (typ == 1) { // pointer
      val ss = (ctrl >> 3) & 0x3
      val v = ctrl & 0x7
      val (target, after) = ss match {
        case 0 => ((v << 8) | (bytes(p) & 0xff), p + 1)
        case 1 => (((v << 16) | ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)) + 2048, p + 2)
        case 2 => (((v << 24) | ((bytes(p) & 0xff) << 16) | ((bytes(p + 1) & 0xff) << 8) |
          (bytes(p + 2) & 0xff)) + 526336, p + 3)
        case _ => (((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
          ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff), p + 4)
      }
      // the MaxMind-DB spec forbids pointers-to-pointers; allow a short
      // chain but fail (caught by callers' error lanes) on cycles —
      // unguarded recursion on a corrupt/malicious file would otherwise
      // die with an uncatchable StackOverflowError
      if (ptrDepth >= 4)
        throw new IllegalArgumentException("mmdb: pointer chain too deep (cycle?)")
      return (decode(base + target, base, ptrDepth + 1)._1, after)
    }
    var size = ctrl & 0x1f
    if (size == 29) { size = 29 + (bytes(p) & 0xff); p += 1 }
    else if (size == 30) {
      size = 285 + ((bytes(p) & 0xff) << 8) + (bytes(p + 1) & 0xff); p += 2
    } else if (size == 31) {
      size = 65821 + ((bytes(p) & 0xff) << 16) + ((bytes(p + 1) & 0xff) << 8) +
        (bytes(p + 2) & 0xff); p += 3
    }
    def uintAt(n: Int): BigInt = {
      var v = BigInt(0)
      var i = 0
      while (i < n) { v = (v << 8) | BigInt(bytes(p + i) & 0xff); i += 1 }
      v
    }
    typ match {
      case 2 => // utf8 string
        (jsonStr(new String(bytes, p, size, StandardCharsets.UTF_8)), p + size)
      case 3 => // double (size 8)
        val v = java.lang.Double.longBitsToDouble(uintAt(8).toLong)
        (jsonNum(v), p + 8)
      case 4 => // bytes → base64 string
        (jsonStr(java.util.Base64.getEncoder.encodeToString(
          java.util.Arrays.copyOfRange(bytes, p, p + size))), p + size)
      case 5 | 6 | 9 | 10 => (uintAt(size).toString, p + size) // uint16/32/64/128
      case 8 => // int32 (big-endian, may be < 4 bytes)
        var v = uintAt(size)
        if (size == 4 && v.testBit(31)) v -= BigInt(1) << 32
        (v.toString, p + size)
      case 7 => // map
        var q = p
        val sb = new StringBuilder("{")
        var i = 0
        while (i < size) {
          val (k, q1) = decode(q, base)
          val (v, q2) = decode(q1, base)
          if (i > 0) sb.append(',')
          sb.append(k).append(':').append(v)
          q = q2; i += 1
        }
        (sb.append('}').toString, q)
      case 11 => // array
        var q = p
        val sb = new StringBuilder("[")
        var i = 0
        while (i < size) {
          val (v, q1) = decode(q, base)
          if (i > 0) sb.append(',')
          sb.append(v)
          q = q1; i += 1
        }
        (sb.append(']').toString, q)
      case 14 => (if (size == 1) "true" else "false", p) // boolean (size IS the value)
      case 15 => // float (size 4)
        (jsonNum(java.lang.Float.intBitsToFloat(uintAt(4).toInt).toDouble), p + 4)
      case t => throw new IllegalArgumentException(s"mmdb: unsupported type $t at $off")
    }
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jsonNum(v: Double): String =
    if (v == v.toLong.toDouble) v.toLong.toString else v.toString
}

object Mmdb {

  def apply(path: String): Mmdb =
    new Mmdb(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  /** All networks as a `(cidr, json)` DataFrame — the bridge into the
    * existing CIDR-enrich plan. Driver-side decode of a model-sized
    * file; executors see only the resulting broadcast rows.
    */
  def toPrefixTable(spark: SparkSession, db: Mmdb): DataFrame = {
    import spark.implicits._
    db.entries().toSeq.toDF("cidr", "json")
  }

  /** GeoIP-style enrich (reference mmdb.rs lookup): longest-prefix match
    * of `ip` against the file's v4 networks; `fields` become columns
    * extracted from the record JSON (dot paths, e.g. "country.iso_code").
    */
  def enrich(df: DataFrame, db: Mmdb, ip: org.apache.spark.sql.Column,
             fields: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    val v4 = toPrefixTable(spark, db).filter(!col("cidr").contains(":"))
    val tbl = fields.foldLeft(v4) { case (t, (name, path)) =>
      t.withColumn(name, get_json_object(col("json"), "$." + path))
    }.drop("json")
    Enrich.cidrLookup(df, tbl, ip)
  }
}
