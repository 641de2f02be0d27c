package graft.functions

import javax.crypto.Cipher
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd IP-address encryption (VRL `encrypt_ip` /
  * `decrypt_ip` — reference: website/cue/reference/remap/functions/
  * encrypt_ip.cue, decrypt_ip.cue; algorithms: the public IPCrypt
  * specification). Two modes:
  *
  *  - `aes128` = ipcrypt-deterministic: one AES-128 block over the
  *    16-byte address (IPv4 lifts to its IPv4-mapped form), so any IP
  *    encrypts to a full IPv6 address; 16-byte key.
  *  - `pfx` = ipcrypt-pfx: prefix-preserving — addresses sharing a
  *    k-bit prefix encrypt to addresses sharing a k-bit prefix. One
  *    pseudorandom bit per position from two AES permutations over the
  *    padded plaintext prefix; 32-byte key split into the two AES keys.
  *
  * Both are deterministic (same key + IP → same output). Fallible →
  * NULL on bad IPs/keys, the reference's `encrypt_ip!` error lane.
  */
case class IpCryptExpr(child: Expression, key: Array[Byte], mode: String,
                       encrypt: Boolean) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = if (encrypt) "encrypt_ip" else "decrypt_ip"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    IpCrypt.run(v.asInstanceOf[UTF8String], key, mode, encrypt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("ipcryptKey", key, "byte[]")
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.IpCrypt.run($c, $keyRef, "$mode", $encrypt)""")
  }

  override protected def withNewChildInternal(newChild: Expression): IpCryptExpr =
    copy(child = newChild)
}

object IpCrypt {

  // ---------------- IP text ↔ 16 bytes ----------------

  private val IpLiteral = java.util.regex.Pattern.compile("^[0-9a-fA-F:.]+$")

  /** 16-byte form; IPv4 → IPv4-mapped. Null on unparsable input. */
  def toBytes16(ip: String): Array[Byte] = {
    if (ip == null || !IpLiteral.matcher(ip).matches()) return null
    try {
      // literal-only input (guarded above) — getByName does no DNS here
      val addr = java.net.InetAddress.getByName(ip).getAddress
      if (addr.length == 16) addr
      else {
        val b = new Array[Byte](16)
        b(10) = 0xff.toByte; b(11) = 0xff.toByte
        System.arraycopy(addr, 0, b, 12, 4)
        b
      }
    } catch { case _: Exception => null }
  }

  private def isV4Mapped(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 10) { if (b(i) != 0) return false; i += 1 }
    b(10) == 0xff.toByte && b(11) == 0xff.toByte
  }

  /** Rust `std::net::Ipv6Addr` Display rules: v4-mapped prints the
    * dotted tail, the longest (leftmost, len ≥ 2) zero-group run
    * compresses to `::`, groups print as bare hex.
    */
  def format(b: Array[Byte]): String = {
    if (isV4Mapped(b))
      return s"::ffff:${b(12) & 0xff}.${b(13) & 0xff}.${b(14) & 0xff}.${b(15) & 0xff}"
    val g = Array.tabulate(8)(i => ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff))
    // find longest zero run
    var bestStart = -1; var bestLen = 0; var i = 0
    while (i < 8) {
      if (g(i) == 0) {
        var j = i
        while (j < 8 && g(j) == 0) j += 1
        if (j - i > bestLen) { bestLen = j - i; bestStart = i }
        i = j
      } else i += 1
    }
    if (bestLen < 2)
      g.map(Integer.toHexString).mkString(":")
    else {
      val head = g.take(bestStart).map(Integer.toHexString).mkString(":")
      val tail = g.drop(bestStart + bestLen).map(Integer.toHexString).mkString(":")
      head + "::" + tail
    }
  }

  /** Dotted quad for a v4-mapped address, else IPv6 text. */
  private def formatMaybeV4(b: Array[Byte]): String =
    if (isV4Mapped(b)) s"${b(12) & 0xff}.${b(13) & 0xff}.${b(14) & 0xff}.${b(15) & 0xff}"
    else format(b)

  // ---------------- AES-128 single block ----------------

  private val ciphers = new ThreadLocal[java.util.HashMap[String, Cipher]] {
    override def initialValue() = new java.util.HashMap[String, Cipher]()
  }

  private def aesBlock(key: Array[Byte], in: Array[Byte], enc: Boolean): Array[Byte] = {
    val id = (if (enc) "e:" else "d:") + java.util.Base64.getEncoder.encodeToString(key)
    var c = ciphers.get().get(id)
    if (c == null) {
      c = Cipher.getInstance("AES/ECB/NoPadding")
      c.init(if (enc) Cipher.ENCRYPT_MODE else Cipher.DECRYPT_MODE,
        new SecretKeySpec(key, "AES"))
      ciphers.get().put(id, c)
    }
    c.doFinal(in)
  }

  // ---------------- ipcrypt-deterministic (aes128) ----------------

  private def aes128(ip16: Array[Byte], key: Array[Byte], enc: Boolean): Array[Byte] =
    aesBlock(key, ip16, enc)

  // ---------------- ipcrypt-pfx ----------------

  private def getBit(b: Array[Byte], i: Int): Int = (b(i / 8) >> (7 - i % 8)) & 1
  private def setBit(b: Array[Byte], i: Int, v: Int): Unit =
    if (v != 0) b(i / 8) = (b(i / 8) | (1 << (7 - i % 8))).toByte

  /** The spec's padded prefix: the first `len` bits of `b` right-aligned
    * in a 16-byte block with a separator 1-bit immediately above them.
    */
  private def padPrefix(b: Array[Byte], len: Int): Array[Byte] = {
    val out = new Array[Byte](16)
    // separator bit at position (127 - len) counting MSB-first
    setBit(out, 127 - len, 1)
    var i = 0
    while (i < len) {
      setBit(out, 128 - len + i, getBit(b, i))
      i += 1
    }
    out
  }

  /** ipcrypt-pfx per the published IPCrypt specification. IPv6 walks the
    * full 128-bit prefix space; the construction is bit-exact against the
    * cue's IPv6 reference vector (encrypt_ip.cue "Encrypt IPv6 address
    * with prefix-preserving mode"). IPv4 follows the spec's v4 branch:
    * the v4-mapped prefix (bits 0..95) is copied VERBATIM, only the low
    * 32 bits are encrypted (pad starts from the 96-bit mapped prefix —
    * the spec's pad_prefix_96), and the output is a dotted quad — so
    * v4-in/v4-out and v4 prefix relationships are preserved at every
    * length. NOTE: the cue's single IPv4 pfx example predates this spec
    * rule and is reproducible by neither the spec construction nor the
    * previous full-128-bit walk (probed; documented in Wave6Spec) — the
    * published spec is authoritative here.
    */
  private def pfx(ip16: Array[Byte], key: Array[Byte], enc: Boolean): Array[Byte] = {
    val k1 = java.util.Arrays.copyOfRange(key, 0, 16)
    val k2 = java.util.Arrays.copyOfRange(key, 16, 32)
    if (java.util.Arrays.equals(k1, k2)) return null
    val out = new Array[Byte](16)
    val v4 = isV4Mapped(ip16)
    // plain holds the PLAINTEXT bits (the pad input); when decrypting we
    // reconstruct it progressively from the decrypted output bits
    val plain = if (enc) ip16.clone() else new Array[Byte](16)
    var bit = 0
    if (v4) {
      // spec: prefix_start = 96 — mapped prefix copied, not encrypted
      System.arraycopy(ip16, 0, out, 0, 12)
      if (!enc) System.arraycopy(ip16, 0, plain, 0, 12)
      bit = 96
    }
    while (bit < 128) {
      val padded = padPrefix(plain, bit)
      val c = (aesBlock(k1, padded, true)(15) ^ aesBlock(k2, padded, true)(15)) & 1
      val o = getBit(ip16, bit) ^ c
      setBit(out, bit, o)
      if (!enc) setBit(plain, bit, o)
      bit += 1
    }
    out
  }

  // ---------------- entry ----------------

  def run(ip: UTF8String, key: Array[Byte], mode: String, enc: Boolean): UTF8String = {
    try {
      val ip16 = toBytes16(ip.toString)
      if (ip16 == null) return null
      val out = mode match {
        case "aes128" =>
          if (key.length != 16) return null
          aes128(ip16, key, enc)
        case "pfx" =>
          if (key.length != 32) return null
          pfx(ip16, key, enc)
        case _ => return null
      }
      if (out == null) return null
      // pfx is v4-in/v4-out per the spec (mapped prefix copied verbatim);
      // aes128 always emits full IPv6 text (the cue's documented shape)
      val txt =
        if (!enc || mode == "pfx") formatMaybeV4(out) else format(out)
      UTF8String.fromString(txt)
    } catch { case _: Exception => null }
  }

  /** JVM reference for oracle generation and specs. */
  def apply(ip: String, key: String, mode: String, enc: Boolean): String = {
    val r = run(UTF8String.fromString(ip), key.getBytes("UTF-8"), mode, enc)
    if (r == null) null else r.toString
  }
}
