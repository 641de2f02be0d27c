package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native CBOR codec (VRL `parse_cbor` — reference:
  * website/cue/reference/remap/functions/parse_cbor.cue and
  * lib/codecs' cbor decoder), built directly from RFC 8949 — no CBOR
  * library ships with Spark. Values surface as JSON (the repo's
  * convention for dynamically-typed decoders: mmdb, avro), so
  * `get_json_object`/`from_json` take over column-side.
  *
  * Decode covers the full wire format: majors 0-5 (ints, bytes, text,
  * arrays, maps), tags (major 6 — unwrapped, the tagged value decodes),
  * simple values/floats (major 7 incl. half-precision), and indefinite-
  * length strings, arrays, and maps with the `0xff` break. Byte strings
  * surface as base64 JSON strings (same choice as the avro and mmdb
  * decoders). Malformed input → null (fallible parse_cbor! error lane).
  *
  * Encode is JSON → CBOR (definite lengths, ints as the shortest uint/
  * negint, non-integral numbers as 64-bit floats) — the roundtrip
  * partner that lets the DuckDB oracle verify decode distributively.
  */
case class CborDecode(child: Expression)
  extends UnaryExpression with ExpectsBinary {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_cbor"

  override def nullSafeEval(v: Any): Any = {
    val r = Cbor.decodeToJson(v.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""String ${ev.value}_s = graft.functions.Cbor.decodeToJson($c);
         |if (${ev.value}_s == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = UTF8String.fromString(${ev.value}_s); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CborDecode =
    copy(child = newChild)
}

case class CborEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "encode_cbor"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"encode_cbor needs a JSON string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    Cbor.encodeJson(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""byte[] ${ev.value}_b = graft.functions.Cbor.encodeJson($c.toString());
         |if (${ev.value}_b == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_b; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CborEncode =
    copy(child = newChild)
}

private[functions] trait ExpectsBinary { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"${self.prettyName} needs binary, got $t")
    }
}

object Cbor {

  // ---- decode (RFC 8949 §3) ----------------------------------------

  /** bytes → JSON, null on any malformed input. */
  def decodeToJson(in: Array[Byte]): String =
    try {
      val sb = new java.lang.StringBuilder
      val end = decodeItem(in, 0, sb)
      if (end != in.length) null else sb.toString // trailing garbage
    } catch { case _: Exception => null }

  /** Decode one data item at `p` into `sb`; returns offset after it. */
  private def decodeItem(b: Array[Byte], p: Int, sb: java.lang.StringBuilder): Int = {
    val ib = b(p) & 0xff
    val major = ib >> 5
    val ai = ib & 0x1f
    // (argument value, offset after the head); ai 31 = indefinite (-1)
    var q = p + 1
    val arg: Long =
      if (ai < 24) ai
      else if (ai == 24) { q += 1; b(p + 1) & 0xffL }
      else if (ai == 25) { q += 2; ((b(p + 1) & 0xffL) << 8) | (b(p + 2) & 0xffL) }
      else if (ai == 26) {
        q += 4
        ((b(p + 1) & 0xffL) << 24) | ((b(p + 2) & 0xffL) << 16) |
          ((b(p + 3) & 0xffL) << 8) | (b(p + 4) & 0xffL)
      } else if (ai == 27) {
        q += 8
        var v = 0L; var i = 1
        while (i <= 8) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
        v
      } else if (ai == 31 && major >= 2 && major <= 7) -1L
      else throw new IllegalArgumentException(s"cbor: reserved ai $ai")

    major match {
      case 0 => // unsigned int
        sb.append(java.lang.Long.toUnsignedString(arg)); q
      case 1 => // negative int: -1 - n
        if (arg >= 0) sb.append(-1L - arg)
        else sb.append(java.math.BigInteger.valueOf(-1).subtract(
          new java.math.BigInteger(java.lang.Long.toUnsignedString(arg))))
        q
      case 2 => // byte string → base64
        val (bytes, after) = chunkedBytes(b, q, arg, major)
        jsonString(java.util.Base64.getEncoder.encodeToString(bytes), sb); after
      case 3 => // text string
        val (bytes, after) = chunkedBytes(b, q, arg, major)
        jsonString(new String(bytes, java.nio.charset.StandardCharsets.UTF_8), sb)
        after
      case 4 => // array
        sb.append('[')
        var i = 0L
        while (if (arg < 0) (b(q) & 0xff) != 0xff else i < arg) {
          if (i > 0) sb.append(',')
          q = decodeItem(b, q, sb); i += 1
        }
        if (arg < 0) q += 1 // break
        sb.append(']'); q
      case 5 => // map (keys coerced to JSON strings)
        sb.append('{')
        var i = 0L
        while (if (arg < 0) (b(q) & 0xff) != 0xff else i < arg) {
          if (i > 0) sb.append(',')
          val ks = new java.lang.StringBuilder
          q = decodeItem(b, q, ks)
          val k = ks.toString
          if (k.startsWith("\"")) sb.append(k)
          else jsonString(k, sb) // int/float key → string key
          sb.append(':')
          q = decodeItem(b, q, sb); i += 1
        }
        if (arg < 0) q += 1
        sb.append('}'); q
      case 6 => // tag: decode the tagged item transparently
        decodeItem(b, q, sb)
      case 7 =>
        ai match {
          case 20 => sb.append("false"); q
          case 21 => sb.append("true"); q
          case 22 | 23 => sb.append("null"); q // null / undefined
          case 24 => sb.append(arg); q // simple value → its number
          case 25 => jsonNumber(halfToDouble(arg.toInt), sb); q
          case 26 => jsonNumber(java.lang.Float.intBitsToFloat(arg.toInt).toDouble, sb); q
          case 27 => jsonNumber(java.lang.Double.longBitsToDouble(arg), sb); q
          case v if v < 20 => sb.append(v); q // unassigned simple
          case _ => throw new IllegalArgumentException("cbor: bad simple")
        }
    }
  }

  /** Definite- or indefinite-length string payload (major 2/3). */
  private def chunkedBytes(b: Array[Byte], p0: Int, arg: Long, major: Int): (Array[Byte], Int) = {
    if (arg >= 0) {
      val n = arg.toInt
      require(arg == n.toLong && p0 + n <= b.length, "cbor: truncated string")
      (java.util.Arrays.copyOfRange(b, p0, p0 + n), p0 + n)
    } else {
      // indefinite: chunks of the SAME major type until break
      val out = new ByteArrayOutputStream()
      var p = p0
      while ((b(p) & 0xff) != 0xff) {
        val ib = b(p) & 0xff
        require(ib >> 5 == major && (ib & 0x1f) != 31, "cbor: bad chunk")
        val ai = ib & 0x1f
        var q = p + 1
        val n: Int =
          if (ai < 24) ai
          else if (ai == 24) { q += 1; b(p + 1) & 0xff }
          else if (ai == 25) { q += 2; ((b(p + 1) & 0xff) << 8) | (b(p + 2) & 0xff) }
          else if (ai == 26) {
            q += 4
            ((b(p + 1) & 0xff) << 24) | ((b(p + 2) & 0xff) << 16) |
              ((b(p + 3) & 0xff) << 8) | (b(p + 4) & 0xff)
          } else throw new IllegalArgumentException("cbor: chunk too long")
        require(q + n <= b.length, "cbor: truncated chunk")
        out.write(b, q, n)
        p = q + n
      }
      (out.toByteArray, p + 1)
    }
  }

  private def halfToDouble(h: Int): Double = {
    val exp = (h >> 10) & 0x1f
    val mant = h & 0x3ff
    val sign = if ((h & 0x8000) != 0) -1.0 else 1.0
    val v =
      if (exp == 0) mant * math.pow(2, -24)
      else if (exp != 31) (mant + 1024) * math.pow(2, exp - 25)
      else if (mant == 0) Double.PositiveInfinity
      else Double.NaN
    sign * v
  }

  private def jsonString(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  private def jsonNumber(v: Double, sb: java.lang.StringBuilder): Unit =
    if (v.isNaN || v.isInfinite) sb.append("null")
    else if (v == v.toLong.toDouble && math.abs(v) < 1e15) sb.append(v.toLong)
    else sb.append(v)

  // ---- encode (JSON → CBOR) ----------------------------------------

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** JSON text → CBOR bytes, null on unparseable JSON. */
  def encodeJson(json: String): Array[Byte] =
    try {
      val node = mapper.readTree(json)
      if (node == null) null
      else {
        val out = new ByteArrayOutputStream()
        encodeNode(node, out)
        out.toByteArray
      }
    } catch { case _: Exception => null }

  private def head(major: Int, n: Long, out: ByteArrayOutputStream): Unit = {
    val m = major << 5
    if (n < 24) out.write(m | n.toInt)
    else if (n < 256) { out.write(m | 24); out.write(n.toInt) }
    else if (n < 65536) { out.write(m | 25); out.write((n >> 8).toInt); out.write(n.toInt) }
    else if (n < (1L << 32)) {
      out.write(m | 26)
      var i = 24; while (i >= 0) { out.write((n >> i).toInt); i -= 8 }
    } else {
      out.write(m | 27)
      var i = 56; while (i >= 0) { out.write((n >> i).toInt); i -= 8 }
    }
  }

  private def encodeNode(n: com.fasterxml.jackson.databind.JsonNode,
                         out: ByteArrayOutputStream): Unit = {
    import com.fasterxml.jackson.databind.JsonNode
    if (n.isNull) out.write(0xf6)
    else if (n.isBoolean) out.write(if (n.asBoolean) 0xf5 else 0xf4)
    else if (n.isIntegralNumber && n.canConvertToLong) {
      val v = n.asLong
      if (v >= 0) head(0, v, out) else head(1, -1L - v, out)
    } else if (n.isNumber) {
      out.write(0xfb)
      val bits = java.lang.Double.doubleToLongBits(n.asDouble)
      var i = 56; while (i >= 0) { out.write((bits >> i).toInt); i -= 8 }
    } else if (n.isTextual) {
      val b = n.asText.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      head(3, b.length.toLong, out); out.write(b, 0, b.length)
    } else if (n.isArray) {
      head(4, n.size.toLong, out)
      val it = n.elements(); while (it.hasNext) encodeNode(it.next(), out)
    } else if (n.isObject) {
      head(5, n.size.toLong, out)
      val it = n.fields()
      while (it.hasNext) {
        val e = it.next()
        val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        head(3, kb.length.toLong, out); out.write(kb, 0, kb.length)
        encodeNode(e.getValue, out)
      }
    } else throw new IllegalArgumentException("cbor: unsupported node " + classOf[JsonNode])
  }
}
