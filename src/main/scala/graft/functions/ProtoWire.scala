package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Schema-driven protobuf WIRE-FORMAT codec (VRL `parse_proto` /
  * `encode_proto` — reference: website/cue/reference/remap/functions/
  * parse_proto.cue, encode_proto.cue), built from the public protobuf
  * encoding spec — no protobuf-java ships on the Spark classpath (orc's
  * copy is shaded), so the varint/zigzag/length-delimited/fixed wire
  * grammar is implemented directly. The reference takes a compiled
  * descriptor file; here the message shape is a [[ProtoField]] tree
  * (field number, name, scalar type, repeated flag, nested message) —
  * the same information a descriptor carries for the supported subset.
  *
  * Decoded values surface as JSON in SCHEMA order (deterministic,
  * independent of wire order); unknown fields skip by wire type exactly
  * as protobuf requires; repeated scalars accept both packed
  * (length-delimited) and unpacked encodings. Malformed input → null.
  *
  * Supported types: int32/int64/uint32/uint64 (varint), sint32/sint64
  * (zigzag), bool, enum (as int), string, bytes (base64 in JSON),
  * double, float, fixed64/sfixed64, fixed32/sfixed32, message (nested).
  */
final case class ProtoField(no: Int, name: String, ptype: String,
                            repeated: Boolean = false,
                            message: Seq[ProtoField] = Nil)

case class ProtoDecode(child: Expression, schema: Seq[ProtoField])
  extends UnaryExpression with ExpectsBinary {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_proto"

  override def nullSafeEval(v: Any): Any = {
    val r = ProtoWire.decodeToJson(v.asInstanceOf[Array[Byte]], schema)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("protoSchema", schema, "scala.collection.immutable.Seq")
    nullSafeCodeGen(ctx, ev, c => {
      s"""String ${ev.value}_s = graft.functions.ProtoWire.decodeToJson($c, $sRef);
         |if (${ev.value}_s == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = UTF8String.fromString(${ev.value}_s); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ProtoDecode =
    copy(child = newChild)
}

case class ProtoEncode(child: Expression, schema: Seq[ProtoField])
  extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "encode_proto"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"encode_proto needs a JSON string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    ProtoWire.encodeJson(v.asInstanceOf[UTF8String].toString, schema)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("protoSchema", schema, "scala.collection.immutable.Seq")
    nullSafeCodeGen(ctx, ev, c => {
      s"""byte[] ${ev.value}_b = graft.functions.ProtoWire.encodeJson($c.toString(), $sRef);
         |if (${ev.value}_b == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_b; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ProtoEncode =
    copy(child = newChild)
}

object ProtoWire {

  private val VarintTypes =
    Set("int32", "int64", "uint32", "uint64", "sint32", "sint64", "bool", "enum")

  // ---- decode -------------------------------------------------------

  def decodeToJson(in: Array[Byte], schema: Seq[ProtoField]): String =
    try decodeMessage(in, 0, in.length, schema)
    catch { case _: Exception => null }

  private final class Reader(b: Array[Byte], var p: Int, val end: Int) {
    def hasMore: Boolean = p < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (shift < 64) {
        require(p < end, "proto: truncated varint")
        val byt = b(p); p += 1
        v |= (byt & 0x7fL) << shift
        if ((byt & 0x80) == 0) return v
        shift += 7
      }
      throw new IllegalArgumentException("proto: varint too long")
    }
    def fixed(n: Int): Long = {
      require(p + n <= end, "proto: truncated fixed")
      var v = 0L; var i = n - 1
      while (i >= 0) { v = (v << 8) | (b(p + i) & 0xffL); i -= 1 } // little-endian
      p += n; v
    }
    /** Length prefix for a length-delimited payload: must be a
      * non-negative Int — a 64-bit varint whose low 32 bits are negative
      * as Int would otherwise REWIND the cursor and loop forever. */
    def len(): Int = {
      val v = varint()
      require(v >= 0 && v <= Int.MaxValue, "proto: negative/oversized length")
      v.toInt
    }
    def bytes(n: Int): Array[Byte] = {
      require(n >= 0 && p + n <= end, "proto: truncated bytes")
      val r = java.util.Arrays.copyOfRange(b, p, p + n); p += n; r
    }
  }

  private def decodeMessage(b: Array[Byte], start: Int, end: Int,
                            schema: Seq[ProtoField]): String = {
    val byNo = schema.map(f => f.no -> f).toMap
    // field no → decoded JSON fragments (wire order within a field)
    val got = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[String]]
    val r = new Reader(b, start, end)
    while (r.hasMore) {
      val tag = r.varint()
      val no = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      require(no > 0, "proto: field number 0")
      byNo.get(no) match {
        case Some(f) =>
          val buf = got.getOrElseUpdate(no, scala.collection.mutable.ArrayBuffer.empty)
          (wt, f.ptype) match {
            case (0, t) if VarintTypes(t) => buf += varintJson(r.varint(), t)
            case (1, "double") =>
              buf += jsonNum(java.lang.Double.longBitsToDouble(r.fixed(8)))
            case (1, "fixed64") =>
              buf += java.lang.Long.toUnsignedString(r.fixed(8))
            case (1, "sfixed64") => buf += r.fixed(8).toString
            case (5, "float") =>
              buf += jsonNum(java.lang.Float.intBitsToFloat(r.fixed(4).toInt).toDouble)
            case (5, "fixed32") => buf += (r.fixed(4) & 0xffffffffL).toString
            case (5, "sfixed32") => buf += r.fixed(4).toInt.toString
            case (2, "string") =>
              buf += jsonStr(new String(r.bytes(r.len()),
                java.nio.charset.StandardCharsets.UTF_8))
            case (2, "bytes") =>
              buf += jsonStr(java.util.Base64.getEncoder.encodeToString(
                r.bytes(r.len())))
            case (2, "message") =>
              val n = r.len()
              val s = r.p
              r.p += n
              require(r.p <= end, "proto: truncated message")
              buf += decodeMessage(b, s, s + n, f.message)
            case (2, t) if f.repeated && (VarintTypes(t) ||
                t == "double" || t == "float" ||
                t.startsWith("fixed") || t.startsWith("sfixed")) =>
              // packed repeated scalars
              val n = r.len()
              val pr = new Reader(b, r.p, r.p + n)
              require(r.p + n <= end, "proto: truncated packed")
              while (pr.hasMore) buf += (t match {
                case "double" => jsonNum(java.lang.Double.longBitsToDouble(pr.fixed(8)))
                case "float" => jsonNum(java.lang.Float.intBitsToFloat(pr.fixed(4).toInt).toDouble)
                case "fixed64" => java.lang.Long.toUnsignedString(pr.fixed(8))
                case "sfixed64" => pr.fixed(8).toString
                case "fixed32" => (pr.fixed(4) & 0xffffffffL).toString
                case "sfixed32" => pr.fixed(4).toInt.toString
                case t2 => varintJson(pr.varint(), t2)
              })
              r.p += n
            case _ =>
              throw new IllegalArgumentException(
                s"proto: wire type $wt does not match ${f.ptype} for field $no")
          }
        case None => // unknown field: skip by wire type
          wt match {
            case 0 => r.varint(): Unit
            case 1 => r.fixed(8): Unit
            case 2 => r.bytes(r.len()): Unit
            case 5 => r.fixed(4): Unit
            case _ => throw new IllegalArgumentException(s"proto: wire type $wt")
          }
      }
    }
    // emit in schema order; last-wins for non-repeated (protobuf merge rule)
    val sb = new java.lang.StringBuilder("{")
    var first = true
    schema.foreach { f =>
      got.get(f.no).foreach { vals =>
        if (!first) sb.append(',')
        first = false
        jsonStrInto(f.name, sb)
        sb.append(':')
        if (f.repeated) sb.append(vals.mkString("[", ",", "]"))
        else sb.append(vals.last)
      }
    }
    sb.append('}').toString
  }

  private def varintJson(raw: Long, t: String): String = t match {
    case "bool" => if (raw != 0) "true" else "false"
    case "sint32" | "sint64" => ((raw >>> 1) ^ -(raw & 1)).toString // zigzag
    case "uint32" | "uint64" => java.lang.Long.toUnsignedString(raw)
    case "int32" => raw.toInt.toString // truncating, per spec
    case _ => raw.toString // int64 / enum: two's-complement 64-bit
  }

  private def jsonNum(v: Double): String =
    if (v.isNaN || v.isInfinite) "null"
    else if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  private def jsonStr(s: String): String = {
    val sb = new java.lang.StringBuilder; jsonStrInto(s, sb); sb.toString
  }
  private def jsonStrInto(s: String, sb: java.lang.StringBuilder): Unit = {
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
    sb.append('"'): Unit
  }

  // ---- encode (JSON → wire) ----------------------------------------

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def encodeJson(json: String, schema: Seq[ProtoField]): Array[Byte] =
    try {
      val node = mapper.readTree(json)
      if (node == null || !node.isObject) null
      else {
        val out = new ByteArrayOutputStream()
        encodeMessage(node, schema, out)
        out.toByteArray
      }
    } catch { case _: Exception => null }

  private def writeVarint(v0: Long, out: ByteArrayOutputStream): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def writeTag(no: Int, wt: Int, out: ByteArrayOutputStream): Unit =
    writeVarint((no.toLong << 3) | wt, out)
  private def writeFixed(v: Long, n: Int, out: ByteArrayOutputStream): Unit = {
    var i = 0
    while (i < n) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  private def encodeMessage(node: com.fasterxml.jackson.databind.JsonNode,
                            schema: Seq[ProtoField],
                            out: ByteArrayOutputStream): Unit =
    schema.foreach { f =>
      val v = node.get(f.name)
      if (v != null && !v.isNull) {
        if (f.repeated) {
          require(v.isArray, s"proto: ${f.name} must be an array")
          val it = v.elements()
          while (it.hasNext) encodeField(f, it.next(), out)
        } else encodeField(f, v, out)
      }
    }

  private def encodeField(f: ProtoField,
                          v: com.fasterxml.jackson.databind.JsonNode,
                          out: ByteArrayOutputStream): Unit = f.ptype match {
    case "string" =>
      val b = v.asText.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      writeTag(f.no, 2, out); writeVarint(b.length.toLong, out); out.write(b, 0, b.length)
    case "bytes" =>
      val b = java.util.Base64.getDecoder.decode(v.asText)
      writeTag(f.no, 2, out); writeVarint(b.length.toLong, out); out.write(b, 0, b.length)
    case "message" =>
      val nested = new ByteArrayOutputStream()
      encodeMessage(v, f.message, nested)
      writeTag(f.no, 2, out); writeVarint(nested.size.toLong, out)
      nested.writeTo(out)
    case "double" =>
      writeTag(f.no, 1, out)
      writeFixed(java.lang.Double.doubleToLongBits(v.asDouble), 8, out)
    case "float" =>
      writeTag(f.no, 5, out)
      writeFixed(java.lang.Float.floatToIntBits(v.asDouble.toFloat).toLong & 0xffffffffL, 4, out)
    case "fixed64" | "sfixed64" => writeTag(f.no, 1, out); writeFixed(v.asLong, 8, out)
    case "fixed32" | "sfixed32" => writeTag(f.no, 5, out); writeFixed(v.asLong, 4, out)
    case "bool" => writeTag(f.no, 0, out); writeVarint(if (v.asBoolean) 1 else 0, out)
    case "sint32" | "sint64" =>
      val n = v.asLong
      writeTag(f.no, 0, out); writeVarint((n << 1) ^ (n >> 63), out) // zigzag
    case _ => // int32/int64/uint32/uint64/enum: two's-complement varint
      writeTag(f.no, 0, out); writeVarint(v.asLong, out)
  }
}
