package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native percent-encoding codec with the reference's ascii-set lattice
  * (VRL `encode_percent` / `decode_percent` — website/cue/reference/remap/
  * functions/encode_percent.cue). The sets are the WHATWG URL percent-
  * encode sets (C0 → fragment/query → path → userinfo → component →
  * form-urlencoded) plus NON_ALPHANUMERIC, built here from the published
  * set algebra — each set adds characters to its parent. Non-ASCII bytes
  * are ALWAYS encoded (they are outside every ASCII set); hex is
  * uppercase (`"foo bar?"` → `"foo%20bar%3F"`, the cue vector).
  *
  * Contrast with Spark's `url_encode`/`url_decode`
  * (application/x-www-form-urlencoded): that form writes space as `+` and
  * decodes `+` to space; percent-encoding writes `%20` and leaves `+`
  * alone — `f_url_codec` keeps the form-codec coverage, this expression
  * is the exact percent form.
  */
case class PercentEncode(child: Expression, asciiSet: String = "NON_ALPHANUMERIC")
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "encode_percent"

  @transient private lazy val set = Percent.set(asciiSet)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"encode_percent needs a string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    Percent.encode(v.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("pctSet", set, "boolean[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Percent.encode($c, (boolean[]) $sRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PercentEncode =
    copy(child = newChild)
}

/** Percent-decode: `%XX` → byte (hex case-insensitive); malformed `%`
  * sequences pass through verbatim (the percent-encoding crate's
  * behavior); the decoded byte string reads back as UTF-8 lossily.
  * `+` is NOT a space in this codec.
  */
case class PercentDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "decode_percent"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"decode_percent needs a string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    Percent.decode(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Percent.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): PercentDecode =
    copy(child = newChild)
}

object Percent {

  /** WHATWG URL percent-encode set algebra (url crate parser.rs /
    * percent-encoding crate lib.rs — public definitions).
    */
  def set(name: String): Array[Boolean] = {
    val s = new Array[Boolean](128)
    def add(chars: String): Unit = chars.foreach(c => s(c.toInt) = true)
    // C0 controls + DEL are in every set
    (0 until 0x20).foreach(s(_) = true)
    s(0x7f) = true
    name match {
      case "CONTROLS" => ()
      case "FRAGMENT" => add(" \"<>`")
      case "QUERY" => add(" \"#<>")
      case "SPECIAL" => add(" \"#<>'") // special-query: query + '
      case "PATH" => add(" \"#<>?`{}")
      case "USERINFO" => add(" \"#<>?`{}/:;=@[\\]^|")
      case "COMPONENT" => add(" \"#<>?`{}/:;=@[\\]^|$%&+,")
      case "WWW_FORM_URLENCODED" => add(" \"#<>?`{}/:;=@[\\]^|$%&+,!'()~")
      case "NON_ALPHANUMERIC" =>
        (0 until 128).foreach { i =>
          val c = i.toChar
          s(i) = !((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
            (c >= '0' && c <= '9'))
        }
      case other => throw new IllegalArgumentException(s"unknown ascii_set: $other")
    }
    s
  }

  private val hex = "0123456789ABCDEF".toCharArray

  def encode(in: UTF8String, set: Array[Boolean]): UTF8String = {
    val bytes = in.getBytes
    val sb = new java.lang.StringBuilder(bytes.length + 8)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b < 0x80 && !set(b)) sb.append(b.toChar)
      else { sb.append('%'); sb.append(hex(b >> 4)); sb.append(hex(b & 0xf)) }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def decode(in: UTF8String): UTF8String = {
    val s = in.getBytes
    val out = new java.io.ByteArrayOutputStream(s.length)
    def hexVal(b: Byte): Int = b match {
      case x if x >= '0' && x <= '9' => x - '0'
      case x if x >= 'a' && x <= 'f' => x - 'a' + 10
      case x if x >= 'A' && x <= 'F' => x - 'A' + 10
      case _ => -1
    }
    var i = 0
    while (i < s.length) {
      if (s(i) == '%' && i + 2 < s.length &&
          hexVal(s(i + 1)) >= 0 && hexVal(s(i + 2)) >= 0) {
        out.write((hexVal(s(i + 1)) << 4) | hexVal(s(i + 2)))
        i += 3
      } else { out.write(s(i)); i += 1 }
    }
    UTF8String.fromString(new String(out.toByteArray,
      java.nio.charset.StandardCharsets.UTF_8))
  }

  /** JVM reference for specs/oracle derivation. */
  def enc(s: String, setName: String = "NON_ALPHANUMERIC"): String =
    encode(UTF8String.fromString(s), set(setName)).toString
  def dec(s: String): String = decode(UTF8String.fromString(s)).toString
}
