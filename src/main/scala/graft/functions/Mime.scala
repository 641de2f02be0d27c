package graft.functions

import java.nio.charset.Charset

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd RFC 2047 encoded-word decoder (VRL `decode_mime_q` —
  * reference: website/cue/reference/remap/functions/decode_mime_q.cue).
  * Replaces every `=?charset?B|Q?data?=` word embedded in the text with
  * its decoded form (B = base64, Q = quoted-printable with `_` as space);
  * the bare `?b?data` / `?q?data` form without charset decodes as UTF-8
  * like the cue's third example. Fallible → NULL on undecodable input.
  */
case class DecodeMimeQ(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "decode_mime_q"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"decode_mime_q needs a string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    Mime.decodeMimeQ(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mime.decodeMimeQ($c)")

  override protected def withNewChildInternal(newChild: Expression): DecodeMimeQ =
    copy(child = newChild)
}

/** Native charset transcoders (VRL `encode_charset` / `decode_charset` —
  * encode_charset.cue / decode_charset.cue): UTF-8 string → bytes in the
  * named charset, and back. JDK `Charset` carries the East-Asian codecs
  * the cue examples use (euc-kr, euc-jp, gb2312 alias gbk2312→GB2312…).
  * Fallible → NULL on unknown charset or unmappable input.
  */
case class EncodeCharset(child: Expression, charset: String) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "encode_charset"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"encode_charset needs a string, got $t")
    }
  override def nullSafeEval(v: Any): Any =
    Mime.encodeCharset(v.asInstanceOf[UTF8String], charset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mime.encodeCharset($c, \"$charset\")")
  override protected def withNewChildInternal(newChild: Expression): EncodeCharset =
    copy(child = newChild)
}

case class DecodeCharset(child: Expression, charset: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "decode_charset"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"decode_charset needs binary, got $t")
    }
  override def nullSafeEval(v: Any): Any =
    Mime.decodeCharset(v.asInstanceOf[Array[Byte]], charset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mime.decodeCharset($c, \"$charset\")")
  override protected def withNewChildInternal(newChild: Expression): DecodeCharset =
    copy(child = newChild)
}

object Mime {
  private val Word = java.util.regex.Pattern.compile(
    "=\\?([\\w.-]*)\\?([bBqQ])\\?([^?]*)\\?=")
  private val Bare = java.util.regex.Pattern.compile(
    "^\\?([bBqQ])\\?(.*)$")

  private def decodeWord(cs: String, enc: String, data: String): String = {
    val bytes = enc.toLowerCase match {
      case "b" => java.util.Base64.getDecoder.decode(data)
      case _ =>
        val out = new java.io.ByteArrayOutputStream()
        var i = 0
        while (i < data.length) {
          data.charAt(i) match {
            case '_' => out.write(' '); i += 1
            case '=' if i + 3 <= data.length =>
              out.write(Integer.parseInt(data.substring(i + 1, i + 3), 16)); i += 3
            case c => out.write(c.toInt); i += 1
          }
        }
        out.toByteArray
    }
    val charset = if (cs == null || cs.isEmpty) "UTF-8" else cs
    new String(bytes, Charset.forName(charset))
  }

  def decodeMimeQ(s: UTF8String): UTF8String = {
    val in = s.toString
    try {
      val bare = Bare.matcher(in)
      val out =
        if (bare.matches()) decodeWord("", bare.group(1), bare.group(2))
        else {
          val m = Word.matcher(in)
          val sb = new StringBuilder
          var last = 0
          while (m.find()) {
            sb.append(in.substring(last, m.start()))
            sb.append(decodeWord(m.group(1), m.group(2), m.group(3)))
            last = m.end()
          }
          sb.append(in.substring(last))
          sb.toString
        }
      UTF8String.fromString(out)
    } catch { case _: Exception => null }
  }

  def encodeCharset(s: UTF8String, charset: String): Array[Byte] =
    try s.toString.getBytes(Charset.forName(charset))
    catch { case _: Exception => null }

  def decodeCharset(b: Array[Byte], charset: String): UTF8String =
    try UTF8String.fromString(new String(b, Charset.forName(charset)))
    catch { case _: Exception => null }

  /** JVM references for oracle generation and specs. */
  def mimeQ(s: String): String = {
    val r = decodeMimeQ(UTF8String.fromString(s))
    if (r == null) null else r.toString
  }
}
