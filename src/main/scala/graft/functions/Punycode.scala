package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd IDNA punycode codec (VRL `encode_punycode` /
  * `decode_punycode` — reference: website/cue/reference/remap/functions/
  * encode_punycode.cue): internationalized domain name ↔ ASCII
  * `xn--`-form. `java.net.IDN` implements RFC 3490; one static call in
  * whole-stage codegen. Invalid input returns the input unchanged (the
  * reference's infallible `validate: false` mode — total functions suit
  * column programs; use a validation column for the error lane).
  */
case class Punycode(child: Expression, encode: Boolean) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = if (encode) "encode_punycode" else "decode_punycode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"punycode needs a string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    Punycode.convert(v.asInstanceOf[UTF8String], encode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Punycode.convert($c, $encode)")

  override protected def withNewChildInternal(newChild: Expression): Punycode =
    copy(child = newChild)
}

object Punycode {
  def convert(s: UTF8String, encode: Boolean): UTF8String = {
    val in = s.toString
    val out =
      try {
        if (encode) java.net.IDN.toASCII(in, java.net.IDN.ALLOW_UNASSIGNED)
        else java.net.IDN.toUnicode(in, java.net.IDN.ALLOW_UNASSIGNED)
      } catch { case _: IllegalArgumentException => in }
    UTF8String.fromString(out)
  }

  /** JVM reference for oracle generation and specs. */
  def ascii(s: String): String =
    convert(UTF8String.fromString(s), encode = true).toString
  def unicode(s: String): String =
    convert(UTF8String.fromString(s), encode = false).toString
}
