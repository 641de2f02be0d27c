package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** VRL `ip_pton` / `ip_ntop` (reference: website/cue/reference/remap/
  * functions/ip_pton.cue, ip_ntop.cue): presentation-form IP text ↔
  * network-order bytes (4 for IPv4, 16 for IPv6), the inet_pton(3)/
  * inet_ntop(3) pair. Fallible → null on bad input (wrong length /
  * unparseable literal). Reuses [[IpCrypt]]'s literal-only parser and
  * Rust-display formatter so `ip_ntop(ip_pton(x)) == x` holds for
  * canonical-form input.
  */
case class IpPton(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "ip_pton"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"ip_pton needs a string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    IpText.pton(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""byte[] ${ev.value}_b = graft.functions.IpText.pton($c.toString());
         |if (${ev.value}_b == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_b; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IpPton =
    copy(child = newChild)
}

case class IpNtop(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "ip_ntop"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"ip_ntop needs binary, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val r = IpText.ntop(v.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""String ${ev.value}_s = graft.functions.IpText.ntop($c);
         |if (${ev.value}_s == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = UTF8String.fromString(${ev.value}_s); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IpNtop =
    copy(child = newChild)
}

object IpText {

  /** Text → 4-byte (v4) or 16-byte (v6) network-order address. */
  def pton(ip: String): Array[Byte] = {
    if (ip == null) return null
    val b16 = IpCrypt.toBytes16(ip)
    if (b16 == null) null
    else if (!ip.contains(":")) java.util.Arrays.copyOfRange(b16, 12, 16)
    else b16
  }

  /** 4- or 16-byte address → presentation text (Rust display rules for
    * v6: `::` compression, v4-mapped dotted tail).
    */
  def ntop(b: Array[Byte]): String =
    if (b == null) null
    else if (b.length == 4)
      s"${b(0) & 0xff}.${b(1) & 0xff}.${b(2) & 0xff}.${b(3) & 0xff}"
    else if (b.length == 16) IpCrypt.format(b)
    else null
}
