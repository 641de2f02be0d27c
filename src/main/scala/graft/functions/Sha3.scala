package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd SHA-3 digest (VRL `sha3` with variants SHA3-224/256/
  * 384/512, default SHA3-512 — reference:
  * website/cue/reference/remap/functions/sha3.cue). Spark's `sha2` stops at
  * SHA-2; JDK 17 ships SHA3 in `MessageDigest`, so this is one static call
  * inside whole-stage codegen — no UDF serialization, hex output like the
  * reference.
  */
case class Sha3(child: Expression, bits: Int) extends UnaryExpression {
  require(Set(224, 256, 384, 512).contains(bits), s"bad SHA3 variant $bits")

  override def dataType: DataType = StringType
  override def prettyName: String = s"sha3_$bits"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"sha3 needs a string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    Sha3.digest(v.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sha3.digest($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Sha3 =
    copy(child = newChild)
}

object Sha3 {
  private val Hex = "0123456789abcdef".toCharArray

  def digest(s: UTF8String, bits: Int): UTF8String = {
    val md = java.security.MessageDigest.getInstance(s"SHA3-$bits")
    val d = md.digest(s.getBytes)
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = Hex((d(i) >> 4) & 0xF)
      out(2 * i + 1) = Hex(d(i) & 0xF)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** JVM reference for oracle generation and specs. */
  def hex(s: String, bits: Int): String =
    digest(UTF8String.fromString(s), bits).toString
}
