package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** VRL `uuid_from_friendly_id` (reference: website/cue/reference/remap/
  * functions/uuid_from_friendly_id.cue): base62 (0-9A-Za-z) decode of a
  * 128-bit word → canonical dashed-hex UUID. Fallible → null on
  * non-base62 characters or overflow past 128 bits.
  */
case class UuidFromFriendlyId(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "uuid_from_friendly_id"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val r = FriendlyId.toUuid(v.asInstanceOf[UTF8String].toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""String ${ev.value}_s = graft.functions.FriendlyId.toUuid($c.toString());
         |if (${ev.value}_s == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = UTF8String.fromString(${ev.value}_s); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UuidFromFriendlyId =
    copy(child = newChild)
}

object FriendlyId {

  private val Alphabet =
    "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
  private val Index: Array[Int] = {
    val a = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }
  private val Max = BigInt(1) << 128

  def toUuid(friendly: String): String = {
    if (friendly == null || friendly.isEmpty) return null
    var v = BigInt(0)
    var i = 0
    while (i < friendly.length) {
      val c = friendly.charAt(i).toInt
      val d = if (c < 128) Index(c) else -1
      if (d < 0) return null
      v = v * 62 + d
      if (v >= Max) return null
      i += 1
    }
    val hex = v.toString(16).reverse.padTo(32, '0').reverse
    hex.substring(0, 8) + "-" + hex.substring(8, 12) + "-" +
      hex.substring(12, 16) + "-" + hex.substring(16, 20) + "-" + hex.substring(20)
  }
}
