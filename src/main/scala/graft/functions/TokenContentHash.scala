package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** 60-bit content hash of an `array<int>` token column in one native pass:
  * `h15(array_join(tokens, ","))` — the doc identity of the incremental
  * dedup ops ([[graft.tokens.TokenOps.contentHash]]).
  *
  * Why native: the column formulation routes through a higher-order
  * `transform` lambda (int→string cast), which Catalyst cannot codegen —
  * the WHOLE projection falls out of whole-stage codegen and the md5 input
  * string is materialized per row. This expression streams decimal token
  * bytes straight into the digest (no intermediate array or string) and
  * keeps the projection inside codegen. Value-identical to the column form
  * and to the DuckDB twin `CAST(concat('0x', substr(md5(
  * array_to_string(tokens, ',')), 1, 15)) AS BIGINT)`.
  */
case class TokenContentHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "token_content_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"token_content_hash needs array<int>, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    TokenContentHash.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenContentHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenContentHash =
    copy(child = newChild)
}

object TokenContentHash {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val Comma = Array(','.toByte)

  def compute(arr: ArrayData): Long = {
    val md = md5Local.get()
    md.reset()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (i > 0) md.update(Comma)
      md.update(java.lang.Integer.toString(arr.getInt(i))
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      i += 1
    }
    val d = md.digest()
    // first 60 bits = value of the leading 15 hex digits
    var v = 0L
    i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
