package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct overlapping word `n`-gram shingles of a text column — the
  * candidate unit of every near-dup/contamination operator. Semantically
  * identical to the column formulation
  * `array_distinct(transform(sequence(1, size(tk)-(n-1)), j =>
  * concat_ws(" ", slice(tk, j, n))))` over `tk = split(text, " ", -1)`
  * (first-occurrence order, < n tokens → empty), but computed in ONE
  * native pass: Catalyst interprets higher-order-function lambdas per
  * element, and the transform/slice/concat_ws chain was the single
  * hottest atom of the curation/minhash plans (1.4 s of 5 s at sf0.1).
  *
  * Key observation making this allocation-light: `split` by ONE space
  * means separators are exactly one byte, so the n-gram joined by single
  * spaces equals the original text's byte range from token j's start to
  * token j+n-1's end — each shingle is a zero-copy byte-slice view, no
  * per-token materialization. Byte 0x20 never occurs inside a UTF-8
  * multibyte sequence, so byte scanning is unicode-safe.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"word_shingles needs string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    WordShingles.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** One pass over the UTF-8 bytes: token start offsets, then windowed
    * byte-slice shingles deduped in first-occurrence order.
    */
  def compute(u: UTF8String, n: Int): ArrayData = {
    val bytes = u.getBytes
    val len = bytes.length
    // token boundaries: starts(i) = first byte of token i; a token ends at
    // the byte before the next space (split(_, " ", -1) semantics: k spaces
    // → k+1 tokens, empties included)
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) starts.add(i + 1)
      i += 1
    }
    val nTok = starts.size()
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var j = 0
    while (j <= nTok - n) {
      val from = starts.get(j)
      // end of token j+n-1: next token's start minus the separating space,
      // or end-of-string for the last token
      val until = if (j + n < nTok) starts.get(j + n) - 1 else len
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      j += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}
