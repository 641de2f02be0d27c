package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Winnowing fingerprints of an `array<int>` token column in ONE native
  * pass — the selection stage of [[graft.tokens.Winnow]].
  *
  * Value-identical to the column formulation
  * {{{
  *   array_distinct(transform(sequence(1, m - (w-1)), j =>
  *     array_min(slice(gh, j, w))))
  *   // gh = transform(sequence(1, n - (k-1)), i =>
  *   //   h15(array_join(transform(slice(tokens, i, k), cast string), ",")))
  * }}}
  * (gram hash = first 15 hex digits of md5 of the comma-joined tokens —
  * [[graft.text.Hashing.h15]], reproducible in DuckDB), but Catalyst
  * interprets higher-order-function lambdas per element, and the nested
  * slice→cast→join→md5 chain measured 45 s for 100 k docs; this expression
  * computes the same values with per-gram digest updates (no intermediate
  * arrays or strings) and a monotonic-deque sliding-window minimum.
  *
  * Returns distinct window-min hashes in first-occurrence order (the
  * `array_distinct` order); fewer than `k + w - 1` tokens → empty array.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "winnow k and w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints needs array<int>, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    WinnowFingerprints.compute(v.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowFingerprints.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  private val Comma = Array(','.toByte)

  /** First 60 bits of an md5 digest as a non-negative long — the value of
    * `conv(substr(md5hex, 1, 15), 16, 10)`: nibbles 0..14 = the big-endian
    * long of bytes 0..7 shifted right one nibble.
    */
  private def head60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def compute(arr: ArrayData, k: Int, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Any])
    // per-token ASCII bytes once (shared by the k grams containing it)
    val tok = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tok(i) = java.lang.Integer.toString(arr.getInt(i))
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      i += 1
    }
    val md = MessageDigest.getInstance("MD5")
    val m = n - k + 1
    val gh = new Array[Long](m)
    i = 0
    while (i < m) {
      var j = i
      val end = i + k
      while (j < end) {
        md.update(tok(j))
        if (j + 1 < end) md.update(Comma)
        j += 1
      }
      gh(i) = head60(md.digest()) // digest() resets the instance
      i += 1
    }
    // sliding-window minimum over gh with a monotonic index deque, distinct
    // mins kept in first-occurrence order (array_distinct semantics)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](m)
    var head = 0; var tail = 0 // deque[head until tail], gh ascending
    i = 0
    while (i < m) {
      while (tail > head && gh(deque(tail - 1)) >= gh(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(gh(deque(head)))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}
