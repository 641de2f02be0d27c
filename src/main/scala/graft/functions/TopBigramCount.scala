package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence count of the most frequent adjacent word bigram in a token
  * array — the Gopher-style repetition signal, computed NARROW. Replaces
  * the explode→groupBy(doc, bigram)→max plan (a full-corpus-width shuffle
  * of every bigram string) with a per-row single-pass hash count inside
  * whole-stage codegen: at 100 TB the repetition gate costs zero shuffle.
  *
  * Bigrams are `"w1 w2"` (space-joined), identical to the
  * `concat_ws(" ", slice(tk, j, 2))` column formulation and the DuckDB
  * oracle's string_split shingling. < 2 tokens → 0.
  */
case class TopBigramCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "top_bigram_count"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"top_bigram_count needs array<string>, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    TopBigramCount.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TopBigramCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TopBigramCount =
    copy(child = newChild)
}

object TopBigramCount {
  private val Space = UTF8String.fromString(" ")

  /** Single pass: materialize each adjacent pair as `"a b"`, hash-count,
    * track the running max. O(tokens) time, O(distinct bigrams) transient
    * memory per row.
    */
  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    if (n < 2) return 0L
    val counts = new java.util.HashMap[UTF8String, Integer](math.min(n * 2, 1 << 16))
    var max = 0
    var i = 0
    var prev = if (a.isNullAt(0)) null else a.getUTF8String(0)
    while (i < n - 1) {
      val cur = if (a.isNullAt(i + 1)) null else a.getUTF8String(i + 1)
      if (prev != null && cur != null) {
        val bg = UTF8String.concat(prev, Space, cur)
        val c0 = counts.get(bg)
        val c = if (c0 == null) 1 else c0 + 1
        counts.put(bg, c)
        if (c > max) max = c
      }
      prev = cur
      i += 1
    }
    max.toLong
  }
}
