package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Shannon entropy over a string's code points (bits per
  * character) — VRL `shannon_entropy`. Replaces the nested higher-order
  * formulation (`aggregate(array_distinct(split(c,"")), …)`) whose lambdas
  * Catalyst interprets per element at O(distinct·len) per row; this is a
  * single primitive-loop call inside whole-stage codegen.
  *
  * Summation runs in first-occurrence order with per-term
  * `p * (ln p / ln 2)` — the same shape as the column formulation and the
  * DuckDB oracle (both compared after `round(_, 6)`).
  */
case class ShannonEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "shannon_entropy"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shannon_entropy needs a string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    ShannonEntropy.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShannonEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ShannonEntropy =
    copy(child = newChild)
}

object ShannonEntropy {
  private val Ln2 = math.log(2.0)

  /** Single-pass count + first-occurrence-order fold. */
  def compute(u: UTF8String): Double = {
    val s = u.toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.LinkedHashMap[Integer, Integer]()
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1 else prev + 1)
      i += Character.charCount(cp)
      n += 1
    }
    val nd = n.toDouble
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / nd
      acc += p * (math.log(p) / Ln2)
    }
    -acc
  }
}
