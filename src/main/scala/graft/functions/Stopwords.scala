package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Serializable token-membership counter: profile words hashed once at
  * plan build, membership tested per token in O(1). Shared by
  * [[StopwordHits]] and (as the per-language variant) [[LangIdLookup]].
  */
final class StopwordLookup(words: Seq[String]) extends Serializable {
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  def hits(a: ArrayData): Int = {
    val n = a.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}

/** Count of tokens present in a fixed profile — native single-pass
  * replacement for `size(filter(toks, t => profile.map(t === _).reduce(_
  * || _)))`, whose lambda Catalyst interprets per token × per profile
  * word. Same value (duplicates counted), hash-set membership instead of
  * an 8..40-way OR chain.
  */
case class StopwordHits(child: Expression, profile: Seq[String])
  extends UnaryExpression {

  private val lookup = new StopwordLookup(profile)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_hits"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"stopword_hits needs array<string>, got $t")
    }

  override def nullSafeEval(v: Any): Any = lookup.hits(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordLookup", lookup,
      classOf[StopwordLookup].getName)
    defineCodeGen(ctx, ev, c => s"$ref.hits($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

/** One-pass language argmax: word → bitmask of profile languages (a word
  * may belong to several profiles, e.g. "un" in es AND fr), five counters
  * incremented per token, then first-maximum tie-break in profile order
  * (alphabetical) with all-zero → "und".
  */
final class LangIdLookup(profiles: Seq[(String, Seq[String])]) extends Serializable {
  private val langNames = profiles.map(_._1)
  @transient private lazy val langs: Array[UTF8String] =
    langNames.map(UTF8String.fromString).toArray
  @transient private lazy val und = UTF8String.fromString("und")
  @transient private lazy val masks: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    profiles.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, (if (prev == null) 0 else prev.intValue()) | (1 << i))
      }
    }
    m
  }
  def langId(a: ArrayData): UTF8String = {
    val counts = new Array[Int](langs.length)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val mask = masks.get(a.getUTF8String(i))
        if (mask != null) {
          var m = mask.intValue()
          while (m != 0) {
            val b = java.lang.Integer.numberOfTrailingZeros(m)
            counts(b) += 1
            m &= m - 1
          }
        }
      }
      i += 1
    }
    var best = 0
    var bestIdx = -1
    var j = 0
    while (j < counts.length) {
      if (counts(j) > best) { best = counts(j); bestIdx = j }
      j += 1
    }
    if (bestIdx < 0) und else langs(bestIdx)
  }
}

/** Native language-ID over a token array — replaces the when-chain +
  * greatest() formulation whose expression tree re-embeds every
  * per-language interpreted filter in EVERY branch (≈30 interpreted
  * HOF filters per row once Catalyst expands the argmax).
  */
case class LangIdExpr(child: Expression, profiles: Seq[(String, Seq[String])])
  extends UnaryExpression {

  private val lookup = new LangIdLookup(profiles)

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"lang_id needs array<string>, got $t")
    }

  override def nullSafeEval(v: Any): Any = lookup.langId(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdLookup", lookup, classOf[LangIdLookup].getName)
    defineCodeGen(ctx, ev, c => s"$ref.langId($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}
