package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One BPE merge application: replace every greedy left-to-right,
  * non-overlapping occurrence of the adjacent pair `(a, b)` in an
  * `array<int>` token sequence with `newId` — the apply step of a
  * byte-pair-encoding training iteration
  * ([[graft.tokens.TokenOps.bpePairCounts]] is the count step; the argmax
  * pick is k driver rows). Greedy semantics: after a merge the written
  * `newId` is the new "previous" token, so `aaa` with merge `(a,a)→Z`
  * yields `Za`, not `aZ` — the reference BPE behavior.
  *
  * Fully NARROW and codegen'd: one O(n) pass per row, output array never
  * longer than the input; no shuffle, partitioning preserved.
  */
case class BpeMerge(child: Expression, a: Int, b: Int, newId: Int)
    extends UnaryExpression {

  override def dataType: DataType = child.dataType match {
    case t @ ArrayType(IntegerType, _) => t
    case t => throw new IllegalArgumentException(s"bpe_merge needs array<int>, got $t")
  }
  override def prettyName: String = "bpe_merge"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Int](n)
    var o = 0
    var i = 0
    while (i < n) {
      val t = v.getInt(i)
      if (o > 0 && out(o - 1) == a && t == b) out(o - 1) = newId
      else { out(o) = t; o += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, o))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val o = ctx.freshName("o")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      s"""
         |int $n = $v.numElements();
         |int[] $out = new int[$n];
         |int $o = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $t = $v.getInt($i);
         |  if ($o > 0 && $out[$o - 1] == $a && $t == $b) { $out[$o - 1] = $newId; }
         |  else { $out[$o++] = $t; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($out, $o));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BpeMerge =
    copy(child = newChild)
}
