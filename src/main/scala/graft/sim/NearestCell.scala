package graft.sim

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid cell id: argmax over `cents` of cosine(child, cent),
  * ties broken by smaller cell id; NaN cosines sort LARGEST (Spark's
  * double ordering, so this expression is bit-compatible with the
  * `array_sort(struct(cos, -cell))` literal-argmax formulation and with a
  * SQL `row_number() OVER (ORDER BY cos DESC, cell)` oracle).
  *
  * This is the scale shape for cluster assignment when the cell count
  * exceeds what plan-literal unrolling can carry (~64 expressions): ONE
  * codegen'd expression loops over the centroid matrix per row — fully
  * NARROW, no N×nlist row fan-out, no aggregate, no join. The matrix
  * ships once per executor inside the serialized plan (nlist·dim floats —
  * model-sized; at the point it outgrows a plan payload you need
  * approximate probing, not exact argmax).
  *
  * All arithmetic is the repo's cross-engine form: element-order double
  * fold for dots, `dot/(norm_v*norm_c)` with per-side sqrt — identical in
  * the DuckDB twin.
  */
case class NearestCell(child: Expression, cents: Seq[Array[Float]])
    extends UnaryExpression {

  require(cents.nonEmpty, "need at least one centroid")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"nearest_cell needs float/double array, got $t")
  }

  // centroid matrix + norms materialized once per (de)serialized instance
  @transient private lazy val matrix: Array[Array[Float]] = cents.toArray
  @transient private lazy val centNorms: Array[Double] = matrix.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i); i += 1 }
    math.sqrt(s)
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val isF = elemIsFloat
    var vn = 0.0
    var i = 0
    while (i < n) {
      val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      vn += x * x; i += 1
    }
    vn = math.sqrt(vn)
    var best = 0
    var bestCos = Double.NegativeInfinity
    var j = 0
    while (j < matrix.length) {
      val c = matrix(j)
      val m = math.min(n, c.length)
      var s = 0.0
      i = 0
      while (i < m) {
        val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        s += x * c(i).toDouble; i += 1
      }
      val cos = s / (vn * centNorms(j))
      // Double.compare: NaN counts largest — Spark's sort order
      if (java.lang.Double.compare(cos, bestCos) > 0) { bestCos = cos; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val mref = ctx.addReferenceObj("centsMatrix", matrix, "float[][]")
    val nref = ctx.addReferenceObj("centNorms", centNorms, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val vn = ctx.freshName("vn")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val m = ctx.freshName("m")
      val cos = ctx.freshName("cos")
      val best = ctx.freshName("best")
      val bestCos = ctx.freshName("bestCos")
      s"""
         |int $n = $v.numElements();
         |double $vn = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $v.$get($i); $vn += x * x;
         |}
         |$vn = java.lang.Math.sqrt($vn);
         |int $best = 0;
         |double $bestCos = Double.NEGATIVE_INFINITY;
         |for (int $j = 0; $j < $mref.length; $j++) {
         |  float[] $c = $mref[$j];
         |  int $m = java.lang.Math.min($n, $c.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $s += ((double) $v.$get($i)) * ((double) $c[$i]);
         |  }
         |  double $cos = $s / ($vn * $nref[$j]);
         |  if (java.lang.Double.compare($cos, $bestCos) > 0) {
         |    $bestCos = $cos; $best = $j;
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}
