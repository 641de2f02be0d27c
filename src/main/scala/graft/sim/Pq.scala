package graft.sim

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization primitives (Jégou, Douze, Schmid: "Product
  * Quantization for Nearest Neighbor Search", IEEE PAMI 2011) — the
  * compressed-domain ANN path: each vector is cut into `m` subspaces and
  * every subspace is quantized to the id of its nearest codeword, so a
  * D-float embedding becomes `m` small ints (16× less memory at m = D/4
  * float dims per code) and query-to-corpus distance is evaluated against
  * the codes alone (asymmetric distance computation, ADC) — the corpus
  * vectors are DROPPED after encoding and never rejoin the plan.
  *
  * Both expressions are fully codegen'd narrow maps over a plan-shipped
  * codebook matrix (`[m][ksub][dsub]` floats — model-sized, same transport
  * as [[NearestCell]]'s centroid matrix). All arithmetic is the repo's
  * cross-engine form: single-accumulator double folds in element order, so
  * a DuckDB twin reproduces every distance bit-for-bit.
  */
object Pq {

  /** Flatten `[m][ksub][dsub]` codebooks into a dense `float[m][ksub*dsub]`
    * matrix (codeword j of subspace s at offset `j*dsub`) — one reference
    * object per expression instance, cheap to ship and index.
    */
  def flat(codebooks: Seq[Seq[Array[Float]]]): Array[Array[Float]] =
    codebooks.map(cb => cb.toArray.flatten).toArray
}

/** `pq_encode(vec)` → `array<int>` of length m: per subspace `s`, the
  * codeword index minimizing the element-order L2² fold
  * `Σ_i (v[s·dsub+i] − cb[s][j][i])²`; ties and the all-NaN corner keep the
  * SMALLEST j (strict-less first-wins, the bit-compatible twin of a SQL
  * `row_number() OVER (ORDER BY d2, j) = 1`). Elements past the end of a
  * short input vector read as 0 (the [[NearestCell]] short-vector rule).
  */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Array[Float]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebook")
  private val dsub0 = codebooks.head.head.length
  require(dsub0 > 0 &&
    codebooks.forall(cb => cb.forall(_.length == dsub0) && cb.size == codebooks.head.size),
    "codebooks must be rectangular: equal ksub and dsub everywhere")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"pq_encode needs float/double array, got $t")
  }

  @transient private lazy val matrix: Array[Array[Float]] = Pq.flat(codebooks)
  @transient private lazy val ksub: Int = codebooks.head.size
  @transient private lazy val dsub: Int = dsub0

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val isF = elemIsFloat
    val out = new Array[Int](matrix.length)
    var s = 0
    while (s < matrix.length) {
      val cb = matrix(s)
      val base = s * dsub
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < ksub) {
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val x =
            if (base + i < n) { if (isF) v.getFloat(base + i).toDouble else v.getDouble(base + i) }
            else 0.0
          val d = x - cb(j * dsub + i).toDouble
          d2 += d * d
          i += 1
        }
        if (java.lang.Double.compare(d2, bestD) < 0) { bestD = d2; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val mref = ctx.addReferenceObj("pqCodebooks", matrix, "float[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val cb = ctx.freshName("cb")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val d2 = ctx.freshName("d2")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      s"""
         |int $n = $v.numElements();
         |int[] $out = new int[$mref.length];
         |for (int $s = 0; $s < $mref.length; $s++) {
         |  float[] $cb = $mref[$s];
         |  int $base = $s * $dsub;
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $j = 0; $j < $ksub; $j++) {
         |    double $d2 = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      double $x = ($base + $i < $n) ? (double) $v.$get($base + $i) : 0.0;
         |      double $d = $x - (double) $cb[$j * $dsub + $i];
         |      $d2 += $d * $d;
         |    }
         |    if (java.lang.Double.compare($d2, $bestD) < 0) { $bestD = $d2; $best = $j; }
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_lut(qvec)` → `array<double>` of m·ksub entries: the per-query ADC
  * lookup table — `lut[s·ksub + j] = Σ_i (q[s·dsub+i] − cb[s][j][i])²`,
  * each entry a per-subspace element-order fold. Computed ONCE per query
  * row (the query side is broadcast and tiny), so the per-candidate scan
  * does m table READS instead of D flops — the lookup-table step that
  * makes ADC the compressed-domain fast path in the PQ paper (Jégou et
  * al., PAMI 2011 §IV-A). The first probe of this repo's implementation
  * measured the no-LUT form (re-deriving subspace distances per pair,
  * O(D)/pair) SLOWER than brute force at 500k×100 — BENCH.md.
  */
case class PqLut(child: Expression, codebooks: Seq[Seq[Array[Float]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebook")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"pq_lut needs float/double array, got $t")
  }

  @transient private lazy val matrix: Array[Array[Float]] = Pq.flat(codebooks)
  @transient private lazy val ksub: Int = codebooks.head.size
  @transient private lazy val dsub: Int = codebooks.head.head.length

  override def nullSafeEval(q: Any): Any = {
    val v = q.asInstanceOf[ArrayData]
    val n = v.numElements()
    val isF = elemIsFloat
    val out = new Array[Double](matrix.length * ksub)
    var s = 0
    while (s < matrix.length) {
      val cb = matrix(s)
      val base = s * dsub
      var j = 0
      while (j < ksub) {
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val x =
            if (base + i < n) { if (isF) v.getFloat(base + i).toDouble else v.getDouble(base + i) }
            else 0.0
          val d = x - cb(j * dsub + i).toDouble
          d2 += d * d
          i += 1
        }
        out(s * ksub + j) = d2
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val mref = ctx.addReferenceObj("pqCodebooks", matrix, "float[][]")
    nullSafeCodeGen(ctx, ev, q => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val cb = ctx.freshName("cb")
      val base = ctx.freshName("base")
      val d2 = ctx.freshName("d2")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      s"""
         |int $n = $q.numElements();
         |double[] $out = new double[${matrix.length * ksub}];
         |for (int $s = 0; $s < $mref.length; $s++) {
         |  float[] $cb = $mref[$s];
         |  int $base = $s * $dsub;
         |  for (int $j = 0; $j < $ksub; $j++) {
         |    double $d2 = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      double $x = ($base + $i < $n) ? (double) $q.$get($base + $i) : 0.0;
         |      double $d = $x - (double) $cb[$j * $dsub + $i];
         |      $d2 += $d * $d;
         |    }
         |    $out[$s * $ksub + $j] = $d2;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** `pq_adc(lut, codes)` → double: the asymmetric PQ distance as m table
  * reads — `Σ_s lut[s·ksub + codes[s]]`, partials added in subspace order
  * (a SQL twin folds the s-ordered list of per-subspace distances and
  * computes the bit-identical double). O(m) per candidate; the O(D) work
  * moved into the once-per-query [[PqLut]].
  *
  * Malformed input (codes length ≠ m, code outside `[0, ksub)`, lut
  * length ≠ m·ksub) → NULL, the repo decoder contract — never an index
  * crash inside a task.
  */
case class PqAdc(left: Expression, right: Expression, m: Int, ksub: Int)
    extends BinaryExpression {

  require(m >= 1 && ksub >= 1, "need m >= 1 and ksub >= 1")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(l: Any, cs: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val codes = cs.asInstanceOf[ArrayData]
    if (codes.numElements() != m || lut.numElements() != m * ksub) return null
    var acc = 0.0
    var s = 0
    while (s < m) {
      val code = codes.getInt(s)
      if (code < 0 || code >= ksub) return null
      acc += lut.getDouble(s * ksub + code)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, cs) => {
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val code = ctx.freshName("code")
      val bad = ctx.freshName("bad")
      s"""
         |if ($cs.numElements() != $m || $l.numElements() != ${m * ksub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $s = 0; $s < $m; $s++) {
         |    int $code = $cs.getInt($s);
         |    if ($code < 0 || $code >= $ksub) { $bad = true; break; }
         |    $acc += $l.getDouble($s * $ksub + $code);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}
