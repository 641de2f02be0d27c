package graft.sketch

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Mergeable Count-Min sketch (Cormode & Muthukrishnan 2005) over long
  * keys — heavy-hitter frequency estimation with CONSTANT shuffle: the
  * exact per-key count of a 10^12-row stream needs a key-keyed shuffle of
  * every distinct key; this aggregate emits one `depth × width` counter
  * table per partition (merge = elementwise add — associative and
  * commutative, so Spark partial-aggregates map-side) and estimates
  * `count(x) ≈ min_j table[j][pos_j(x)]`, an upper bound that
  * overestimates by at most εN with probability 1−δ (ε = e/width,
  * δ = e^−depth). The third member of the repo's mergeable-sketch family
  * (Bloom membership, DDSketch quantiles, CMS frequencies — the counter
  * surface of the reference's aggregate/log_to_metric transforms,
  * src/transforms/aggregate.rs, at sketch cost).
  *
  * Cell scheme (SQL-reproducible, the [[BloomSketch]] contract):
  * `pos(j, x) = h15("cm" + j + "|" + x) mod width` — h15 = first 60 bits
  * of md5 ([[graft.text.Hashing.h15]] of the decimal ASCII key), so a SQL
  * twin rebuilds the exact integer table from raw data and the estimates
  * match bit-for-bit; counters are integer sums, order-independent.
  */
object CountMin {

  private def head60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** `h15("cm" + j + "|" + x) mod width`. */
  def cellPosition(j: Int, x: Long, width: Int): Int = {
    val md = md5Local.get()
    md.reset()
    val s = "cm" + java.lang.Integer.toString(j) + "|" + java.lang.Long.toString(x)
    (head60(md.digest(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
      % width).toInt
  }

  /** Add `inc` to the d cells of `x` in a flat `depth × width` table. */
  def add(tab: Array[Long], x: Long, depth: Int, width: Int, inc: Long): Unit = {
    var j = 0
    while (j < depth) {
      tab(j * width + cellPosition(j, x, width)) += inc
      j += 1
    }
  }

  /** `min_j table[j][pos_j(x)]` from the packed little-endian sketch;
    * `width` is implied by the sketch length and `depth`. Static so
    * codegen can call it.
    */
  def estimateJvm(sketch: Array[Byte], x: Long, depth: Int): Long = {
    val width = sketch.length / 8 / depth
    var best = Long.MaxValue
    var j = 0
    while (j < depth) {
      val idx = (j * width + cellPosition(j, x, width)) * 8
      var w = 0L
      var b = 7
      while (b >= 0) { w = (w << 8) | (sketch(idx + b) & 0xffL); b -= 1 }
      if (w < best) best = w
      j += 1
    }
    best
  }

  import org.apache.spark.sql.graft.Bridge

  /** Aggregate a long key column (weight 1 per row) into one packed
    * `depth × width` sketch.
    */
  def agg(key: Column, depth: Int, width: Int): Column =
    Bridge.column(CountMinAgg(Bridge.expression(key), depth, width)
      .toAggregateExpression())

  /** Point-frequency estimate from a sketch column (codegen'd, narrow). */
  def estimate(sketch: Column, key: Column, depth: Int): Column =
    Bridge.column(CountMinEstimate(
      Bridge.expression(sketch), Bridge.expression(key), depth))
}

/** The elementwise-add counter aggregate. Buffer = flat
  * `Array[Long](depth * width)`; update adds 1 to the d md5-derived
  * cells; merge is elementwise add (associative, commutative → map-side
  * combinable); eval emits the packed `binary` table, itself
  * add-remergeable downstream ([[BloomSketch.pack]] byte order).
  */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(depth >= 1 && width >= 1, "depth and width must be >= 1")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CountMin.add(b, v.asInstanceOf[Long], depth, width, 1L)
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = BloomSketch.pack(b)

  override def serialize(b: Array[Long]): Array[Byte] = BloomSketch.pack(b)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) {
      var w = 0L
      var j = 7
      while (j >= 0) { w = (w << 8) | (bytes(i * 8 + j) & 0xffL); j -= 1 }
      out(i) = w
      i += 1
    }
    out
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"count_min needs bigint key, got $t")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "count_min"

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CountMinAgg =
    copy(child = c.head)
}

/** Codegen'd point-frequency estimate against a packed sketch column. */
case class CountMinEstimate(left: Expression, right: Expression, depth: Int)
  extends BinaryExpression {
  require(depth >= 1, "depth >= 1")

  override def dataType: DataType = LongType
  override def prettyName: String = "count_min_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"count_min_estimate needs (binary sketch, bigint key), got ($l, $r)")
    }

  override def nullable: Boolean = true

  /** A sketch too short for `depth` rows (or a ragged length) is malformed
    * input → NULL, the repo decoder contract — never a division-by-zero
    * task crash in [[CountMin.estimateJvm]].
    */
  private def wellFormed(sketch: Array[Byte]): Boolean =
    sketch.length >= depth * 8 && sketch.length % (depth * 8) == 0

  override def nullSafeEval(sketch: Any, x: Any): Any = {
    val s = sketch.asInstanceOf[Array[Byte]]
    if (!wellFormed(s)) null
    else CountMin.estimateJvm(s, x.asInstanceOf[Long], depth)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, x) => {
      s"""if ($s.length < ${depth * 8} || $s.length % ${depth * 8} != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.sketch.CountMin.estimateJvm($s, $x, $depth);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountMinEstimate =
    copy(left = l, right = r)
}
