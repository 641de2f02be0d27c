package graft.sketch

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Mergeable HyperLogLog sketch (Flajolet et al., AofA 2007) over long
  * keys — distinct-count estimation with CONSTANT shuffle: an exact
  * `count(distinct key)` over 10^12 rows shuffles every distinct key;
  * this aggregate emits one 2^p-byte register array per partition
  * (merge = elementwise MAX — associative, commutative, idempotent, so
  * Spark partial-aggregates map-side AND re-merging overlapping sketches
  * never double-counts) and estimates cardinality within ~1.04/√m. The
  * fourth member of the repo's mergeable-sketch family (Bloom membership,
  * DDSketch quantiles, Count-Min frequencies, HLL cardinalities — the
  * sketch the reference's tag_cardinality_limit / cardinality counters
  * reach for at scale, src/transforms/tag_cardinality_limit at exact
  * cost).
  *
  * Register scheme (SQL-reproducible, the [[BloomSketch]] contract):
  * `h = h15("hll|" + x)` (first 60 bits of md5 of the decimal ASCII key),
  * `bucket = h mod m`, `w = h div m` (a 60−p-bit value),
  * `rho = (60 − p + 1) − bitlen(w)` — so a SQL twin rebuilds the exact
  * register array from raw data and the estimate matches bit-for-bit.
  * The estimator folds registers in INDEX ORDER (`Σ 2^−M_j` is a fixed-
  * order double sum, identical in a SQL ordered fold), applies
  * `α_m·m²/Σ` with the standard small-range linear-counting correction
  * (`E ≤ 2.5m` and empty registers → `m·ln(m/V)`); the large-range
  * correction is unreachable at 60 hash bits and is documented out.
  */
object Hll {

  private def head60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** `h15("hll|" + x)` — 60 bits, SQL-rebuildable. */
  def hash(x: Long): Long = {
    val md = md5Local.get()
    md.reset()
    val s = "hll|" + java.lang.Long.toString(x)
    head60(md.digest(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
  }

  /** Fold `x` into an m-register array (m = 1 << p). */
  def add(regs: Array[Byte], x: Long, p: Int): Unit = {
    val m = 1 << p
    val h = hash(x)
    val bucket = (h % m).toInt
    val w = h / m
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(w)
    val rho = (60 - p + 1) - bitlen
    if (rho > regs(bucket)) regs(bucket) = rho.toByte
  }

  /** The HLL estimator over a packed register array; `p` implied by
    * length. Register fold runs in index order (fixed-order double sum —
    * the SQL twin folds the same ordered list). NULL contract handled by
    * the caller ([[HllEstimate]]). Static so codegen can call it.
    */
  def estimateJvm(regs: Array[Byte]): Double = {
    val m = regs.length
    var sumInv = 0.0
    var zeros = 0
    var j = 0
    while (j < m) {
      val r = regs(j) & 0xff
      sumInv += 1.0 / (1L << r)
      if (r == 0) zeros += 1
      j += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val e = alpha * m * m / sumInv
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }

  import org.apache.spark.sql.graft.Bridge

  /** Aggregate a long key column into one 2^p-byte HLL register array. */
  def agg(key: Column, p: Int): Column =
    Bridge.column(HllAgg(Bridge.expression(key), p).toAggregateExpression())

  /** Cardinality estimate from a sketch column (codegen'd, narrow). */
  def estimate(sketch: Column, p: Int): Column =
    Bridge.column(HllEstimate(Bridge.expression(sketch), p))

  /** Aggregate that UNIONs pre-aggregated sketches — elementwise register
    * max over a BINARY sketch COLUMN. The rollup path a 100 TB metrics
    * store lives on: persist one (1<<p)-byte sketch per (series, bucket)
    * ONCE, then answer any window/rollup by merging sketch bytes instead
    * of re-scanning raw rows. Idempotent merge (max) → overlapping
    * windows and retries never inflate the estimate, unlike additive
    * counters.
    */
  def mergeAgg(sketch: Column, p: Int): Column =
    Bridge.column(HllMergeAgg(Bridge.expression(sketch), p)
      .toAggregateExpression())

  /** Elementwise max of two register arrays — the sketch-union law used
    * for downstream re-merging of persisted sketches.
    */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, "register arrays differ in size")
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) {
      out(i) = if ((a(i) & 0xff) >= (b(i) & 0xff)) a(i) else b(i)
      i += 1
    }
    out
  }
}

/** The elementwise-max register aggregate. Buffer = `Array[Byte](1 << p)`;
  * update folds the md5-derived (bucket, rho); merge is elementwise max
  * (associative, commutative, IDEMPOTENT — re-merging a sketch with
  * itself is a no-op, unlike additive sketches); eval emits the raw
  * register bytes, themselves max-remergeable downstream ([[Hll.merge]]).
  */
case class HllAgg(child: Expression, p: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {
  require(p >= 4 && p <= 16, "p must be in [4, 16]")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.add(b, v.asInstanceOf[Long], p)
    b
  }

  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b.length) {
      if ((o(i) & 0xff) > (b(i) & 0xff)) b(i) = o(i)
      i += 1
    }
    b
  }

  override def eval(b: Array[Byte]): Any = b.clone()
  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"hll needs bigint key, got $t")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll"

  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllAgg =
    copy(child = c.head)
}

/** Codegen'd cardinality estimate against a packed register column. A
  * sketch whose length is not exactly `1 << p` is malformed input → NULL,
  * the repo decoder contract.
  */
case class HllEstimate(child: Expression, p: Int) extends UnaryExpression {
  require(p >= 4 && p <= 16, "p must be in [4, 16]")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "hll_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"hll_estimate needs binary sketch, got $t")
    }

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[Array[Byte]]
    if (s.length != (1 << p)) null else Hll.estimateJvm(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""if ($s.length != ${1 << p}) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.sketch.Hll.estimateJvm($s);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

/** Sketch-union aggregate: elementwise register max over a binary sketch
  * column (see [[Hll.mergeAgg]]). A sketch whose length is not `1 << p`
  * is malformed input and rejected loudly — inputs here are this repo's
  * own persisted sketches, so silence would hide corruption.
  */
case class HllMergeAgg(child: Expression, p: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {
  require(p >= 4 && p <= 16, "p must be in [4, 16]")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[Array[Byte]]
      require(s.length == b.length,
        s"hll_merge: sketch of ${s.length} bytes, expected ${b.length}")
      var i = 0
      while (i < b.length) {
        if ((s(i) & 0xff) > (b(i) & 0xff)) b(i) = s(i)
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b.length) {
      if ((o(i) & 0xff) > (b(i) & 0xff)) b(i) = o(i)
      i += 1
    }
    b
  }

  override def eval(b: Array[Byte]): Any = b.clone()
  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"hll_merge needs binary sketch, got $t")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll_merge"

  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = c.head)
}
