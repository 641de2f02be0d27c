package graft.sketch

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Mergeable Bloom-filter sketch over 60-bit content hashes — the
  * distributed form of the incremental-dedup pre-filter
  * ([[graft.tokens.TokenOps.bloomPrefilter]]).
  *
  * Why an aggregate and not a bit-position TABLE: the set-bit-rows form
  * ([[graft.tokens.TokenOps.bloomBits]]) is SQL-reproducible but pays a
  * distinct-shuffle of up to `k·|corpus|` rows and k broadcast hash
  * relations per probe; this sketch OR-merges fixed-size `mBits`-wide
  * bitsets map-side (associative + commutative → Spark partial
  * aggregation), emits ONE binary value, and probes with a narrow
  * codegen'd expression — no shuffle above `mBits/8` bytes per partition,
  * no per-probe hash relations. Same design as Spark's internal
  * `bloom_filter_agg`/`might_contain` runtime-filter pair (not registered
  * for SQL use), with the repo's deterministic md5 bit scheme so the
  * bits-table and sketch forms are provably bit-identical
  * (`BloomSketchSpec`).
  *
  * Bit scheme (shared with `TokenOps.bloomPos`, SQL-reproducible):
  * `pos(j, h) = h15("j|" + h) mod mBits` for j in [0, k) — h15 = first 60
  * bits of md5 ([[graft.text.Hashing.h15]]).
  */
object BloomSketch {

  /** First 60 bits of an md5 digest as a non-negative long (the value of
    * `conv(substr(md5hex, 1, 15), 16, 10)`).
    */
  private def head60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** `h15("j|" + h) mod mBits` — identical to the column formulation in
    * `TokenOps.bloomPos` (decimal ASCII of the long hash).
    */
  def bitPosition(j: Int, h: Long, mBits: Long): Long = {
    val md = md5Local.get()
    md.reset()
    val s = java.lang.Integer.toString(j) + "|" + java.lang.Long.toString(h)
    head60(md.digest(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))) % mBits
  }

  /** Set the k bit positions of `h` in a word-array bitset. */
  def setBits(words: Array[Long], h: Long, mBits: Long, k: Int): Unit = {
    var j = 0
    while (j < k) {
      val b = bitPosition(j, h, mBits)
      words((b >>> 6).toInt) |= (1L << (b & 63L))
      j += 1
    }
  }

  /** All k bit positions of `h` set in the packed sketch? `mBits` is
    * implied by the sketch length (`sketch.length * 8`). Static so codegen
    * can call it.
    */
  def mightContain(sketch: Array[Byte], h: Long, k: Int): Boolean = {
    val mBits = sketch.length.toLong * 8L
    var j = 0
    while (j < k) {
      val b = bitPosition(j, h, mBits)
      // byte i holds bits [i*8, i*8+8): little-endian within the byte
      if ((sketch((b >>> 3).toInt) & (1 << (b & 7L).toInt)) == 0) return false
      j += 1
    }
    true
  }

  /** Pack a word bitset to bytes: bit b → byte b/8, bit-in-byte b%8. */
  def pack(words: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](words.length * 8)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      var b = 0
      while (b < 8) { out(i * 8 + b) = ((w >>> (b * 8)) & 0xffL).toByte; b += 1 }
      i += 1
    }
    out
  }

  import org.apache.spark.sql.graft.Bridge

  /** Aggregate a long hash column into one `mBits`-wide packed sketch. */
  def agg(hash: Column, mBits: Long, k: Int): Column =
    Bridge.column(BloomSketchAgg(Bridge.expression(hash), mBits, k)
      .toAggregateExpression())

  /** Narrow probe: are all k positions of `hash` set in `sketch`? For a
    * sketch COLUMN (small sketches, sketch-per-group shapes). For one big
    * corpus-wide sketch use [[probe]] — a column would be copied out of
    * every joined row (measured 8 MB × |batch| memcpy).
    */
  def contains(sketch: Column, hash: Column, k: Int): Column =
    Bridge.column(BloomMightContain(
      Bridge.expression(sketch), Bridge.expression(hash), k))

  /** Narrow probe against a corpus-wide sketch shipped as a BROADCAST
    * variable: the executors fetch the bitset once per JVM; per row the
    * expression evaluates k md5 bit tests against the shared array —
    * nothing sketch-sized ever enters a row or a join.
    */
  def probe(sketch: org.apache.spark.broadcast.Broadcast[Array[Byte]],
            hash: Column, k: Int): Column =
    Bridge.column(BloomProbe(Bridge.expression(hash), sketch, k))
}

/** The OR-merge bitset aggregate. Buffer = `Array[Long]` of
  * `ceil(mBits/64)` words; update sets k md5-derived bits; merge is
  * word-wise OR (associative, commutative → map-side combinable); eval
  * emits the packed `binary` sketch, itself OR-remergeable downstream.
  */
case class BloomSketchAgg(child: Expression, mBits: Long, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(mBits > 0 && mBits % 64 == 0 && k >= 1,
    "mBits must be a positive multiple of 64; k >= 1")

  private val words = (mBits / 64).toInt

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomSketch.setBits(b, v.asInstanceOf[Long], mBits, k)
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { b(i) |= o(i); i += 1 }
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
      case t => TypeCheckResult.TypeCheckFailure(s"bloom_sketch needs bigint hash, got $t")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bloom_sketch"

  override def withNewMutableAggBufferOffset(o: Int): BloomSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomSketchAgg =
    copy(child = c.head)
}

/** Codegen'd membership probe against a packed sketch column. */
case class BloomMightContain(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {
  require(k >= 1, "k >= 1")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs (binary sketch, bigint hash), got ($l, $r)")
    }

  override def nullSafeEval(sketch: Any, h: Any): Any =
    BloomSketch.mightContain(sketch.asInstanceOf[Array[Byte]],
      h.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, h) => s"graft.sketch.BloomSketch.mightContain($s, $h, $k)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain =
    copy(left = l, right = r)
}

/** Membership probe whose sketch lives in a Spark broadcast variable (one
  * bitset per executor JVM, torrent-distributed) — the probe stays fully
  * narrow and codegen'd while the expression itself serializes as a
  * broadcast HANDLE, not the bitset.
  */
case class BloomProbe(child: Expression,
                      sketch: org.apache.spark.broadcast.Broadcast[Array[Byte]],
                      k: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(k >= 1, "k >= 1")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"bloom_probe needs bigint hash, got $t")
    }

  override def nullSafeEval(h: Any): Any =
    BloomSketch.mightContain(sketch.value, h.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomSketchBc", sketch,
      classOf[org.apache.spark.broadcast.Broadcast[Array[Byte]]].getName)
    val bytes = ctx.addMutableState("byte[]", "bloomSketchBytes",
      v => s"$v = (byte[]) $bcRef.value();")
    defineCodeGen(ctx, ev, h => s"graft.sketch.BloomSketch.mightContain($bytes, $h, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}
