package graft.sketch

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** DDSketch-style mergeable quantile sketch (the analog of the reference's
  * AgentDDSketch / Distribution metric values,
  * lib/vector-core/src/event/metric/value.rs:20-82; algorithm from the
  * public DDSketch paper: relative-accuracy log-γ bucketing).
  *
  * `bucket(x) = ceil(ln(x) / ln γ)` for x > 0; the sketch is the bucket →
  * count map, which merges by per-key count addition — associative and
  * commutative, so Spark runs it with map-side partial aggregation, and the
  * emitted `map<int,long>` column is itself re-mergeable downstream
  * ([[DDSketch.merge]]), exactly how the reference ships sketches between
  * aggregate stages instead of raw samples.
  *
  * Quantile read-out is deterministic (rank walk over sorted buckets), so a
  * SQL engine can reproduce it bit-for-bit from the same bucketing rule —
  * see the `v_ddsketch` oracle.
  */
case class DDSketchAgg(child: Expression, gamma: Double,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Int, Long]] {

  private val lnGamma = math.log(gamma)

  override def createAggregationBuffer(): mutable.HashMap[Int, Long] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[Int, Long], input: InternalRow): mutable.HashMap[Int, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (x > 0) {
        val i = math.ceil(math.log(x) / lnGamma).toInt
        b.update(i, b.getOrElse(i, 0L) + 1L)
      }
    }
    b
  }

  override def merge(b: mutable.HashMap[Int, Long], o: mutable.HashMap[Int, Long]): mutable.HashMap[Int, Long] = {
    o.foreach { case (k, n) => b.update(k, b.getOrElse(k, 0L) + n) }
    b
  }

  /** Emit as map<int,long> with keys sorted ascending (deterministic). */
  override def eval(b: mutable.HashMap[Int, Long]): Any = {
    val ks = b.keys.toArray.sorted
    new ArrayBasedMapData(
      new GenericArrayData(ks.map(_.asInstanceOf[Any])),
      new GenericArrayData(ks.map(k => b(k).asInstanceOf[Any])))
  }

  override def serialize(b: mutable.HashMap[Int, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.size * 12)
    bb.putInt(b.size)
    b.keys.toArray.sorted.foreach { k => bb.putInt(k); bb.putLong(b(k)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Int, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[Int, Long]
    (0 until n).foreach(_ => m.update(bb.getInt, bb.getLong))
    m
  }

  override def dataType: DataType = MapType(IntegerType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "ddsketch"

  override def withNewMutableAggBufferOffset(o: Int): DDSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DDSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): DDSketchAgg =
    copy(child = c.head)
}

/** Re-merge already-built sketch map columns (downstream aggregation over
  * pre-aggregated sketches — the shape that lets a 100 TB job emit
  * per-partition sketches and combine them without touching raw values).
  */
case class DDSketchMergeAgg(child: Expression,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Int, Long]] {

  override def createAggregationBuffer(): mutable.HashMap[Int, Long] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[Int, Long], input: InternalRow): mutable.HashMap[Int, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val m = v.asInstanceOf[MapData]
      val ks: ArrayData = m.keyArray()
      val vs: ArrayData = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        val k = ks.getInt(i)
        b.update(k, b.getOrElse(k, 0L) + vs.getLong(i))
        i += 1
      }
    }
    b
  }

  override def merge(b: mutable.HashMap[Int, Long], o: mutable.HashMap[Int, Long]): mutable.HashMap[Int, Long] = {
    o.foreach { case (k, n) => b.update(k, b.getOrElse(k, 0L) + n) }
    b
  }

  override def eval(b: mutable.HashMap[Int, Long]): Any = {
    val ks = b.keys.toArray.sorted
    new ArrayBasedMapData(
      new GenericArrayData(ks.map(_.asInstanceOf[Any])),
      new GenericArrayData(ks.map(k => b(k).asInstanceOf[Any])))
  }

  override def serialize(b: mutable.HashMap[Int, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.size * 12)
    bb.putInt(b.size)
    b.keys.toArray.sorted.foreach { k => bb.putInt(k); bb.putLong(b(k)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Int, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[Int, Long]
    (0 until n).foreach(_ => m.update(bb.getInt, bb.getLong))
    m
  }

  override def dataType: DataType = MapType(IntegerType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "ddsketch_merge"

  override def withNewMutableAggBufferOffset(o: Int): DDSketchMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DDSketchMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): DDSketchMergeAgg =
    copy(child = c.head)
}

object DDSketch {
  /** γ for relative accuracy α = 1%: (1+α)/(1-α). */
  val DefaultGamma: Double = 1.01 / 0.99

  import org.apache.spark.sql.graft.Bridge

  /** Aggregate raw values into a sketch map column. */
  def sketch(c: Column, gamma: Double = DefaultGamma): Column =
    Bridge.column(DDSketchAgg(Bridge.expression(c.cast("double")), gamma)
      .toAggregateExpression())

  /** Merge pre-built sketch map columns. */
  def merge(sk: Column): Column =
    Bridge.column(DDSketchMergeAgg(Bridge.expression(sk)).toAggregateExpression())

  /** Total count in a sketch column. */
  def count(sk: Column): Column = aggregate(map_values(sk), lit(0L), _ + _)

  /** Quantile estimate from a sketch column: 1-based target rank
    * `floor(q·(n-1)) + 1`, first bucket whose cumulative count reaches it,
    * estimate = midpoint value `2γ^i/(γ+1)`. Runs as a (small) fold over
    * the already-aggregated map — not a per-raw-row path.
    */
  def quantile(sk: Column, q: Double, gamma: Double = DefaultGamma): Column = {
    val n = count(sk)
    val target = floor(lit(q) * (n - 1).cast("double")).cast("long") + lit(1L)
    val ks = array_sort(map_keys(sk))
    val found = aggregate(ks,
      struct(lit(0L).as("cum"), lit(null: java.lang.Integer).cast("int").as("bi")),
      (acc, k) => {
        val cum2 = acc.getField("cum") + element_at(sk, k)
        struct(cum2.as("cum"),
          when(acc.getField("bi").isNotNull, acc.getField("bi"))
            .when(cum2 >= target, k).as("bi"))
      })
    round(lit(2.0) * pow(lit(gamma), found.getField("bi").cast("double"))
      / lit(gamma + 1.0), 6)
  }
}
