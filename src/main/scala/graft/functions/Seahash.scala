package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd SeaHash (VRL `seahash` — reference:
  * website/cue/reference/remap/functions/seahash.cue; algorithm: the
  * public SeaHash v4 spec, ticki's construction). Four u64 lanes seeded
  * with the published constants, 32-byte rounds XOR-diffusing one
  * little-endian u64 per lane, a zero-extended little-endian tail read,
  * then the cross-lane-XOR + length finalizer. Returns the SIGNED i64 the
  * reference returns (the cue's "negative seahash" example).
  */
case class Seahash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "seahash"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"seahash needs a string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    Seahash.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Seahash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Seahash =
    copy(child = newChild)
}

object Seahash {
  private final val P = 0x6eed0e9da4d94a4fL

  private def diffuse(x0: Long): Long = {
    var x = x0 * P
    x ^= (x >>> 32) >>> (x >>> 60)
    x * P
  }

  /** Little-endian u64 from 8 bytes at `off`. */
  private def readU64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  /** Little-endian zero-extended read of `n` (< 8) bytes at `off`. */
  private def readTail(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    var i = n - 1
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  def hashBytes(buf: Array[Byte]): Long = {
    var a = 0x16f11fe89b0d677cL
    var b = 0xb480a793d8e6c86cL
    var c = 0x6fe2e5aaf078ebc9L
    var d = 0x14f994a4c5259381L
    val n = buf.length
    var off = 0
    val full = n & ~0x1f
    while (off < full) {
      a = diffuse(a ^ readU64(buf, off))
      b = diffuse(b ^ readU64(buf, off + 8))
      c = diffuse(c ^ readU64(buf, off + 16))
      d = diffuse(d ^ readU64(buf, off + 24))
      off += 32
    }
    var rem = n - off
    // drain full u64 lanes, then the zero-extended tail into the next lane
    var lane = 0
    while (rem >= 8) {
      val v = readU64(buf, off)
      lane match {
        case 0 => a = diffuse(a ^ v)
        case 1 => b = diffuse(b ^ v)
        case 2 => c = diffuse(c ^ v)
      }
      lane += 1; off += 8; rem -= 8
    }
    if (rem > 0) {
      val v = readTail(buf, off, rem)
      lane match {
        case 0 => a = diffuse(a ^ v)
        case 1 => b = diffuse(b ^ v)
        case 2 => c = diffuse(c ^ v)
        case 3 => d = diffuse(d ^ v)
      }
    }
    a ^= b
    c ^= d
    a ^= c
    a ^= n.toLong
    diffuse(a)
  }

  def hash(s: UTF8String): Long = hashBytes(s.getBytes)

  /** JVM reference for oracle generation and specs. */
  def of(s: String): Long = hashBytes(s.getBytes("UTF-8"))
}
