package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, GZIPInputStream, GZIPOutputStream, Inflater}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd compression codecs (VRL `encode_gzip`/`decode_gzip`/
  * `encode_zlib`/`decode_zlib` — reference: website/cue/reference/remap/
  * functions/encode_gzip.cue et al.; also the sink `compression` option).
  * JDK Deflater at a fixed level, GZIP with the default zero MTIME —
  * byte-deterministic, so compressed payloads are replay-stable.
  */
case class Compress(child: Expression, gzip: Boolean) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = if (gzip) "encode_gzip" else "encode_zlib"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"compress needs string/binary, got $t")
    }

  private def toBytes(v: Any): Array[Byte] = v match {
    case s: UTF8String => s.getBytes
    case b: Array[Byte] => b
  }

  override def nullSafeEval(v: Any): Any = Compression.compress(toBytes(v), gzip)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val conv = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case _ => (c: String) => c
    }
    defineCodeGen(ctx, ev, c => s"graft.functions.Compression.compress(${conv(c)}, $gzip)")
  }

  override protected def withNewChildInternal(newChild: Expression): Compress =
    copy(child = newChild)
}

/** Inverse of [[Compress]]; emits the decompressed bytes as a UTF-8 string
  * (the VRL decode functions return strings).
  */
case class Decompress(child: Expression, gzip: Boolean) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = if (gzip) "decode_gzip" else "decode_zlib"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"decompress needs binary, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromBytes(Compression.decompress(v.asInstanceOf[Array[Byte]], gzip))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"UTF8String.fromBytes(graft.functions.Compression.decompress($c, $gzip))")

  override protected def withNewChildInternal(newChild: Expression): Decompress =
    copy(child = newChild)
}

object Compression {
  def compress(in: Array[Byte], gzip: Boolean): Array[Byte] =
    if (gzip) {
      val bos = new ByteArrayOutputStream(in.length / 2 + 32)
      val g = new GZIPOutputStream(bos)
      g.write(in); g.close()
      bos.toByteArray
    } else {
      val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
      d.setInput(in); d.finish()
      val bos = new ByteArrayOutputStream(in.length / 2 + 32)
      val buf = new Array[Byte](4096)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end()
      bos.toByteArray
    }

  def decompress(in: Array[Byte], gzip: Boolean): Array[Byte] =
    if (gzip) {
      val g = new GZIPInputStream(new java.io.ByteArrayInputStream(in))
      val bos = new ByteArrayOutputStream(in.length * 3 + 32)
      val buf = new Array[Byte](4096)
      var n = g.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = g.read(buf) }
      g.close()
      bos.toByteArray
    } else {
      val inf = new Inflater()
      inf.setInput(in)
      val bos = new ByteArrayOutputStream(in.length * 3 + 32)
      val buf = new Array[Byte](4096)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        // n == 0 with the stream finished is the normal empty-payload end;
        // n == 0 while more input is needed means a truncated stream
        if (n == 0 && !inf.finished() && inf.needsInput())
          throw new java.util.zip.DataFormatException("truncated zlib stream")
        bos.write(buf, 0, n)
      }
      inf.end()
      bos.toByteArray
    }
}
