package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{DataFormatException, Deflater, GZIPInputStream, GZIPOutputStream, Inflater}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd compression codecs (VRL `encode_gzip`/`decode_gzip`/
  * `encode_zlib`/`decode_zlib`/`encode_zstd`/`decode_zstd`/`encode_snappy`/
  * `decode_snappy`/`encode_lz4`/`decode_lz4` — reference:
  * website/cue/reference/remap/functions/encode_gzip.cue et al.; also the
  * sink `compression` option). gzip/zlib use the JDK Deflater at a fixed
  * level with the default zero GZIP MTIME; zstd/snappy/lz4 use the
  * zstd-jni / snappy-java / lz4-java libraries already on the Spark
  * classpath (lz4 in self-describing frame format, zstd frames, snappy raw
  * block) — all byte-deterministic, so compressed payloads are
  * replay-stable.
  */
case class Compress(child: Expression, codec: String) extends UnaryExpression {
  require(Compression.Codecs.contains(codec), s"unknown codec $codec")
  override def dataType: DataType = BinaryType
  override def prettyName: String = s"encode_$codec"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"compress needs string/binary, got $t")
    }

  private def toBytes(v: Any): Array[Byte] = v match {
    case s: UTF8String => s.getBytes
    case b: Array[Byte] => b
  }

  override def nullSafeEval(v: Any): Any = Compression.compress(toBytes(v), codec)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val conv = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case _ => (c: String) => c
    }
    defineCodeGen(ctx, ev, c => s"""graft.functions.Compression.compress(${conv(c)}, "$codec")""")
  }

  override protected def withNewChildInternal(newChild: Expression): Compress =
    copy(child = newChild)
}

/** Inverse of [[Compress]]; emits the decompressed bytes as a UTF-8 string
  * (the VRL decode functions return strings). FALLIBLE like the reference's
  * `decode_gzip!`: a corrupt/truncated payload yields NULL (routable to a
  * dropped lane) instead of killing the task — the convention for every
  * function fed external data (same as the `_parse_ok` lanes).
  */
case class Decompress(child: Expression, codec: String) extends UnaryExpression {
  require(Compression.Codecs.contains(codec), s"unknown codec $codec")
  override def dataType: DataType = StringType
  override def prettyName: String = s"decode_$codec"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"decompress needs binary, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val r = Compression.decompressOrNull(v.asInstanceOf[Array[Byte]], codec)
    if (r == null) null else UTF8String.fromBytes(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |byte[] ${ev.value}_b = graft.functions.Compression.decompressOrNull($c, "$codec");
         |if (${ev.value}_b == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = UTF8String.fromBytes(${ev.value}_b);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Decompress =
    copy(child = newChild)
}

object Compression {
  val Codecs: Set[String] = Set("gzip", "zlib", "zstd", "snappy", "lz4")

  def compress(in: Array[Byte], codec: String): Array[Byte] = codec match {
    case "gzip" =>
      val bos = new ByteArrayOutputStream(in.length / 2 + 32)
      val g = new GZIPOutputStream(bos)
      g.write(in); g.close()
      bos.toByteArray
    case "zlib" =>
      val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
      d.setInput(in); d.finish()
      val bos = new ByteArrayOutputStream(in.length / 2 + 32)
      val buf = new Array[Byte](4096)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end()
      bos.toByteArray
    case "zstd" =>
      // default level 3 (the reference's zstd default); single-frame with
      // content size header — self-describing for decode
      com.github.luben.zstd.Zstd.compress(in, 3)
    case "snappy" =>
      org.xerial.snappy.Snappy.compress(in)
    case "lz4" =>
      // self-describing LZ4 frame (the interoperable `lz4` CLI format,
      // which the reference's lz4 codec reads/writes)
      val bos = new ByteArrayOutputStream(in.length / 2 + 32)
      val f = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
      f.write(in); f.close()
      bos.toByteArray
  }

  /** Total decode: null for ANY malformed payload (truncated, corrupt,
    * preset-dictionary zlib, wrong magic) — never throws, never loops.
    */
  def decompressOrNull(in: Array[Byte], codec: String): Array[Byte] =
    try decompress(in, codec)
    catch {
      case _: DataFormatException | _: java.io.IOException |
           _: com.github.luben.zstd.ZstdException |
           _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => null
    }

  private def decompress(in: Array[Byte], codec: String): Array[Byte] = codec match {
    case "gzip" =>
      val g = new GZIPInputStream(new java.io.ByteArrayInputStream(in))
      val bos = new ByteArrayOutputStream(in.length * 3 + 32)
      val buf = new Array[Byte](4096)
      var n = g.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = g.read(buf) }
      g.close()
      bos.toByteArray
    case "zlib" =>
      val inf = new Inflater()
      inf.setInput(in)
      val bos = new ByteArrayOutputStream(in.length * 3 + 32)
      val buf = new Array[Byte](4096)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        // any zero-byte step on an unfinished stream is malformed input:
        // truncation (needsInput), an FDICT preset-dictionary stream
        // (needsDictionary — inflate() would return 0 forever), or any
        // other stall — throw rather than busy-loop the task
        if (n == 0 && !inf.finished())
          throw new DataFormatException(
            if (inf.needsDictionary()) "zlib stream requires preset dictionary"
            else "truncated zlib stream")
        bos.write(buf, 0, n)
      }
      inf.end()
      bos.toByteArray
    case "zstd" =>
      val sz = com.github.luben.zstd.Zstd.getFrameContentSize(in)
      if (sz < 0 || sz > Int.MaxValue.toLong)
        throw new DataFormatException("zstd frame without decodable content size")
      com.github.luben.zstd.Zstd.decompress(in, sz.toInt)
    case "snappy" =>
      org.xerial.snappy.Snappy.uncompress(in)
    case "lz4" =>
      val f = new net.jpountz.lz4.LZ4FrameInputStream(
        new java.io.ByteArrayInputStream(in))
      val bos = new ByteArrayOutputStream(in.length * 3 + 32)
      val buf = new Array[Byte](4096)
      var n = f.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = f.read(buf) }
      f.close()
      bos.toByteArray
  }
}
