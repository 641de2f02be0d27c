package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Byte-stream framing (reference: lib/codecs/src/decoding/framing/ —
  * `newline_delimited`, `character_delimited`, `octet_counting`,
  * `length_delimited`, `varint_length_delimited`, `chunked_gelf`): the
  * reference frames a socket byte stream into discrete event payloads
  * before codec decode. The batch analog: a blob column (one ingest
  * unit — a file chunk, a socket capture, a Kafka record batch) splits
  * into an `array<binary>` of frames, then `explode` + the codec
  * functions take over — the same two-stage framing→decode shape,
  * expressed as columns.
  *
  * Modes (all from the public specs):
  *  - `newline` / `char` — delimiter split (trailing empty frame from a
  *    terminal delimiter is dropped, as the reference's framer does);
  *  - `octet` — RFC 6587 octet counting: ASCII length, space, payload;
  *  - `length4be` — 4-byte big-endian length prefix per frame;
  *  - `varint` — protobuf-style varint length prefix (the dnstap /
  *    frame-stream framing).
  *
  * Malformed framing (truncated frame, non-digit octet count) → null,
  * the fallible-decode convention. GELF chunk REASSEMBLY
  * ([[GelfChunkParse]]) is the one stateful framer: chunks carry
  * (message id, seq, count) headers and reassemble with a groupBy —
  * see `Framing.reassembleGelf` for the composed plan.
  */
case class FrameSplit(child: Expression, mode: String, delim: Byte = '\n')
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = s"frame_split_$mode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"frame_split needs binary, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    FrameSplit.split(v.asInstanceOf[Array[Byte]], mode, delim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_a =
         |  graft.functions.FrameSplit.split($c, "$mode", (byte) $delim);
         |if (${ev.value}_a == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_a; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FrameSplit =
    copy(child = newChild)
}

object FrameSplit {

  /** null on malformed framing. */
  def split(b: Array[Byte], mode: String, delim: Byte): ArrayData = {
    val out = new java.util.ArrayList[Array[Byte]]()
    mode match {
      case "newline" | "char" =>
        val d = if (mode == "newline") '\n'.toByte else delim
        var start = 0
        var i = 0
        while (i < b.length) {
          if (b(i) == d) {
            out.add(java.util.Arrays.copyOfRange(b, start, i))
            start = i + 1
          }
          i += 1
        }
        if (start < b.length) out.add(java.util.Arrays.copyOfRange(b, start, b.length))
      case "octet" => // RFC 6587: "<len as ASCII digits><SP><payload>"
        var p = 0
        while (p < b.length) {
          var len = 0
          var digits = 0
          while (p < b.length && b(p) >= '0' && b(p) <= '9') {
            len = len * 10 + (b(p) - '0'); digits += 1; p += 1
            if (digits > 9) return null
          }
          if (digits == 0 || p >= b.length || b(p) != ' '.toByte) return null
          p += 1
          if (p + len > b.length) return null
          out.add(java.util.Arrays.copyOfRange(b, p, p + len))
          p += len
        }
      case "length4be" =>
        var p = 0
        while (p < b.length) {
          if (p + 4 > b.length) return null
          val len = ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
            ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
          p += 4
          if (len < 0 || p + len > b.length) return null
          out.add(java.util.Arrays.copyOfRange(b, p, p + len))
          p += len
        }
      case "varint" =>
        var p = 0
        while (p < b.length) {
          var len = 0L; var shift = 0
          var cont = true
          while (cont) {
            if (p >= b.length || shift > 35) return null
            val x = b(p) & 0xff; p += 1
            len |= (x & 0x7fL) << shift
            shift += 7
            cont = (x & 0x80) != 0
          }
          if (len < 0 || p + len > b.length) return null
          out.add(java.util.Arrays.copyOfRange(b, p, p + len.toInt))
          p += len.toInt
        }
      case other => throw new IllegalArgumentException(s"frame mode $other")
    }
    new GenericArrayData(out.toArray)
  }
}

/** One GELF chunk header (magic 0x1e 0x0f, 8-byte message id, sequence
  * number, sequence count, payload) → struct(id, seq, count, payload);
  * null for non-chunked or malformed input. Reassembly is then a plain
  * aggregation — see [[Framing.reassembleGelf]].
  */
case class GelfChunkParse(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("seq", IntegerType, nullable = false),
    StructField("count", IntegerType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "gelf_chunk_parse"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"gelf_chunk_parse needs binary, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    GelfChunkParse.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""org.apache.spark.sql.catalyst.InternalRow ${ev.value}_r =
         |  graft.functions.GelfChunkParse.parse($c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GelfChunkParse =
    copy(child = newChild)
}

object GelfChunkParse {
  def parse(b: Array[Byte]): InternalRow = {
    if (b.length < 12 || b(0) != 0x1e.toByte || b(1) != 0x0f.toByte) return null
    val seq = b(10) & 0xff
    val count = b(11) & 0xff
    if (count == 0 || count > 128 || seq >= count) return null
    val id = new java.lang.StringBuilder(16)
    var i = 2
    while (i < 10) { id.append(f"${b(i) & 0xff}%02x"); i += 1 }
    InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(id.toString),
      seq, count, java.util.Arrays.copyOfRange(b, 12, b.length))
  }
}

object Framing {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.graft.Bridge

  def frames(blob: Column, mode: String, delim: Byte = '\n'): Column =
    Bridge.column(FrameSplit(Bridge.expression(blob), mode, delim))

  def gelfChunk(c: Column): Column =
    Bridge.column(GelfChunkParse(Bridge.expression(c)))

  /** GELF chunk reassembly with the reference's malformed-stream
    * semantics (lib/codecs/src/decoding/framing/chunked_gelf.rs): total
    * chunk count bounded 1..128 and `seq < count` at parse ([[
    * GelfChunkParse]], rs:361), DUPLICATE chunks ignored (rs:424 —
    * routine under UDP retransmission; batch has no arrival order, so
    * the deterministic first-after-sort copy wins), chunks disagreeing
    * on the total count rejected, and incomplete/invalid messages
    * surfaced on an `error` lane instead of vanishing (the reference's
    * per-message 5 s timeout is a streaming concern with no batch
    * analog — a batch job sees the whole capture).
    *
    * Plan: a narrow codegen chunk parse + ONE id-keyed shuffle; id
    * cardinality = in-flight messages, so the aggregate is map-side
    * combinable and bounded. The dedupe/concat/count fold runs inside
    * `aggregate` over the ≤128-element sorted parts array — no second
    * shuffle. Returns (msg_id, message, error) where error ∈
    * {null, 'incomplete', 'inconsistent_count'}.
    */
  def reassembleGelfWithErrors(df: DataFrame, datagram: String): DataFrame = {
    val c = gelfChunk(col(datagram))
    val folded = df.where(c.isNotNull)
      .select(c.getField("id").as("msg_id"), c.getField("seq").as("seq"),
        c.getField("count").as("cnt"), c.getField("payload").as("payload"))
      .groupBy(col("msg_id"))
      .agg(
        min(col("cnt")).as("want_min"),
        max(col("cnt")).as("want_max"),
        array_sort(collect_list(struct(col("seq"), col("payload"))))
          .as("parts"))
      // one pass over the sorted parts: skip repeated seqs (duplicate
      // chunks), concat payloads, count distinct seqs
      .withColumn("st", aggregate(col("parts"),
        struct(lit(-1).as("last"), lit(Array.emptyByteArray).as("acc"),
          lit(0).as("n")),
        (st, p) => when(p.getField("seq") === st.getField("last"), st)
          .otherwise(struct(p.getField("seq").as("last"),
            concat(st.getField("acc"), p.getField("payload")).as("acc"),
            (st.getField("n") + lit(1)).as("n")))))
    folded.select(col("msg_id"),
      when(col("want_min") === col("want_max") &&
        col("st.n") === col("want_max"), col("st.acc")).as("message"),
      when(col("want_min") =!= col("want_max"), lit("inconsistent_count"))
        .when(col("st.n") < col("want_max"), lit("incomplete"))
        .as("error"))
  }

  /** Complete messages only — the happy-path view of
    * [[reassembleGelfWithErrors]] (same single-shuffle plan).
    */
  def reassembleGelf(df: DataFrame, datagram: String): DataFrame =
    reassembleGelfWithErrors(df, datagram)
      .where(col("error").isNull)
      .select(col("msg_id"), col("message"))
}
