package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Mix

/** WARC (ISO 28500, the web-archive container CommonCrawl ships) record
  * framing + header parse — the ingest stage of a web-crawl training
  * pipeline (reference analog: the framing codecs,
  * lib/codecs/src/decoding/framing/, which stop at newline/length/octet;
  * WARC needs CONTENT-LENGTH-AWARE splitting because payloads routinely
  * contain the `\r\n\r\n` header terminator).
  *
  * A record is `WARC/x.y\r\n<headers>\r\n\r\n<Content-Length bytes>
  * \r\n\r\n`. [[WarcSplit]] walks a concatenated record stream
  * sequentially (header scan → Content-Length read → payload skip) — an
  * inherently imperative per-row loop, so it's a native codegen'd
  * expression like [[FrameSplit]]; malformed streams (bad magic, missing
  * terminator, truncated payload) → NULL, the repo decoder contract.
  *
  * Field EXTRACTION is deliberately left to plain column ops
  * (`regexp_extract` + `locate`/`substr` — see [[Warc.fields]]) so the
  * DuckDB twin applies byte-identical logic; the generator keeps payloads
  * ASCII so char offsets equal byte offsets in both engines.
  *
  * Scale shape: splitting and parsing are fully NARROW; one crawl blob
  * row in → records out via explode, partitioning like the input.
  */
object Warc {

  private val Sep = "\r\n\r\n"

  /** Split a concatenated WARC stream into records (header block +
    * payload, trailing separator removed). Null on any malformed record.
    */
  def split(blob: UTF8String): ArrayData = {
    val s = blob.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var p = 0
    while (p < s.length) {
      if (!s.startsWith("WARC/", p)) return null
      val he = s.indexOf(Sep, p)
      if (he < 0) return null
      val header = s.substring(p, he)
      val clIdx = header.indexOf("Content-Length: ")
      if (clIdx < 0) return null
      var q = clIdx + "Content-Length: ".length
      var len = 0L
      var digits = 0
      while (q < header.length && header.charAt(q) >= '0' && header.charAt(q) <= '9') {
        len = len * 10 + (header.charAt(q) - '0'); digits += 1; q += 1
        if (digits > 12) return null
      }
      if (digits == 0) return null
      val payloadStart = he + Sep.length
      val recEnd = payloadStart + len
      if (recEnd + Sep.length > s.length) return null
      if (s.substring(recEnd.toInt, recEnd.toInt + Sep.length) != Sep) return null
      out += UTF8String.fromString(s.substring(p, recEnd.toInt))
      p = recEnd.toInt + Sep.length
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Column: split a concatenated WARC stream into record strings. */
  def splitRecords(blob: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(WarcSplit(Bridge.expression(blob)))
  }

  /** Header fields + payload from ONE record string — plain column ops,
    * mirrored 1:1 by [[duckFields]]. `payload` is the Content-Length
    * substring after the first header terminator.
    */
  def fields(rec: Column): Seq[Column] = {
    val cl = regexp_extract(rec, "Content-Length: ([0-9]+)", 1).cast("long")
    Seq(
      regexp_extract(rec, "^WARC/([0-9.]+)", 1).as("warc_version"),
      regexp_extract(rec, "WARC-Type: ([^\r]+)", 1).as("warc_type"),
      regexp_extract(rec, "WARC-Record-ID: ([^\r]+)", 1).as("record_id"),
      regexp_extract(rec, "WARC-Target-URI: ([^\r]+)", 1).as("target_uri"),
      cl.as("content_length"),
      rec.substr(locate(Sep, rec) + lit(4), cl.cast("int")).as("payload"))
  }

  /** DuckDB twins of [[fields]] over a column named `rec` (same regexes,
    * same locate/substr arithmetic; chr(13)||chr(10) builds the CRLF).
    */
  def duckFields: String = {
    val sep = "chr(13)||chr(10)||chr(13)||chr(10)"
    """regexp_extract(rec, '^WARC/([0-9.]+)', 1) AS warc_version,
      |  regexp_extract(rec, 'WARC-Type: ([^CR]+)', 1) AS warc_type,
      |  regexp_extract(rec, 'WARC-Record-ID: ([^CR]+)', 1) AS record_id,
      |  regexp_extract(rec, 'WARC-Target-URI: ([^CR]+)', 1) AS target_uri,
      |  CAST(regexp_extract(rec, 'Content-Length: ([0-9]+)', 1) AS BIGINT) AS content_length,
      |  substr(substr(rec, strpos(rec, SEP) + 4),
      |    1, CAST(regexp_extract(rec, 'Content-Length: ([0-9]+)', 1) AS INT)) AS payload"""
      .stripMargin
      .replace("[^CR]", "[^\\r]")
      .replace("SEP", sep)
  }

  // ---- deterministic record generator -----------------------------------

  final case class WarcRec(rec_id: Long, record: String)

  private val Types = Vector("response", "request", "metadata", "warcinfo")
  private val Payload = Vector("data", "tokens", "crawl", "body", "page",
    "text", "html", "chunk")

  /** One WARC record per row id — pure function of the id; ~1 in 6
    * payloads embed a literal `\r\n\r\n` (the case naive `\r\n\r\n`
    * splitting corrupts and Content-Length framing must survive).
    */
  def rowOf(id: Long): WarcRec = {
    val sb = new StringBuilder
    val nw = 3 + Mix.bounded(0x3A01L, id, 1, 9)
    var j = 0
    while (j < nw) {
      if (j > 0) sb.append(' ')
      sb.append(Payload(Mix.bounded(0x3A02L, id, 10 + j, Payload.length)))
      j += 1
    }
    if (id % 6 == 0) sb.append("\r\n\r\nsecond-part")
    val payload = sb.toString
    val tpe = Types(Mix.bounded(0x3A03L, id, 2, Types.length))
    val rec =
      s"WARC/1.0\r\n" +
      s"WARC-Type: $tpe\r\n" +
      s"WARC-Record-ID: <urn:uuid:rec-$id>\r\n" +
      s"WARC-Date: 2026-01-0${id % 9 + 1}T00:00:00Z\r\n" +
      s"WARC-Target-URI: http://site${id % 37}.example.com/p/${id % 11}\r\n" +
      s"Content-Length: ${payload.length}\r\n" +
      s"\r\n$payload"
    WarcRec(id, rec)
  }

  def genWarcRecords(spark: SparkSession, rows: Long, parts: Int): Dataset[WarcRec] = {
    import spark.implicits._
    spark.range(0, rows, 1, parts).as[Long].map(rowOf)
  }

  /** Concatenate records into per-group crawl blobs (`perBlob` records in
    * id order, each with its trailing separator), split them back with
    * [[splitRecords]], and parse every record's fields. The oracle parses
    * the SAME fields directly from the per-record table — any framing
    * error (the embedded `\r\n\r\n` payloads) breaks the match.
    */
  def splitAndParse(recs: DataFrame, perBlob: Int): DataFrame = {
    val blobs = recs
      .withColumn("blob_id", expr(s"rec_id DIV $perBlob"))
      .groupBy(col("blob_id"))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("rec_id"), col("record")))),
        s => concat(s.getField("record"), lit(Sep)))).as("blob"))
    blobs
      .select(col("blob_id"), posexplode(splitRecords(col("blob"))).as(Seq("i", "rec")))
      .select((col("blob_id") * perBlob + col("i")).as("rec_id") +: fields(col("rec")): _*)
  }
}

case class WarcSplit(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "warc_split"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"warc_split needs string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    Warc.split(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_a =
         |  graft.functions.Warc.split($c);
         |if (${ev.value}_a == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_a; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WarcSplit =
    copy(child = newChild)
}
