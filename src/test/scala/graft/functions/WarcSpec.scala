package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(id: Long, payload: String, tpe: String = "response"): String =
    s"WARC/1.0\r\nWARC-Type: $tpe\r\nWARC-Record-ID: <urn:uuid:rec-$id>\r\n" +
    s"WARC-Date: 2026-01-01T00:00:00Z\r\nWARC-Target-URI: http://x.com/$id\r\n" +
    s"Content-Length: ${payload.length}\r\n\r\n$payload"

  private def splitOf(blob: String): Option[Seq[String]] = {
    val r = Seq(blob).toDF("b")
      .select(Warc.splitRecords(col("b")).as("r"))
      .head()
    if (r.isNullAt(0)) None else Some(r.getAs[scala.collection.Seq[String]](0).toSeq)
  }

  test("split survives payloads embedding the header terminator") {
    val a = rec(1, "plain body")
    val b = rec(2, "part-one\r\n\r\npart-two") // the naive-split killer
    val c = rec(3, "")
    val blob = Seq(a, b, c).map(_ + "\r\n\r\n").mkString
    assert(splitOf(blob).contains(Seq(a, b, c)))
  }

  test("malformed streams go to the NULL lane") {
    assert(splitOf("HTTP/1.1 200 OK\r\n\r\n").isEmpty) // bad magic
    assert(splitOf(rec(1, "x")).isEmpty) // missing trailing separator
    val truncated = rec(1, "0123456789").dropRight(4) + "\r\n\r\n"
    assert(splitOf(truncated).isEmpty) // content-length past the end
    val noCl = "WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
    assert(splitOf(noCl).isEmpty)
  }

  test("splitAndParse round-trips the generator exactly") {
    val recs = Warc.genWarcRecords(spark, rows = 600, parts = 4).toDF()
    val parsed = Warc.splitAndParse(recs, perBlob = 50)
      .select("rec_id", "warc_type", "record_id", "content_length", "payload")
      .as[(Long, String, String, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(parsed.size == 600)
    (0L until 600L).foreach { id =>
      val w = Warc.rowOf(id)
      val hdrEnd = w.record.indexOf("\r\n\r\n")
      val payload = w.record.substring(hdrEnd + 4)
      val (_, tpe, rid, cl, pl) = parsed(id)
      assert(rid == s"<urn:uuid:rec-$id>", s"id $id")
      assert(cl == payload.length.toLong)
      assert(pl == payload)
      assert(w.record.contains(s"WARC-Type: $tpe"))
    }
    // the embedded-terminator lane is present in the generator
    assert((0L until 600L).count(_ % 6 == 0) ==
      parsed.values.count(_._5.contains("\r\n\r\n")))
  }

  test("generator is parallelism-invariant") {
    def digest(parts: Int) = Warc.genWarcRecords(spark, 500, parts).toDF()
      .agg(expr("bit_xor(xxhash64(rec_id, record))")).as[Long].head()
    assert(digest(2) == digest(16))
  }
}
