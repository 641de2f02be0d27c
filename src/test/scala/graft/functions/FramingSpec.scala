package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** [[FrameSplit]] / [[GelfChunkParse]] against the public framing specs
  * (RFC 6587 octet counting, length/varint prefixes, GELF chunk header).
  */
class FramingSpec extends AnyFunSuite with graft.SparkSpec {

  private def parts(b: Array[Byte], mode: String, delim: Byte = '\n'): Seq[String] = {
    val a = FrameSplit.split(b, mode, delim)
    (0 until a.numElements()).map(i => new String(a.getBinary(i), "UTF-8"))
  }

  test("newline and char-delimited framing") {
    assert(parts("a\nbc\nd".getBytes, "newline") == Seq("a", "bc", "d"))
    // terminal delimiter yields no trailing empty frame
    assert(parts("a\nbc\n".getBytes, "newline") == Seq("a", "bc"))
    // interior empty frames survive
    assert(parts("a\n\nb".getBytes, "newline") == Seq("a", "", "b"))
    assert(parts("x|y|z".getBytes, "char", '|'.toByte) == Seq("x", "y", "z"))
  }

  test("octet counting (RFC 6587)") {
    assert(parts("5 hello6 world!".getBytes, "octet") == Seq("hello", "world!"))
    // non-digit prefix, missing space, short payload → null
    assert(FrameSplit.split("x hello".getBytes, "octet", ' '.toByte) == null)
    assert(FrameSplit.split("5hello".getBytes, "octet", ' '.toByte) == null)
    assert(FrameSplit.split("9 oops".getBytes, "octet", ' '.toByte) == null)
  }

  test("length4be and varint prefixes") {
    val l4 = Array[Byte](0, 0, 0, 2, 'h', 'i', 0, 0, 0, 1, '!')
    assert(parts(l4, "length4be") == Seq("hi", "!"))
    assert(FrameSplit.split(Array[Byte](0, 0, 0, 9, 'x'), "length4be", ' '.toByte) == null)
    val vi = Array[Byte](2, 'h', 'i', 1, '!')
    assert(parts(vi, "varint") == Seq("hi", "!"))
    assert(FrameSplit.split(Array[Byte](9, 'x'), "varint", ' '.toByte) == null)
  }

  test("gelf chunk header parse") {
    val chunk = Array[Byte](0x1e, 0x0f, 1, 2, 3, 4, 5, 6, 7, 8, 0, 2, 'p', 'q')
    val r = GelfChunkParse.parse(chunk)
    assert(r.getString(0) == "0102030405060708")
    assert(r.getInt(1) == 0 && r.getInt(2) == 2)
    assert(new String(r.getBinary(3), "UTF-8") == "pq")
    // bad magic / seq >= count → null
    assert(GelfChunkParse.parse(Array[Byte](0x1d, 0x0f, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1)) == null)
    assert(GelfChunkParse.parse(Array[Byte](0x1e, 0x0f, 0, 0, 0, 0, 0, 0, 0, 0, 2, 2)) == null)
  }

  test("reassembleGelf: complete messages only, seq order restored") {
    import org.apache.spark.sql.functions._
    val hdr = (id: Byte, seq: Byte, cnt: Byte) =>
      Array[Byte](0x1e, 0x0f, id, 0, 0, 0, 0, 0, 0, 0, seq, cnt)
    val rows = Seq(
      hdr(1, 1, 2) ++ "world".getBytes, // out of order on purpose
      hdr(1, 0, 2) ++ "hello ".getBytes,
      hdr(2, 0, 3) ++ "in".getBytes) // incomplete: 1 of 3
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(org.apache.spark.sql.Row(_))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("datagram",
          org.apache.spark.sql.types.BinaryType))))
    val out = Framing.reassembleGelf(df, "datagram")
      .select(col("msg_id"), decode(col("message"), "UTF-8").as("m")).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "0100000000000000")
    assert(out(0).getString(1) == "hello world")
  }

  test("reassembleGelf malformed-stream matrix: dup chunks, missing chunk, " +
    "inconsistent count, over-count seq (chunked_gelf.rs:361,424 semantics)") {
    import org.apache.spark.sql.functions._
    val hdr = (id: Byte, seq: Byte, cnt: Byte) =>
      Array[Byte](0x1e, 0x0f, id, 0, 0, 0, 0, 0, 0, 0, seq, cnt)
    val rows = Seq(
      // msg 1: complete, with an exact duplicate of seq 0 (UDP retransmit)
      hdr(1, 0, 2) ++ "du".getBytes,
      hdr(1, 0, 2) ++ "du".getBytes,
      hdr(1, 1, 2) ++ "p!".getBytes,
      // msg 2: duplicate seq with CONFLICTING payload — deterministic
      // first-after-sort copy wins, message still completes
      hdr(2, 0, 2) ++ "aa".getBytes,
      hdr(2, 0, 2) ++ "zz".getBytes,
      hdr(2, 1, 2) ++ "bb".getBytes,
      // msg 3: missing seq 1 of 3 → incomplete error lane
      hdr(3, 0, 3) ++ "x".getBytes,
      hdr(3, 2, 3) ++ "y".getBytes,
      // msg 4: chunks disagree on the total count → inconsistent_count
      hdr(4, 0, 2) ++ "p".getBytes,
      hdr(4, 1, 3) ++ "q".getBytes,
      // seq >= count (invalid header, rejected at parse) and bad magic:
      // both vanish at the narrow parse, never reach the aggregate
      hdr(5, 3, 2) ++ "no".getBytes,
      Array[Byte](0x00, 0x0f, 9, 0, 0, 0, 0, 0, 0, 0, 0, 1) ++ "no".getBytes)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(org.apache.spark.sql.Row(_))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("datagram",
          org.apache.spark.sql.types.BinaryType))))
    val all = Framing.reassembleGelfWithErrors(df, "datagram")
      .select(col("msg_id"), decode(col("message"), "UTF-8").as("m"), col("error"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(all.size == 4) // msgs 1-4; invalid headers never formed a message
    assert(all("0100000000000000") == (("dup!", null)))
    assert(all("0200000000000000") == (("aabb", null))) // "aa" < "zz" wins
    assert(all("0300000000000000") == ((null, "incomplete")))
    assert(all("0400000000000000") == ((null, "inconsistent_count")))
    // the happy-path view drops the error lanes
    val ok = Framing.reassembleGelf(df, "datagram").collect()
    assert(ok.length == 2)
  }

  test("gelf header rejects total-chunk counts outside 1..128 (GELF_MAX_TOTAL_CHUNKS)") {
    def mk(seq: Int, cnt: Int) =
      Array[Byte](0x1e, 0x0f, 1, 2, 3, 4, 5, 6, 7, 8, seq.toByte, cnt.toByte) ++ "p".getBytes
    assert(GelfChunkParse.parse(mk(0, 0)) == null) // count 0
    assert(GelfChunkParse.parse(mk(0, 129)) == null) // count > 128
    assert(GelfChunkParse.parse(mk(127, 128)) != null) // max valid
  }
}
