package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** [[ProtoWire]] against the protobuf encoding-doc vectors (the public
  * "Test1"/"Test2"/packed examples) plus roundtrips over every
  * supported type.
  */
class ProtoWireSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("docs vectors: varint 150, string testing, packed repeated") {
    // message Test1 { int32 a = 1; } a=150 → 08 96 01
    assert(ProtoWire.decodeToJson(hex("089601"),
      Seq(ProtoField(1, "a", "int32"))) == "{\"a\":150}")
    // message Test2 { string b = 2; } b="testing" → 12 07 74 65 73 74 69 6e 67
    assert(ProtoWire.decodeToJson(hex("120774657374696e67"),
      Seq(ProtoField(2, "b", "string"))) == "{\"b\":\"testing\"}")
    // message Test4 { repeated int32 d = 4 [packed=true]; } d=[3,270,86942]
    // → 22 06 03 8E 02 9E A7 05
    assert(ProtoWire.decodeToJson(hex("2206038e029ea705"),
      Seq(ProtoField(4, "d", "int32", repeated = true))) == "{\"d\":[3,270,86942]}")
    // same field unpacked decodes identically
    assert(ProtoWire.decodeToJson(hex("2003 208e02 209ea705"),
      Seq(ProtoField(4, "d", "int32", repeated = true))) == "{\"d\":[3,270,86942]}")
  }

  test("zigzag, bool, negative int, unknown-field skipping") {
    // sint32: 0→0, -1→1, 1→2, -2→3 (encoding doc table)
    assert(ProtoWire.decodeToJson(hex("0801"),
      Seq(ProtoField(1, "s", "sint32"))) == "{\"s\":-1}")
    assert(ProtoWire.decodeToJson(hex("0803"),
      Seq(ProtoField(1, "s", "sint32"))) == "{\"s\":-2}")
    assert(ProtoWire.decodeToJson(hex("0801"),
      Seq(ProtoField(1, "b", "bool"))) == "{\"b\":true}")
    // int64 -2: 10-byte two's-complement varint
    assert(ProtoWire.decodeToJson(hex("08feffffffffffffffff01"),
      Seq(ProtoField(1, "n", "int64"))) == "{\"n\":-2}")
    // unknown fields (varint no 1, len-delim no 2) skip cleanly
    assert(ProtoWire.decodeToJson(hex("089601 120774657374696e67 1805"),
      Seq(ProtoField(3, "c", "int32"))) == "{\"c\":5}")
  }

  test("negative length varints → null, never a cursor rewind / hang") {
    // nested-message length 0xFFFFFFFA (negative as Int) — an unchecked
    // `toInt` would rewind the cursor and loop forever
    val nested = Seq(ProtoField(1, "m", "message",
      message = Seq(ProtoField(1, "x", "int32"))))
    assert(ProtoWire.decodeToJson(hex("0a faffffff0f"), nested) == null)
    // same malformed length on a packed repeated field
    assert(ProtoWire.decodeToJson(hex("0a faffffff0f"),
      Seq(ProtoField(1, "d", "int32", repeated = true))) == null)
    // and on string / bytes / unknown-field skip paths
    assert(ProtoWire.decodeToJson(hex("0a faffffff0f"),
      Seq(ProtoField(1, "s", "string"))) == null)
    assert(ProtoWire.decodeToJson(hex("0a faffffff0f"),
      Seq(ProtoField(2, "other", "int32"))) == null)
    // a length that exceeds Int.MaxValue (fits a varint, not an Int)
    assert(ProtoWire.decodeToJson(hex("0a ffffffffff7f"),
      Seq(ProtoField(1, "s", "string"))) == null)
  }

  test("schema-order output, last-wins merge, missing fields absent") {
    // wire has no 2 before no 1; JSON emits schema order
    assert(ProtoWire.decodeToJson(hex("100208 01"),
      Seq(ProtoField(1, "a", "int32"), ProtoField(2, "b", "int32"))) ==
      "{\"a\":1,\"b\":2}")
    // duplicate non-repeated: last wins (protobuf merge rule)
    assert(ProtoWire.decodeToJson(hex("0801 0809"),
      Seq(ProtoField(1, "a", "int32"))) == "{\"a\":9}")
    assert(ProtoWire.decodeToJson(Array.emptyByteArray,
      Seq(ProtoField(1, "a", "int32"))) == "{}")
  }

  test("roundtrip: every supported type through encode then decode") {
    val schema = Seq(
      ProtoField(1, "i", "int64"),
      ProtoField(2, "s", "string"),
      ProtoField(3, "d", "double"),
      ProtoField(4, "f", "float"),
      ProtoField(5, "b", "bool"),
      ProtoField(6, "z", "sint64"),
      ProtoField(7, "u", "uint64"),
      ProtoField(8, "fx", "fixed64"),
      ProtoField(9, "sf", "sfixed32"),
      ProtoField(10, "by", "bytes"),
      ProtoField(11, "r", "int32", repeated = true),
      ProtoField(12, "m", "message", message = Seq(
        ProtoField(1, "x", "int32"), ProtoField(2, "y", "string"))))
    val json = "{\"i\":-7,\"s\":\"héllo\",\"d\":2.5,\"f\":1.5,\"b\":true," +
      "\"z\":-1000,\"u\":12345,\"fx\":99,\"sf\":-4,\"by\":\"AQID\"," +
      "\"r\":[1,2,3],\"m\":{\"x\":8,\"y\":\"n\"}}"
    val wire = ProtoWire.encodeJson(json, schema)
    assert(wire != null)
    assert(ProtoWire.decodeToJson(wire, schema) == json)
  }

  test("malformed → null") {
    val s = Seq(ProtoField(1, "a", "int32"))
    assert(ProtoWire.decodeToJson(hex("08"), s) == null) // truncated varint
    assert(ProtoWire.decodeToJson(hex("1203ff"), s.map(_.copy(ptype = "string",
      no = 2))) == null) // truncated length-delim
    assert(ProtoWire.decodeToJson(hex("0f"), s) == null) // wire type 7
    assert(ProtoWire.decodeToJson(hex("0d01"), s) == null) // i32 for int32 field, truncated
    assert(ProtoWire.encodeJson("not json", s) == null)
    assert(ProtoWire.encodeJson("[1]", s) == null)
  }
}
