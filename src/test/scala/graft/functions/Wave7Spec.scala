package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Wave-7 native expressions against public reference vectors:
  * CBOR (RFC 8949 Appendix A), friendly-id base62 (cue example),
  * ip_pton/ntop, unflatten.
  */
class Wave7Spec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def dec(h: String): String = Cbor.decodeToJson(hex(h))

  test("cbor decode: RFC 8949 appendix-A integer vectors") {
    assert(dec("00") == "0")
    assert(dec("0a") == "10")
    assert(dec("17") == "23")
    assert(dec("1818") == "24")
    assert(dec("1903e8") == "1000")
    assert(dec("1a000f4240") == "1000000")
    assert(dec("1b000000e8d4a51000") == "1000000000000")
    assert(dec("1bffffffffffffffff") == "18446744073709551615") // unsigned max
    assert(dec("20") == "-1")
    assert(dec("29") == "-10")
    assert(dec("3863") == "-100")
    assert(dec("3903e7") == "-1000")
  }

  test("cbor decode: simple values and floats") {
    assert(dec("f4") == "false")
    assert(dec("f5") == "true")
    assert(dec("f6") == "null")
    assert(dec("f7") == "null") // undefined
    assert(dec("f90000") == "0")
    assert(dec("f93c00") == "1")   // half 1.0
    assert(dec("f97bff") == "65504")
    assert(dec("f9c400") == "-4")
    assert(dec("fa47c35000") == "100000")
    assert(dec("fb3ff199999999999a") == "1.1")
    assert(dec("f97e00") == "null") // NaN → JSON null
  }

  test("cbor decode: strings, arrays, maps") {
    assert(dec("60") == "\"\"")
    assert(dec("6161") == "\"a\"")
    assert(dec("6449455446") == "\"IETF\"")
    assert(dec("62225c") == "\"\\\"\\\\\"")
    assert(dec("80") == "[]")
    assert(dec("83010203") == "[1,2,3]")
    assert(dec("8301820203820405") == "[1,[2,3],[4,5]]")
    assert(dec("a0") == "{}")
    assert(dec("a201020304") == "{\"1\":2,\"3\":4}") // int keys stringify
    assert(dec("a26161016162820203") == "{\"a\":1,\"b\":[2,3]}")
    assert(dec("826161a161626163") == "[\"a\",{\"b\":\"c\"}]")
    assert(dec("4401020304") == "\"" +
      java.util.Base64.getEncoder.encodeToString(hex("01020304")) + "\"")
  }

  test("cbor decode: indefinite lengths and tags") {
    assert(dec("7f657374726561646d696e67ff") == "\"streaming\"")
    assert(dec("5f42010243030405ff") == "\"" +
      java.util.Base64.getEncoder.encodeToString(hex("0102030405")) + "\"")
    assert(dec("9fff") == "[]")
    assert(dec("9f018202039f0405ffff") == "[1,[2,3],[4,5]]")
    assert(dec("bf61610161629f0203ffff") == "{\"a\":1,\"b\":[2,3]}")
    // tag 0 (datetime) unwraps to the tagged string
    assert(dec("c074323031332d30332d32315432303a30343a30305a") ==
      "\"2013-03-21T20:04:00Z\"")
    // cue example: parse_cbor(base64 "oWVmaWVsZGV2YWx1ZQ==")
    assert(Cbor.decodeToJson(
      java.util.Base64.getDecoder.decode("oWVmaWVsZGV2YWx1ZQ==")) ==
      "{\"field\":\"value\"}")
  }

  test("cbor decode: malformed → null") {
    assert(dec("ff") == null)        // bare break
    assert(dec("1c") == null)        // reserved additional info
    assert(dec("61") == null)        // truncated text
    assert(dec("8301") == null)      // truncated array
    assert(dec("0001") == null)      // trailing garbage
    assert(Cbor.decodeToJson(Array.emptyByteArray) == null)
  }

  test("cbor encode roundtrip") {
    val json = "{\"id\":7,\"name\":\"x y\",\"ok\":true,\"v\":2.5," +
      "\"tags\":[1,-2,3],\"nest\":{\"deep\":null}}"
    assert(Cbor.decodeToJson(Cbor.encodeJson(json)) == json)
    // shortest-head ints
    assert(Cbor.encodeJson("23").sameElements(hex("17")))
    assert(Cbor.encodeJson("24").sameElements(hex("1818")))
    assert(Cbor.encodeJson("-1").sameElements(hex("20")))
    assert(Cbor.encodeJson("{\"field\":\"value\"}")
      .sameElements(hex("a1656669656c646576616c7565")))
    assert(Cbor.encodeJson("not json{") == null)
  }

  test("friendly id: cue vector + inverses + rejects") {
    assert(FriendlyId.toUuid("3s87yEvnmkiPBMHsj8bwwc") ==
      "7f41deed-d5e2-8b5e-7a13-ab4ff93cfad2")
    assert(FriendlyId.toUuid("7n42DGM5Tflk9n8mt7Fhc7") ==
      "ffffffff-ffff-ffff-ffff-ffffffffffff")
    assert(FriendlyId.toUuid("0") == "00000000-0000-0000-0000-000000000000")
    assert(FriendlyId.toUuid("not valid!") == null)
    assert(FriendlyId.toUuid("") == null)
    // 128-bit overflow (one past max)
    assert(FriendlyId.toUuid("7n42DGM5Tflk9n8mt7Fhc8") == null)
  }

  test("ip pton/ntop roundtrips") {
    assert(IpText.pton("1.2.3.4").sameElements(Array[Byte](1, 2, 3, 4)))
    assert(IpText.ntop(Array[Byte](192.toByte, 168.toByte, 0, 1)) == "192.168.0.1")
    assert(IpText.ntop(IpText.pton("2001:db8::7")) == "2001:db8::7")
    assert(IpText.ntop(IpText.pton("::1")) == "::1")
    assert(IpText.pton("999.1.1.1") == null)
    assert(IpText.ntop(Array[Byte](1, 2, 3)) == null)
  }

  test("unflatten: nesting, merge, recursion, fallibility") {
    assert(UnflattenJson.run("{\"a.b.c\":1}", ".") == "{\"a\":{\"b\":{\"c\":1}}}")
    assert(UnflattenJson.run("{\"a.b\":1,\"a.c\":2}", ".") ==
      "{\"a\":{\"b\":1,\"c\":2}}")
    // deeper keys overwrite a scalar prefix
    assert(UnflattenJson.run("{\"a\":1,\"a.b\":2}", ".") == "{\"a\":{\"b\":2}}")
    // object value + dotted sibling deep-merge
    assert(UnflattenJson.run("{\"a.b\":1,\"a\":{\"c\":2}}", ".") ==
      "{\"a\":{\"b\":1,\"c\":2}}")
    // recursive: nested object VALUES unflatten too
    assert(UnflattenJson.run("{\"x\":{\"p.q\":3}}", ".") ==
      "{\"x\":{\"p\":{\"q\":3}}}")
    assert(UnflattenJson.run("[1,2]", ".") == null)
    assert(UnflattenJson.run("nope", ".") == null)
    // custom separator
    assert(UnflattenJson.run("{\"a_b\":1}", "_") == "{\"a\":{\"b\":1}}")
  }
}
