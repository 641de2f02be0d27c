package graft.parse

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** [[Dnstap]] against the parse_dnstap.cue golden frame (the BIND
  * ResolverQuery example with both request and response payloads, a
  * Cookie EDNS option, and an RFC 8914 Extended DNS Error).
  */
class DnstapSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  // the base64 frame from parse_dnstap.cue's example
  private val CueFrame = java.util.Base64.getDecoder.decode(
    "ChVqYW1lcy1WaXJ0dWFsLU1hY2hpbmUSC0JJTkQgOS4xNi4zGgBy5wEIAxACGAEiEAAAAAAA" +
    "AAAAAAAAAAAAAAAqECABBQJwlAAAAAAAAAAAADAw8+0CODVA7+zq9wVNMU3WNlI2kwIAAAAB" +
    "AAAAAAABCWZhY2Vib29rMQNjb20AAAEAAQAAKQIAAACAAAAMAAoACOxjCAG9zVgzWgUDY29t" +
    "AGAAbQAAAAByZLM4AAAAAQAAAAAAAQJoNQdleGFtcGxlA2NvbQAABgABAAApBNABAUAAADkA" +
    "DwA1AAlubyBTRVAgbWF0Y2hpbmcgdGhlIERTIGZvdW5kIGZvciBkbnNzZWMtZmFpbGVkLm9y" +
    "Zy54AQ==")

  test("cue golden frame: envelope fields") {
    val out = Dnstap.parse(CueFrame)
    assert(out != null)
    val j = mapper.readTree(out)
    assert(j.get("dataType").asText() == "Message")
    assert(j.get("dataTypeId").asInt() == 1)
    assert(j.get("extraInfo").asText() == "")
    assert(j.get("messageType").asText() == "ResolverQuery")
    assert(j.get("messageTypeId").asInt() == 3)
    assert(j.get("queryZone").asText() == "com.")
    assert(j.get("serverId").asText() == "james-Virtual-Machine")
    assert(j.get("serverVersion").asText() == "BIND 9.16.3")
    assert(j.get("socketFamily").asText() == "INET6")
    assert(j.get("socketProtocol").asText() == "UDP")
    assert(j.get("sourceAddress").asText() == "::")
    assert(j.get("sourcePort").asInt() == 46835)
    assert(j.get("responseAddress").asText() == "2001:502:7094::30")
    assert(j.get("responsePort").asInt() == 53)
    assert(j.get("time").asLong() == 1593489007920014129L)
    assert(j.get("timePrecision").asText() == "ns")
    assert(j.get("timestamp").asText() == "2020-06-30T03:50:07.920014129Z")
  }

  test("cue golden frame: request data (header, question, cookie opt)") {
    val j = mapper.readTree(Dnstap.parse(CueFrame)).get("requestData")
    assert(j.get("fullRcode").asInt() == 0)
    assert(j.get("rcodeName").asText() == "NoError")
    val h = j.get("header")
    assert(h.get("id").asInt() == 37634)
    assert(h.get("qr").asInt() == 0)
    assert(h.get("opcode").asInt() == 0)
    assert(h.get("qdCount").asInt() == 1)
    assert(h.get("anCount").asInt() == 0)
    assert(h.get("nsCount").asInt() == 0)
    assert(h.get("arCount").asInt() == 1)
    assert(!h.get("aa").asBoolean() && !h.get("ad").asBoolean())
    assert(!h.get("rd").asBoolean() && !h.get("ra").asBoolean())
    assert(!h.get("tc").asBoolean() && !h.get("cd").asBoolean())
    assert(h.get("rcode").asInt() == 0)
    val q = j.get("question").get(0)
    assert(q.get("domainName").asText() == "facebook1.com.")
    assert(q.get("class").asText() == "IN")
    assert(q.get("questionType").asText() == "A")
    assert(q.get("questionTypeId").asInt() == 1)
    val o = j.get("opt")
    assert(o.get("do").asBoolean())
    assert(o.get("ednsVersion").asInt() == 0)
    assert(o.get("extendedRcode").asInt() == 0)
    assert(o.get("udpPayloadSize").asInt() == 512)
    val opt = o.get("options").get(0)
    assert(opt.get("optCode").asInt() == 10)
    assert(opt.get("optName").asText() == "Cookie")
    assert(opt.get("optValue").asText() == "7GMIAb3NWDM=")
  }

  test("cue golden frame: response data (BADVERS, EDE)") {
    val j = mapper.readTree(Dnstap.parse(CueFrame)).get("responseData")
    assert(j.get("fullRcode").asInt() == 16)
    assert(j.get("rcodeName").asText() == "BADVERS")
    val h = j.get("header")
    assert(h.get("id").asInt() == 45880)
    assert(h.get("rcode").asInt() == 16)
    assert(h.get("arCount").asInt() == 1)
    val q = j.get("question").get(0)
    assert(q.get("domainName").asText() == "h5.example.com.")
    assert(q.get("questionType").asText() == "SOA")
    assert(q.get("questionTypeId").asInt() == 6)
    val o = j.get("opt")
    assert(!o.get("do").asBoolean())
    assert(o.get("ednsVersion").asInt() == 1)
    assert(o.get("extendedRcode").asInt() == 1)
    assert(o.get("udpPayloadSize").asInt() == 1232)
    val ede = o.get("ede").get(0)
    assert(ede.get("infoCode").asInt() == 9)
    assert(ede.get("purpose").asText() == "DNSKEY Missing")
    assert(ede.get("extraText").asText() ==
      "no SEP matching the DS found for dnssec-failed.org.")
  }

  test("malformed frames → null") {
    assert(Dnstap.parse(Array[Byte](0x0a, 0x7f)) == null) // truncated bytes
    assert(Dnstap.parse("not dnstap".getBytes) == null)
  }
}
