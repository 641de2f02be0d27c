package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** [[Otlp]] schema over [[ProtoWire]]: a hand-assembled
  * opentelemetry-proto logs.proto wire vector plus a full roundtrip.
  */
class OtlpSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("hand-assembled wire vector decodes") {
    // LogsData{resource_logs[0]{scope_logs[0]{log_records[0]{
    //   severity_text: "INFO" (field 3), body{string_value:"hi"} (field 5)}}}}
    val frame = hex("0a10 120e 120c 1a04494e464f 2a040a026869")
    val j = mapper.readTree(ProtoWire.decodeToJson(frame, Otlp.LogsData))
    val rec = j.get("resourceLogs").get(0).get("scopeLogs").get(0)
      .get("logRecords").get(0)
    assert(rec.get("severityText").asText() == "INFO")
    assert(rec.get("body").get("stringValue").asText() == "hi")
  }

  test("full roundtrip: resource attrs, nested body kvlist, trace ids") {
    val in =
      """{"resourceLogs":[{"resource":{"attributes":[
        |{"key":"service.name","value":{"stringValue":"checkout"}},
        |{"key":"host.id","value":{"intValue":7}}]},
        |"scopeLogs":[{"scope":{"name":"graft","version":"1.0"},
        |"logRecords":[
        |{"timeUnixNano":1700000000000000000,"severityNumber":17,
        |"severityText":"ERROR",
        |"body":{"kvlistValue":{"values":[
        |  {"key":"msg","value":{"stringValue":"boom"}},
        |  {"key":"code","value":{"intValue":500}}]}},
        |"attributes":[{"key":"retry","value":{"boolValue":true}}],
        |"flags":1,"traceId":"q6yrvA==","spanId":"AAECAw==",
        |"eventName":"exception"},
        |{"severityNumber":9,"body":{"doubleValue":2.5}}
        |]}],"schemaUrl":"https://opentelemetry.io/schemas/1.21.0"}]}"""
        .stripMargin.replaceAll("\n", "")
    val bytes = ProtoWire.encodeJson(in, Otlp.LogsData)
    assert(bytes != null)
    val j = mapper.readTree(ProtoWire.decodeToJson(bytes, Otlp.LogsData))
    val rl = j.get("resourceLogs").get(0)
    assert(rl.get("schemaUrl").asText() == "https://opentelemetry.io/schemas/1.21.0")
    val attrs = rl.get("resource").get("attributes")
    assert(attrs.get(0).get("key").asText() == "service.name")
    assert(attrs.get(0).get("value").get("stringValue").asText() == "checkout")
    assert(attrs.get(1).get("value").get("intValue").asLong() == 7L)
    val sl = rl.get("scopeLogs").get(0)
    assert(sl.get("scope").get("name").asText() == "graft")
    val recs = sl.get("logRecords")
    assert(recs.size() == 2)
    val r0 = recs.get(0)
    assert(r0.get("timeUnixNano").asLong() == 1700000000000000000L)
    assert(r0.get("severityNumber").asInt() == 17)
    val kv = r0.get("body").get("kvlistValue").get("values")
    assert(kv.get(0).get("value").get("stringValue").asText() == "boom")
    assert(kv.get(1).get("value").get("intValue").asLong() == 500L)
    assert(r0.get("attributes").get(0).get("value").get("boolValue").asBoolean())
    assert(r0.get("traceId").asText() == "q6yrvA==")
    assert(r0.get("eventName").asText() == "exception")
    assert(recs.get(1).get("body").get("doubleValue").asDouble() == 2.5)
  }

  test("malformed frame → null") {
    assert(ProtoWire.decodeToJson(hex("0aff"), Otlp.LogsData) == null)
  }
}
