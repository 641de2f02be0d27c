package graft.functions

/** OTLP logs codec (reference: lib/codecs/src/decoding/format/ — the
  * reference ships an `opentelemetry` / OTLP decoder for its sources;
  * the wire schema is the PUBLIC opentelemetry-proto
  * `opentelemetry/proto/logs/v1/logs.proto`). Expressed as a
  * [[ProtoField]] tree over the from-scratch [[ProtoWire]] codec — no
  * protobuf-java or OTLP jar needed.
  *
  * Field numbers from the public .proto: LogsData.resource_logs=1;
  * ResourceLogs{resource=1, scope_logs=2, schema_url=3};
  * Resource{attributes=1, dropped_attributes_count=2};
  * ScopeLogs{scope=1, log_records=2, schema_url=3};
  * InstrumentationScope{name=1, version=2};
  * LogRecord{time_unix_nano=1(fixed64), severity_number=2(enum),
  * severity_text=3, body=5(AnyValue), attributes=6,
  * dropped_attributes_count=7, flags=8(fixed32), trace_id=9,
  * span_id=10, observed_time_unix_nano=11(fixed64), event_name=12};
  * AnyValue oneof{string_value=1, bool_value=2, int_value=3,
  * double_value=4, array_value=5, kvlist_value=6, bytes_value=7};
  * KeyValue{key=1, value=2}.
  *
  * AnyValue is recursive (arrays/kvlists of AnyValue); a proto schema
  * here is a static tree, so the recursion is unrolled to a fixed depth
  * of 2 — deeper nesting decodes as unknown fields (skipped), which is
  * the documented subset bound.
  */
object Otlp {

  private def anyValue(depth: Int): Seq[ProtoField] = {
    val scalars = Seq(
      ProtoField(1, "stringValue", "string"),
      ProtoField(2, "boolValue", "bool"),
      ProtoField(3, "intValue", "int64"),
      ProtoField(4, "doubleValue", "double"),
      ProtoField(7, "bytesValue", "bytes"))
    if (depth <= 0) scalars
    else scalars ++ Seq(
      ProtoField(5, "arrayValue", "message", message = Seq(
        ProtoField(1, "values", "message", repeated = true,
          message = anyValue(depth - 1)))),
      ProtoField(6, "kvlistValue", "message", message = Seq(
        ProtoField(1, "values", "message", repeated = true,
          message = keyValue(depth - 1)))))
  }

  private def keyValue(depth: Int): Seq[ProtoField] = Seq(
    ProtoField(1, "key", "string"),
    ProtoField(2, "value", "message", message = anyValue(depth)))

  val LogRecord: Seq[ProtoField] = Seq(
    ProtoField(1, "timeUnixNano", "fixed64"),
    ProtoField(2, "severityNumber", "int32"),
    ProtoField(3, "severityText", "string"),
    ProtoField(5, "body", "message", message = anyValue(2)),
    ProtoField(6, "attributes", "message", repeated = true,
      message = keyValue(1)),
    ProtoField(7, "droppedAttributesCount", "uint32"),
    ProtoField(8, "flags", "fixed32"),
    ProtoField(9, "traceId", "bytes"),
    ProtoField(10, "spanId", "bytes"),
    ProtoField(11, "observedTimeUnixNano", "fixed64"),
    ProtoField(12, "eventName", "string"))

  val LogsData: Seq[ProtoField] = Seq(
    ProtoField(1, "resourceLogs", "message", repeated = true, message = Seq(
      ProtoField(1, "resource", "message", message = Seq(
        ProtoField(1, "attributes", "message", repeated = true,
          message = keyValue(1)),
        ProtoField(2, "droppedAttributesCount", "uint32"))),
      ProtoField(2, "scopeLogs", "message", repeated = true, message = Seq(
        ProtoField(1, "scope", "message", message = Seq(
          ProtoField(1, "name", "string"),
          ProtoField(2, "version", "string"))),
        ProtoField(2, "logRecords", "message", repeated = true,
          message = LogRecord),
        ProtoField(3, "schemaUrl", "string"))),
      ProtoField(3, "schemaUrl", "string"))))
}
