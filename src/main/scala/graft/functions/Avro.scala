package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Fixed-schema Avro binary encode/decode (the reference's avro codec —
  * lib/codecs/src/decoding/format/avro.rs / encoding avro.rs), built on
  * the avro-1.12 CORE already on the Spark classpath (only the spark-avro
  * connector module is absent in this environment). Scope: flat records of
  * avro primitives (string/long/int/double/float/boolean/bytes), the shape
  * log events take on an avro-encoded topic. Codec-boundary expressions —
  * CodegenFallback is acceptable here (one datum read/write per row
  * dominates; these never sit inside a hot scan predicate).
  */
object Avro {
  private[functions] def catalystType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING => StringType
    case Schema.Type.LONG => LongType
    case Schema.Type.INT => IntegerType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES => BinaryType
    case t => throw new IllegalArgumentException(s"unsupported avro type $t")
  }

  private[functions] def structFor(schemaJson: String): StructType = {
    val s = new Schema.Parser().parse(schemaJson)
    require(s.getType == Schema.Type.RECORD, "avro schema must be a record")
    StructType(s.getFields.asScala.toSeq.map(f =>
      StructField(f.name(), catalystType(f.schema()), nullable = true)))
  }
}

/** struct → avro binary (single-datum, no container header — the framing
  * the reference's avro serializer emits per event).
  */
case class AvroEncode(child: Expression, schemaJson: String)
  extends UnaryExpression with CodegenFallback {

  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
  @transient private lazy val fields = schema.getFields.asScala.toSeq

  override def dataType: DataType = BinaryType
  override def prettyName: String = "avro_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType if st.fields.length == schema.getFields.size() =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"avro_encode needs a matching struct, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val row = v.asInstanceOf[InternalRow]
    val st = child.dataType.asInstanceOf[StructType]
    val rec = new GenericData.Record(schema)
    fields.zipWithIndex.foreach { case (f, i) =>
      val value = row.get(i, st.fields(i).dataType) match {
        case u: UTF8String => u.toString
        case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
        case other => other
      }
      rec.put(f.name(), value)
    }
    val bos = new ByteArrayOutputStream(64)
    val enc = EncoderFactory.get().binaryEncoder(bos, null)
    writer.write(rec, enc)
    enc.flush()
    bos.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): AvroEncode =
    copy(child = newChild)
}

/** avro binary → struct. FALLIBLE: malformed datums decode to NULL (the
  * reference's decode error lane), never a task failure.
  */
case class AvroDecode(child: Expression, schemaJson: String)
  extends UnaryExpression with CodegenFallback {

  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
  @transient private lazy val fields = schema.getFields.asScala.toSeq

  override def dataType: DataType = Avro.structFor(schemaJson)
  override def prettyName: String = "avro_decode"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"avro_decode needs binary, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    try {
      val dec = DecoderFactory.get().binaryDecoder(v.asInstanceOf[Array[Byte]], null)
      val rec = reader.read(null, dec)
      InternalRow.fromSeq(fields.map { f =>
        rec.get(f.name()) match {
          case null => null
          case s: CharSequence => UTF8String.fromString(s.toString)
          case b: java.nio.ByteBuffer =>
            val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
          case other => other
        }
      })
    } catch {
      case _: java.io.IOException | _: RuntimeException => null
    }

  override protected def withNewChildInternal(newChild: Expression): AvroDecode =
    copy(child = newChild)
}
