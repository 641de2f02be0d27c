package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** VRL `tag_types_externally` (reference: website/cue/reference/remap/
  * functions/tag_types_externally.cue): wrap every (nested) scalar in a
  * one-key object naming its type — `"Hello"` → `{"string":"Hello"}`,
  * `67.9` → `{"float":67.9}` — the shape some downstream consumers
  * (e.g. typed log stores) require. Objects and arrays recurse; `null`
  * stays `null` (the cue return types include "null"). Input is the
  * JSON document column form used across this library; malformed → null.
  */
case class TagTypesExternally(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "tag_types_externally"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"tag_types_externally needs a JSON string, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val r = TagTypesExternally.run(v.asInstanceOf[UTF8String].toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""String ${ev.value}_s = graft.functions.TagTypesExternally.run($c.toString());
         |if (${ev.value}_s == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = UTF8String.fromString(${ev.value}_s); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TagTypesExternally =
    copy(child = newChild)
}

object TagTypesExternally {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def run(json: String): String =
    try {
      val root = mapper.readTree(json)
      if (root == null) null else mapper.writeValueAsString(tag(root))
    } catch { case _: Exception => null }

  private def tag(n: JsonNode): JsonNode = {
    if (n.isNull) return n
    if (n.isObject) {
      val out = mapper.createObjectNode()
      val it = n.fields()
      while (it.hasNext) { val e = it.next(); out.set[JsonNode](e.getKey, tag(e.getValue)) }
      return out
    }
    if (n.isArray) {
      val out = mapper.createArrayNode()
      val it = n.elements()
      while (it.hasNext) out.add(tag(it.next()))
      return out
    }
    val wrap = mapper.createObjectNode()
    val tname =
      if (n.isTextual) "string"
      else if (n.isBoolean) "boolean"
      else if (n.isIntegralNumber) "integer"
      else "float"
    wrap.set[JsonNode](tname, n)
    wrap
  }
}

/** VRL `validate_json_schema` (validate_json_schema.cue): check a JSON
  * payload against a JSON Schema document. The reference loads the
  * schema from a file path and validates with a full draft-2020
  * implementation; this port takes the schema JSON inline (no file IO
  * inside an expression) and implements the core keyword subset that
  * covers the cue examples and typical log-shape contracts:
  *
  *   `type` (string or array of strings), `properties`, `required`,
  *   `items`, `enum` (scalars), `minimum`/`maximum`,
  *   `minLength`/`maxLength`, `pattern`, and `format` with the
  *   standard formats email / ipv4 / uuid / date-time. An UNKNOWN
  *   `format` fails validation unless `ignoreUnknownFormats` — the cue
  *   example pair ("custom format declaration" false/true).
  *
  * Malformed payload JSON → null (fallible); malformed schema throws at
  * first use (configuration error, not data error).
  */
case class ValidateJsonSchema(child: Expression, schemaJson: String,
                              ignoreUnknownFormats: Boolean = false)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "validate_json_schema"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"validate_json_schema needs a JSON string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    ValidateJsonSchema.run(v.asInstanceOf[UTF8String].toString, schemaJson,
      ignoreUnknownFormats)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("jsonSchema", schemaJson, "String")
    val ig = if (ignoreUnknownFormats) "true" else "false"
    nullSafeCodeGen(ctx, ev, c => {
      s"""Object ${ev.value}_o = graft.functions.ValidateJsonSchema.run($c.toString(), $sRef, $ig);
         |if (${ev.value}_o == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Boolean) ${ev.value}_o).booleanValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ValidateJsonSchema =
    copy(child = newChild)
}

object ValidateJsonSchema {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val EmailRe = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$".r
  private val Ipv4Re = "^((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])$".r
  private val UuidRe = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$".r
  private val DateTimeRe = "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?(Z|[+-]\\d{2}:\\d{2})$".r

  /** null on malformed payload; java.lang.Boolean otherwise. */
  def run(json: String, schemaJson: String, ignoreUnknown: Boolean): Object = {
    val doc = try mapper.readTree(json) catch { case _: Exception => return null }
    if (doc == null) return null
    val schema = mapper.readTree(schemaJson) // config error → throw
    java.lang.Boolean.valueOf(valid(doc, schema, ignoreUnknown))
  }

  private def typeOk(n: JsonNode, t: String): Boolean = t match {
    case "object" => n.isObject
    case "array" => n.isArray
    case "string" => n.isTextual
    case "integer" => n.isIntegralNumber
    case "number" => n.isNumber
    case "boolean" => n.isBoolean
    case "null" => n.isNull
    case _ => false
  }

  private def valid(n: JsonNode, s: JsonNode, ig: Boolean): Boolean = {
    if (!s.isObject) return true
    if (s.has("type")) {
      val t = s.get("type")
      val names = if (t.isArray) {
        val b = Seq.newBuilder[String]; val it = t.elements()
        while (it.hasNext) b += it.next().asText(); b.result()
      } else Seq(t.asText())
      if (!names.exists(typeOk(n, _))) return false
    }
    if (s.has("enum")) {
      val it = s.get("enum").elements()
      var hit = false
      while (it.hasNext && !hit) hit = it.next() == n
      if (!hit) return false
    }
    if (n.isTextual) {
      val v = n.asText()
      if (s.has("minLength") && v.length < s.get("minLength").asInt()) return false
      if (s.has("maxLength") && v.length > s.get("maxLength").asInt()) return false
      if (s.has("pattern") &&
        !java.util.regex.Pattern.compile(s.get("pattern").asText()).matcher(v).find()) return false
      if (s.has("format")) s.get("format").asText() match {
        case "email" => if (EmailRe.findFirstIn(v).isEmpty) return false
        case "ipv4" => if (Ipv4Re.findFirstIn(v).isEmpty) return false
        case "uuid" => if (UuidRe.findFirstIn(v).isEmpty) return false
        case "date-time" => if (DateTimeRe.findFirstIn(v).isEmpty) return false
        case _ => if (!ig) return false
      }
    }
    if (n.isNumber) {
      if (s.has("minimum") && n.asDouble() < s.get("minimum").asDouble()) return false
      if (s.has("maximum") && n.asDouble() > s.get("maximum").asDouble()) return false
    }
    if (n.isObject) {
      if (s.has("required")) {
        val it = s.get("required").elements()
        while (it.hasNext) if (!n.has(it.next().asText())) return false
      }
      if (s.has("properties")) {
        val it = s.get("properties").fields()
        while (it.hasNext) {
          val e = it.next()
          val child = n.get(e.getKey)
          if (child != null && !valid(child, e.getValue, ig)) return false
        }
      }
    }
    if (n.isArray && s.has("items")) {
      val it = n.elements()
      while (it.hasNext) if (!valid(it.next(), s.get("items"), ig)) return false
    }
    true
  }
}

/** VRL `replace_with` (replace_with.cue): regex replacement where each
  * match is rewritten by a CLOSURE over the match — `match.string` is
  * the whole match, `match.captures` the capture groups (null for
  * non-participating groups, as in VRL). `count` limits replacements
  * (-1 = all, the default; 1 = first only — the "Replace first
  * instance" cue example).
  *
  * The closure is a plain serializable Scala function `(whole,
  * captures) => replacement` — the library-API analog of the VRL block.
  * Deterministic and distributed (evaluated per-partition); eval-based
  * like the reference's closure (a user lambda can't be codegen'd, but
  * the expression still composes inside whole-stage codegen via
  * reference-object dispatch, same pattern as [[ProtoDecode]]).
  */
case class RegexReplaceWith(child: Expression, regex: String,
                            fn: (String, Seq[String]) => String,
                            count: Int = -1)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "replace_with"

  @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"replace_with needs a string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      RegexReplaceWith.run(v.asInstanceOf[UTF8String].toString, pattern, fn, count))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("rwPattern", pattern, "java.util.regex.Pattern")
    val fRef = ctx.addReferenceObj("rwFn", fn, "scala.Function2")
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = UTF8String.fromString(
         |  graft.functions.RegexReplaceWith.run($c.toString(), $pRef, (scala.Function2) $fRef, $count));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RegexReplaceWith =
    copy(child = newChild)
}

/** VRL `to_regex` (to_regex.cue): fallible string→regex coercion. The
  * value survives when `Pattern.compile` accepts it, else null — callers
  * branch on null exactly like the reference's `?? r''` fallback. A tiny
  * bounded LRU caches compile verdicts per task (queries feed few distinct
  * patterns; the cue notice warns per-value compilation is expensive).
  */
case class ToRegex(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "to_regex"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"to_regex needs a string, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    if (ToRegex.compiles(s)) v else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""if (graft.functions.ToRegex.compiles($c.toString())) { ${ev.value} = $c; }
         |else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ToRegex =
    copy(child = newChild)
}

object ToRegex {

  private val cache = new java.util.LinkedHashMap[String, java.lang.Boolean](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, java.lang.Boolean]): Boolean =
      size() > 1024
  }

  def compiles(s: String): Boolean = cache.synchronized {
    val hit = cache.get(s)
    if (hit != null) hit.booleanValue()
    else {
      val ok =
        try { java.util.regex.Pattern.compile(s); true }
        catch { case _: java.util.regex.PatternSyntaxException => false }
      cache.put(s, java.lang.Boolean.valueOf(ok))
      ok
    }
  }
}

object RegexReplaceWith {

  def run(in: String, p: java.util.regex.Pattern,
          fn: (String, Seq[String]) => String, count: Int): String = {
    val m = p.matcher(in)
    val sb = new java.lang.StringBuilder()
    var done = 0
    var last = 0
    while ((count < 0 || done < count) && m.find()) {
      sb.append(in, last, m.start())
      val caps = (1 to m.groupCount()).map(m.group(_)) // null for non-participating
      sb.append(fn(m.group(0), caps))
      last = m.end()
      // avoid an infinite loop on zero-width matches
      if (m.end() == m.start()) {
        if (last < in.length) { sb.append(in.charAt(last)); last += 1 } else last = in.length + 1
      }
      done += 1
    }
    if (last <= in.length) sb.append(in, last, in.length)
    sb.toString
  }
}
