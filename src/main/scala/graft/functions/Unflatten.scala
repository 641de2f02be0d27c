package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** VRL `unflatten` (reference: website/cue/reference/remap/functions/
  * unflatten.cue): the inverse of `flatten` — a JSON object with
  * separator-joined keys (`"a.b.c": v`) becomes nested objects
  * (`{"a":{"b":{"c":v}}}`). Matches the reference's semantics:
  *
  *  - keys merge deeply in first-seen order (`"a.b":1, "a.c":2` →
  *    `{"a":{"b":1,"c":2}}`);
  *  - a scalar already at a prefix is OVERWRITTEN by deeper keys
  *    (`"a":1, "a.b":2` → `{"a":{"b":2}}` — last nested write wins,
  *    the reference's recursive behavior);
  *  - non-object JSON or malformed input → null (fallible).
  *
  * Values pass through untouched (any JSON type). Default separator `.`.
  */
case class UnflattenJson(child: Expression, separator: String = ".")
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "unflatten"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"unflatten needs a JSON string, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val r = UnflattenJson.run(v.asInstanceOf[UTF8String].toString, separator)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sep = ctx.addReferenceObj("unflattenSep", separator, "String")
    nullSafeCodeGen(ctx, ev, c => {
      s"""String ${ev.value}_s = graft.functions.UnflattenJson.run($c.toString(), $sep);
         |if (${ev.value}_s == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = UTF8String.fromString(${ev.value}_s); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): UnflattenJson =
    copy(child = newChild)
}

object UnflattenJson {

  import com.fasterxml.jackson.databind.JsonNode

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def run(json: String, sep: String): String =
    try {
      val root = mapper.readTree(json)
      if (root == null || !root.isObject) return null
      mapper.writeValueAsString(
        unflattenNode(root.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode], sep))
    } catch { case _: Exception => null }

  /** One level of key-splitting; object VALUES unflatten recursively
    * first (the reference's `recursive: true` default).
    */
  private def unflattenNode(
      root: com.fasterxml.jackson.databind.node.ObjectNode,
      sep: String): com.fasterxml.jackson.databind.node.ObjectNode = {
    val out = mapper.createObjectNode()
    val it = root.fields()
    while (it.hasNext) {
      val e = it.next()
      val value =
        if (e.getValue.isObject)
          unflattenNode(
            e.getValue.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode], sep)
        else e.getValue
      val parts = e.getKey.split(java.util.regex.Pattern.quote(sep), -1)
      var node = out
      var i = 0
      while (i < parts.length - 1) {
        val child = node.get(parts(i))
        node =
          if (child != null && child.isObject)
            child.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          else {
            val fresh = mapper.createObjectNode()
            node.set(parts(i), fresh); fresh
          }
        i += 1
      }
      val existing = node.get(parts.last)
      (existing, value) match {
        // deep-merge when both sides are objects (a.b:1 then a:{c:2})
        case (eo: com.fasterxml.jackson.databind.node.ObjectNode,
              vo: com.fasterxml.jackson.databind.node.ObjectNode) =>
          val vit = vo.fields()
          while (vit.hasNext) { val f = vit.next(); eo.set[JsonNode](f.getKey, f.getValue) }
        case _ => node.set[JsonNode](parts.last, value)
      }
    }
    out
  }
}
