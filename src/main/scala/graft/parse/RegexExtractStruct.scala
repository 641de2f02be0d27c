package graft.parse

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass anchored regex extraction into a struct of capture groups —
  * the native-Expression core of the grok parse stage.
  *
  * The built-in surface would be `rlike` + one `regexp_extract` per field:
  * k+1 full regex executions per row. This runs the match ONCE and emits
  * all groups as a (nullable) struct; null struct = no match (the fallible
  * parse lane). Implements `doGenCode`, so the parse stage stays inside
  * whole-stage codegen with a shared compiled `Pattern` per task.
  */
case class RegexExtractStruct(child: Expression, regex: String, fieldNames: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType =
    StructType(fieldNames.map(n => StructField(n, StringType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "regex_extract_struct"

  /** Semantically this expression IS deterministic; the marker is a
    * deliberate optimizer hint: without it, predicate pushdown inlines the
    * whole regex subtree into pushed-down filters and the match runs 2-3×
    * per row (observed ~20% end-to-end pipeline cost). Marking it
    * nondeterministic keeps the filter above the projection so the match
    * runs once. Safe because the only blocked rewrites are re-evaluations.
    */
  override lazy val deterministic: Boolean = false

  @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)

  override def nullSafeEval(input: Any): Any = {
    val m = pattern.matcher(input.toString)
    if (!m.matches()) null
    else {
      val arr = new Array[Any](fieldNames.length)
      var i = 0
      while (i < fieldNames.length) {
        val g = m.group(i + 1)
        arr(i) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      new GenericInternalRow(arr)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternRef = ctx.addReferenceObj("grokPattern", pattern,
      classOf[java.util.regex.Pattern].getName)
    val n = fieldNames.length
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.util.regex.Matcher m = $patternRef.matcher($c.toString());
         |if (m.matches()) {
         |  Object[] arr = new Object[$n];
         |  for (int i = 0; i < $n; i++) {
         |    String g = m.group(i + 1);
         |    arr[i] = g == null ? null : org.apache.spark.unsafe.types.UTF8String.fromString(g);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(arr);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RegexExtractStruct =
    copy(child = newChild)
}
