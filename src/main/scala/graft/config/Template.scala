package graft.config

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sink-path template syntax — `{{ field }}` refs plus strftime codes
  * (reference: src/template.rs:21,63,158-177; used by the file sink's
  * template path, src/sinks/file/mod.rs:51-60, and the S3 key_prefix
  * partitioner, src/sinks/s3_common/partitioner.rs:32-56).
  *
  * Compiles to a single `concat` Column — evaluated per row inside
  * whole-stage codegen, so a templated partition key costs one projection.
  * Use the rendered column with `partitionBy`: each distinct rendered value
  * becomes a partition directory, exactly like the reference's per-template
  * batch partitioning.
  */
object Template {

  private val Token = """(\{\{\s*([\w.]+)\s*\}\})|(%[A-Za-z%])""".r

  /** strftime subset → Spark datetime pattern. */
  private val Strf = Map(
    "%Y" -> "yyyy", "%y" -> "yy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%M" -> "mm", "%S" -> "ss", "%j" -> "DDD",
    "%b" -> "MMM", "%F" -> "yyyy-MM-dd", "%T" -> "HH:mm:ss")

  /** Compile a template to a Column. Field refs resolve via `field`
    * (default: top-level columns); strftime codes render `ts`.
    */
  def render(template: String, ts: Column,
             field: String => Column = col): Column = {
    val parts = Vector.newBuilder[Column]
    var last = 0
    for (m <- Token.findAllMatchIn(template)) {
      if (m.start > last) parts += lit(template.substring(last, m.start))
      if (m.group(2) != null) parts += field(m.group(2)).cast("string")
      else m.group(3) match {
        case "%%" => parts += lit("%")
        case code => parts += date_format(ts, Strf.getOrElse(code,
          throw new IllegalArgumentException(s"unsupported strftime code $code in: $template")))
      }
      last = m.end
    }
    if (last < template.length) parts += lit(template.substring(last))
    val ps = parts.result()
    if (ps.isEmpty) lit("") else concat(ps: _*)
  }
}
