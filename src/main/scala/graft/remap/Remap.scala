package graft.remap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** VRL-style remap stage (reference: src/transforms/remap.rs:50-165 config,
  * 564-668 exec): an ordered program of per-row mutations with an error
  * lane. Re-expressed as a chain of Catalyst column expressions — each op
  * is a projection / `when` chain, so the whole program collapses into one
  * whole-stage-codegen'd select; no RDDs, no UDFs.
  *
  * Error semantics mirrored:
  *  - `abortWhen` = VRL `abort` / fallible-expression failure; the row is
  *    rerouted to the `dropped` port with (reason, message, component_id)
  *    metadata, like `reroute_dropped` (remap.rs:46, 149-153, 604-640).
  *  - first failing op wins (VRL aborts at the failure point).
  *  - `fanOut` = a VRL program returning an array of events
  *    (remap.rs:604-611 `TargetEvents::Logs`) → `explode`.
  */
final case class Remap(ops: Vector[Remap.Op] = Vector.empty, componentId: String = "remap") {
  import Remap._

  def set(name: String, value: Column): Remap = copy(ops = ops :+ Set(name, value))

  /** Fallible assignment: if `value` evaluates to null while `required`,
    * the row aborts with `reason` (VRL `!` abort-on-error semantics).
    */
  def setRequired(name: String, value: Column, reason: String): Remap =
    copy(ops = ops :+ Set(name, value) :+ AbortWhen(col(name).isNull, reason))

  def abortWhen(cond: Column, reason: String): Remap =
    copy(ops = ops :+ AbortWhen(cond, reason))

  /** Silent drop (VRL program returning no event / filter transform). */
  def filterKeep(cond: Column): Remap = copy(ops = ops :+ AbortWhen(!cond, FilteredReason))

  /** Fan-out: replace the row with one row per element of `arrayCol`. */
  def fanOut(name: String, arrayCol: Column): Remap = copy(ops = ops :+ FanOut(name, arrayCol))

  /** VRL `del(.field)` — drop a column. */
  def del(name: String): Remap = copy(ops = ops :+ Del(name))

  /** VRL field move: `.to = .from; del(.from)`. */
  def rename(from: String, to: String): Remap = copy(ops = ops :+ Rename(from, to))

  /** VRL `merge(., obj)` over a struct column: lift every field of the
    * struct to a top-level column (keeps the struct column itself out).
    */
  def mergeStruct(structCol: String, fields: Seq[String]): Remap =
    fields.foldLeft(this)((r, f) => r.set(f, col(structCol).getField(f))).del(structCol)

  /** Run the program. Returns (main, dropped); `dropped` carries the
    * reroute_dropped metadata columns and excludes silently-filtered rows.
    * Both are branches of one plan — persist upstream if consuming both.
    */
  def run(df: DataFrame): RemapResult = {
    val seeded = df.withColumn(ReasonCol, lit(null: String))
    val out = ops.foldLeft(seeded) {
      case (d, Set(name, value)) =>
        // ops after an abort must not fire: only evaluate on live rows
        d.withColumn(name, when(col(ReasonCol).isNull, value))
      case (d, AbortWhen(cond, reason)) =>
        d.withColumn(ReasonCol,
          when(col(ReasonCol).isNotNull, col(ReasonCol))
            .when(coalesce(cond, lit(false)), lit(reason)))
      case (d, FanOut(name, arr)) =>
        // explode_outer: aborted rows carry a null array and must survive
        // the fan-out to reach the dropped port
        d.withColumn(name, explode_outer(when(col(ReasonCol).isNull, arr)))
      case (d, Del(name)) => d.drop(name)
      case (d, Rename(from, to)) => d.withColumnRenamed(from, to)
    }
    val main = out.filter(col(ReasonCol).isNull).drop(ReasonCol)
    val dropped = out.filter(col(ReasonCol).isNotNull && col(ReasonCol) =!= FilteredReason)
      .withColumn("drop_reason", col(ReasonCol))
      .withColumn("message", concat(lit("remap aborted: "), col(ReasonCol)))
      .withColumn("component_id", lit(componentId))
      .drop(ReasonCol)
    RemapResult(main, dropped)
  }
}

object Remap {
  sealed trait Op
  final case class Set(name: String, value: Column) extends Op
  final case class AbortWhen(cond: Column, reason: String) extends Op
  final case class FanOut(name: String, arrayCol: Column) extends Op
  final case class Del(name: String) extends Op
  final case class Rename(from: String, to: String) extends Op

  val ReasonCol = "_remap_reason"
  val FilteredReason = "_filtered"

  final case class RemapResult(main: DataFrame, dropped: DataFrame)
}
