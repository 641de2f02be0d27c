package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-metadata surface: a `_meta` struct column riding beside the data
  * columns — the batch analog of the reference's `EventMetadata`
  * (lib/vector-core/src/event/metadata.rs:27-57) and the VRL secrets
  * functions `get_secret`/`set_secret`/`remove_secret`
  * (lib/vector-vrl/functions/src/).
  *
  * Shape: `_meta = struct(source_id, lineage array<string>, secrets
  * map<string,string>)`. Pure column programs — narrow, codegen'd, and
  * transparent to every transform (they neither read nor shuffle on it).
  * The committed sink path ([[TokenPipeline.runMulti]]) REDACTS secrets
  * before writing, so credential material attached at the source (API
  * keys for a downstream sink, datadog_api_key in the reference) can flow
  * through the topology but never lands in sink storage.
  */
object Meta {

  val Col = "_meta"

  /** Attach a fresh `_meta` at the source boundary. */
  def attach(df: DataFrame, sourceId: String,
             secrets: Map[String, String] = Map.empty): DataFrame = {
    val secretsCol =
      if (secrets.isEmpty) map().cast("map<string,string>")
      else map(secrets.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    df.withColumn(Col, struct(
      lit(sourceId).as("source_id"),
      array(lit(sourceId)).as("lineage"),
      secretsCol.as("secrets")))
  }

  /** Append a stage name to the lineage trail (the component-path metadata
    * of the reference's event lifecycle).
    */
  def stamp(df: DataFrame, stage: String): DataFrame =
    df.withColumn(Col, struct(
      col(s"$Col.source_id").as("source_id"),
      concat(col(s"$Col.lineage"), array(lit(stage))).as("lineage"),
      col(s"$Col.secrets").as("secrets")))

  /** VRL `get_secret`: null when absent. */
  def getSecret(name: String): Column = element_at(col(s"$Col.secrets"), name)

  /** VRL `set_secret`. */
  def setSecret(df: DataFrame, name: String, value: Column): DataFrame =
    df.withColumn(Col, struct(
      col(s"$Col.source_id").as("source_id"),
      col(s"$Col.lineage").as("lineage"),
      map_concat(
        map_filter(col(s"$Col.secrets"), (k, _) => k =!= name),
        map(lit(name), value)).as("secrets")))

  /** VRL `remove_secret`. */
  def removeSecret(df: DataFrame, name: String): DataFrame =
    df.withColumn(Col, struct(
      col(s"$Col.source_id").as("source_id"),
      col(s"$Col.lineage").as("lineage"),
      map_filter(col(s"$Col.secrets"), (k, _) => k =!= name).as("secrets")))

  /** VRL `set_semantic_meaning` / the meaning query side
    * (set_semantic_meaning.cue): assigns a semantic label ("ip",
    * "timestamp", …) to a field path. In the reference this is event
    * metadata consulted by schema-aware sinks; here it is a
    * `_semantics map<string,string>` sidecar column (meaning → field
    * path) so a sink can resolve `meaning("ip")` to a concrete column
    * without the pipeline hard-coding names. Narrow, codegen'd, no
    * shuffle — same design as the `_meta` struct above.
    */
  val SemCol = "_semantics"

  def setSemanticMeaning(df: DataFrame, fieldPath: String,
                         meaning: String): DataFrame = {
    val base: Column =
      if (df.columns.contains(SemCol)) col(SemCol)
      else map().cast("map<string,string>")
    df.withColumn(SemCol, map_concat(
      map_filter(base, (k, _) => k =!= meaning),
      map(lit(meaning), lit(fieldPath))))
  }

  /** Resolve a semantic meaning to the column it labels (null if unset —
    * try_element_at, since ANSI element_at throws on a missing key).
    */
  def semanticField(df: DataFrame, meaning: String): Column =
    try_element_at(col(SemCol), lit(meaning))

  /** Clear ALL secrets, keep provenance — what a sink must do before
    * committing rows to storage.
    */
  def redact(df: DataFrame): DataFrame =
    df.withColumn(Col, struct(
      col(s"$Col.source_id").as("source_id"),
      col(s"$Col.lineage").as("lineage"),
      map().cast("map<string,string>").as("secrets")))
}
