package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Gen, GenConfig}

/** `_meta` struct conventions: survives every pipeline stage, secrets are
  * get/set/removable VRL-style, and the committed sink path redacts
  * secrets so they never land in storage.
  */
class MetaSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = GenConfig(rows = 2000, parts = 4)

  test("_meta survives parse → enrich → remap → route with lineage intact") {
    val input = Meta.attach(Gen.tokenseq(spark, cfg).toDF(), "tokenseq",
      Map("api_key" -> "s3cr3t-key", "dd_key" -> "dd-123"))
    val (flagged, _) = TokenPipeline.dataflow(
      Meta.stamp(input, "ingest"), Gen.sourceAttrs(spark), 1024)
    val out = Meta.stamp(flagged, "route")
    val row = out.select(
      col("_meta.source_id"),
      array_join(col("_meta.lineage"), ","),
      Meta.getSecret("api_key")).as[(String, String, String)].head()
    assert(row._1 == "tokenseq")
    assert(row._2 == "tokenseq,ingest,route")
    assert(row._3 == "s3cr3t-key") // secrets readable in-flight
  }

  test("set_secret / remove_secret / get_secret behave like the VRL trio") {
    val df = Meta.attach(Seq(1).toDF("x"), "src", Map("a" -> "1"))
    val df2 = Meta.setSecret(df, "b", lit("2"))
    val df3 = Meta.setSecret(df2, "a", lit("9")) // overwrite
    val df4 = Meta.removeSecret(df3, "b")
    val (a, b) = df4.select(Meta.getSecret("a"), Meta.getSecret("b"))
      .as[(String, Option[String])].head()
    assert(a == "9" && b.isEmpty)
  }

  test("committed sink output never contains secrets; provenance survives") {
    val root = Files.createTempDirectory("meta-sinks").toString
    val input = Meta.attach(Gen.tokenseq(spark, cfg).toDF(), "tokenseq",
      Map("api_key" -> "s3cr3t-key"))
    val res = TokenPipeline.runMulti(spark, input, Gen.sourceAttrs(spark),
      TokenPipeline.Config(root, "job-meta"))
    val committed = res.table.read(spark).get
    assert(committed.columns.contains(Meta.Col))
    // every committed row: empty secrets map, source_id + lineage intact
    val bad = committed.filter(size(map_keys(col("_meta.secrets"))) =!= 0).count()
    assert(bad == 0L, "secrets leaked into committed sink data")
    assert(committed.filter(col("_meta.source_id") =!= "tokenseq").count() == 0L)
    // no column of the committed (on-disk) data contains the secret string
    val hits = committed
      .select(to_json(struct(committed.columns.map(col): _*)).as("j"))
      .filter(col("j").contains("s3cr3t")).count()
    assert(hits == 0L, "secret string present in sink parquet")
  }
}
