package graft.remap

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RemapSpec extends SparkSpec {
  import spark.implicits._

  private def in = Seq(
    (1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40)
  ).toDF("id", "tag", "v")

  test("set + abortWhen: aborted rows reach dropped with metadata; ops after abort don't fire") {
    val Remap.RemapResult(main, dropped) = Remap()
      .set("doubled", col("v") * 2)
      .abortWhen(col("tag") === "b", "bad_tag")
      .set("post", col("doubled") + 1) // must stay null for aborted rows
      .run(in)
    assert(main.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L))
    val d = dropped.select("id", "drop_reason", "component_id").as[(Long, String, String)].collect()
    assert(d.toSeq == Seq((2L, "bad_tag", "remap")))
    assert(dropped.columns.contains("message"))
  }

  test("filterKeep drops silently (not in the dropped port)") {
    val Remap.RemapResult(main, dropped) = Remap()
      .filterKeep(col("v") >= 20)
      .run(in)
    assert(main.count() == 3 && dropped.count() == 0)
  }

  test("fanOut explodes arrays; aborted rows still reach dropped") {
    val df = in.withColumn("parts", array(col("id"), col("id") * 10))
    val Remap.RemapResult(main, dropped) = Remap()
      .abortWhen(col("tag") === "a", "nope")
      .fanOut("part", col("parts"))
      .run(df)
    assert(main.count() == 6) // 3 surviving rows × 2 parts
    assert(dropped.count() == 1)
  }

  test("del / rename / mergeStruct") {
    val df = in.withColumn("meta", struct(lit("x").as("k1"), (col("v") * 100).as("k2")))
    val Remap.RemapResult(main, _) = Remap()
      .rename("tag", "label")
      .mergeStruct("meta", Seq("k1", "k2"))
      .del("v")
      .run(df)
    assert(main.columns.toSet == Set("id", "label", "k1", "k2"))
    assert(main.filter(col("id") === 2).select("k2").as[Int].head() == 2000)
  }
}
