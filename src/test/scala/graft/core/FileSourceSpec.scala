package graft.core

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FileSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("graft_filesource").toString
    d
  }

  test("lines: splittable newline source with file lineage") {
    val dir = tmpDir()
    Files.write(Paths.get(dir, "a.log"), "one\ntwo\n".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "b.log"), "three\n".getBytes("UTF-8"))
    val got = FileSource.lines(spark, s"$dir/*.log")
      .select(regexp_extract(col("path"), "([ab])\\.log$", 1).as("f"), col("line"))
      .as[(String, String)].collect().toSet
    assert(got == Set(("a", "one"), ("a", "two"), ("b", "three")))
  }

  test("framed: octet-counting frames with (path, frame_idx) lineage; bad file flagged") {
    val dir = tmpDir()
    // RFC 6587 octet counting: "<len> <frame>"
    Files.write(Paths.get(dir, "ok.bin"), "3 foo5 hello".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "bad.bin"), "x not-octet-counted".getBytes("UTF-8"))
    val out = FileSource.framed(spark, s"$dir/*.bin", "octet")
      .select(regexp_extract(col("path"), "([a-z]+)\\.bin$", 1).as("f"),
        col("frame_error"), col("frame_idx"),
        col("frame").cast("string").as("frame"))
      .as[(String, Boolean, Option[Int], Option[String])].collect().toSet
    assert(out == Set(
      ("ok", false, Some(0), Some("foo")),
      ("ok", false, Some(1), Some("hello")),
      ("bad", true, None, None)))
  }

  test("linesStream: tails new files across micro-batches with checkpointed progress") {
    val dir = tmpDir()
    Files.write(Paths.get(dir, "first.log"), "a1\na2\n".getBytes("UTF-8"))
    val q = FileSource.linesStream(spark, dir)
      .writeStream.format("memory").queryName("tailed")
      .option("checkpointLocation", s"$dir/_ckpt")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("tailed").count() == 2)
      // a file that appears later is picked up by a later batch, not re-reading the first
      Files.write(Paths.get(dir, "second.log"), "b1\n".getBytes("UTF-8"))
      q.processAllAvailable()
      val got = spark.table("tailed").select("line").as[String].collect().toSet
      assert(got == Set("a1", "a2", "b1"))
    } finally q.stop()
  }

  test("framed: varint length-delimited roundtrips through the frame writer shape") {
    val dir = tmpDir()
    // two varint-framed payloads (lengths < 128 → single length byte)
    val payloads = Seq("alpha", "bee")
    val blob = payloads.flatMap(p => p.length.toByte +: p.getBytes("UTF-8").toSeq).toArray
    Files.write(Paths.get(dir, "v.bin"), blob)
    val got = FileSource.framed(spark, s"$dir/v.bin", "varint")
      .select(col("frame_idx"), col("frame").cast("string"))
      .as[(Int, String)].collect().toSeq.sortBy(_._1).map(_._2)
    assert(got == payloads)
  }
}
