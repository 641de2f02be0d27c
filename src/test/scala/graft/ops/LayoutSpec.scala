package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def interleaveJvm(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    (0 until bits).foreach { i =>
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("z-value matches an independent bit-interleave recompute") {
    val rows = (0L until 500L).map(i => (i, (i * 37L) % 1024L, (i * 91L) % 1024L))
    val out = rows.toDF("id", "x", "y")
      .select(col("id"), Layout.zValue(col("x"), col("y"), 10).as("z"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, x, y) =>
      assert(out(id) == interleaveJvm(x, y, 10), s"row $id")
    }
  }

  test("negative coordinates -> NULL z, never a sign-extended garbage value") {
    val out = Seq((1L, -1L, 5L), (2L, 5L, -1L), (3L, 5L, 5L))
      .toDF("id", "x", "y")
      .select(col("id"), Layout.zValue(col("x"), col("y"), 8).as("z"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L) && out(2L) && !out(3L))
  }

  test("quadrant-prefix law: high z bits == z of the high coordinate bits") {
    // the property that makes Z-ranges axis-bounded rectangles
    val rows = (0L until 300L).map(i => ((i * 53L) % 256L, (i * 19L) % 256L))
    val df = rows.toDF("x", "y")
    val bad = df.select(
        shiftright(Layout.zValue(col("x"), col("y"), 8), 2 * 5).as("hi"),
        Layout.zValue(shiftright(col("x"), 5), shiftright(col("y"), 5), 3).as("qz"))
      .filter(col("hi") =!= col("qz")).count()
    assert(bad == 0L)
  }

  test("clusterByZ bounds BOTH column extents per partition; single-column sort does not") {
    // uniform 128x128 grid; 16 target files
    val grid = for (x <- 0 until 128; y <- 0 until 128) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y").repartition(8)
    def spans(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      d.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .select("sx", "sy").as[(Long, Long)].collect().toSeq
    val z = spans(Layout.clusterByZ(df, col("x"), col("y"), bits = 7, numFiles = 16))
    // z-partitions are compact curve ranges: both axes bounded well under
    // the full 0..127 domain for almost all partitions — a range that
    // straddles a top-level quadrant seam (the curve's jump) may span an
    // axis, but only O(1) of them can, vs ALL partitions for single-sort
    assert(z.nonEmpty, "no partitions")
    assert(z.count(_._1 > 64) <= 2 && z.count(_._2 > 64) <= 2, s"z spans: $z")
    assert(z.map(_._1).sum / z.size <= 64 && z.map(_._2).sum / z.size <= 64,
      s"z avg spans: $z")
    // the single-column layout leaves the OTHER axis unbounded everywhere
    val xs = spans(df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x")))
    assert(xs.forall { case (_, sy) => sy == 127 }, s"x-sort spans: $xs")
  }

  test("compactionGroups: bounded overshoot and own-group law for huge files") {
    // partition A: one 10 MB file + twenty 1 MB files; target 4 MB
    val mb = 1000000L
    val files = (("A", "big", 10 * mb) +:
      (1 to 20).map(i => ("A", f"s$i%02d", mb))) :+ (("B", "only", mb))
    val out = Layout.compactionGroups(files.toDF("p", "f", "b"),
      col("p"), col("f"), col("b"), targetBytes = 4 * mb)
      .select("part", "file", "bytes", "grp")
      .as[(String, String, Long, Long)].collect()
    val byGroup = out.filter(_._1 == "A").groupBy(_._4).view
      .mapValues(_.map(_._3).sum).toMap
    // the 10 MB file sorts first → exclusive cumsum 0 → group 0; nothing
    // else joins group 0 or 1 (its cumsum already covers them)
    val bigGrp = out.find(_._2 == "big").get._4
    assert(bigGrp === 0L)
    assert(byGroup(0L) === 10 * mb, s"big file must own its group: $byGroup")
    // every other group's total ≤ target + one file (bounded overshoot)
    byGroup.filterKeys(_ != 0L).foreach { case (g, tot) =>
      assert(tot <= 5 * mb, s"group $g total $tot")
    }
    // totals conserved; partition B independent
    assert(byGroup.values.sum === 30 * mb)
    assert(out.filter(_._1 == "B").map(_._4).toSeq === Seq(0L))
  }
}
