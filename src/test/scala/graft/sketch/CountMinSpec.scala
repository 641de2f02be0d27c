package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val Depth = 4
  private val Width = 64

  private def keysDf(ks: Seq[Long], parts: Int = 4) =
    ks.toDF("t").repartition(parts)

  test("estimate is an upper bound and exact without collisions") {
    val keys = (1L to 40L).flatMap(k => Seq.fill(k.toInt)(k)) // count(k) = k
    val sk = keysDf(keys)
      .agg(CountMin.agg(col("t"), Depth, Width).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(sk.length == Depth * Width * 8)
    // upper bound for every key; exact equality = no collision in >= 1 row
    (1L to 40L).foreach { k =>
      val est = CountMin.estimateJvm(sk, k, Depth)
      assert(est >= k, s"key $k underestimated: $est")
    }
    // total mass per depth row is exactly the stream length
    val total = keys.length
    (0 until Depth).foreach { j =>
      var s = 0L
      (0 until Width).foreach { p =>
        val idx = (j * Width + p) * 8
        var w = 0L
        var b = 7
        while (b >= 0) { w = (w << 8) | (sk(idx + b) & 0xffL); b -= 1 }
        s += w
      }
      assert(s == total.toLong, s"row $j mass $s != $total")
    }
  }

  test("estimate matches a from-scratch table recompute") {
    val keys = Seq(3L, 3L, 3L, 7L, 7L, 1000000007L, -5L, -5L, 0L)
    val sk = keysDf(keys, 3)
      .agg(CountMin.agg(col("t"), Depth, Width).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val tab = new Array[Long](Depth * Width)
    keys.foreach(k => CountMin.add(tab, k, Depth, Width, 1L))
    keys.distinct.foreach { k =>
      val expect = (0 until Depth)
        .map(j => tab(j * Width + CountMin.cellPosition(j, k, Width))).min
      assert(CountMin.estimateJvm(sk, k, Depth) == expect, s"key $k")
    }
  }

  test("sketch bytes are parallelism-invariant (elementwise-add merge law)") {
    val keys = (0L until 5000L).map(i => i % 97L)
    def bytes(parts: Int) = keysDf(keys, parts)
      .agg(CountMin.agg(col("t"), Depth, Width).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(bytes(2), bytes(16)))
  }

  test("malformed sketch (short or ragged length) estimates to NULL, never crashes") {
    val bad = Seq(
      (1L, Array[Byte](1, 2, 3)),                        // shorter than depth*8
      (2L, new Array[Byte](Depth * 8 + 4)),              // ragged
      (3L, new Array[Byte](Depth * Width * 8)))          // well-formed
      .toDF("id", "sk")
    val out = bad.select(col("id"),
        CountMin.estimate(col("sk"), col("id"), Depth).as("e"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L) && out(2L) && !out(3L))
  }

  test("column estimate expression agrees with the JVM helper") {
    val keys = (1L to 200L) ++ (1L to 50L)
    val skDf = keysDf(keys)
      .agg(CountMin.agg(col("t"), Depth, Width).as("sk"))
    val sk = skDf.head().getAs[Array[Byte]]("sk")
    val out = keysDf((1L to 200L).toSeq).crossJoin(broadcast(skDf))
      .select(col("t"), CountMin.estimate(col("sk"), col("t"), Depth).as("e"))
      .as[(Long, Long)].collect().toMap
    (1L to 200L).foreach { k =>
      assert(out(k) == CountMin.estimateJvm(sk, k, Depth))
    }
  }
}
