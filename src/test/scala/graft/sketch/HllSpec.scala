package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HllSpec extends SparkSpec {
  import spark.implicits._

  private val P = 8
  private val M = 1 << P

  private def sketchOf(ks: Seq[Long], parts: Int = 4): Array[Byte] =
    ks.toDF("k").repartition(parts)
      .agg(Hll.agg(col("k"), P).as("sk"))
      .head().getAs[Array[Byte]]("sk")

  test("estimate tracks true cardinality within the theoretical error band") {
    // standard error is 1.04/sqrt(m) ~= 6.5% at p=8; allow 3 sigma
    Seq(100, 2000, 50000).foreach { n =>
      val est = Hll.estimateJvm(sketchOf((1L to n.toLong)))
      val err = math.abs(est - n) / n
      assert(err <= 3 * 1.04 / math.sqrt(M), s"n=$n est=$est err=$err")
    }
  }

  test("sketch is a pure set summary: duplicates and partitioning change nothing") {
    val ks = (1L to 3000L)
    val once = sketchOf(ks, parts = 2)
    val duped = sketchOf(ks ++ ks ++ ks.take(500), parts = 4)
    val wide = sketchOf(ks, parts = 16)
    assert(java.util.Arrays.equals(once, duped))
    assert(java.util.Arrays.equals(once, wide))
  }

  test("merge law: union sketch == elementwise max of part sketches; idempotent") {
    val a = (1L to 2000L)
    val b = (1500L to 4000L)
    val sa = sketchOf(a)
    val sb = sketchOf(b)
    val su = sketchOf((a ++ b).distinct)
    assert(java.util.Arrays.equals(su, Hll.merge(sa, sb)))
    assert(java.util.Arrays.equals(sa, Hll.merge(sa, sa))) // re-merge is a no-op
  }

  test("malformed sketch (wrong register count) estimates to NULL, never crashes") {
    val bad = Seq(
      (1L, Array[Byte](1, 2, 3)),       // too short
      (2L, new Array[Byte](M + 1)),     // off by one
      (3L, new Array[Byte](M)))         // well-formed
      .toDF("id", "sk")
    val out = bad.select(col("id"), Hll.estimate(col("sk"), P).as("e"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L) && out(2L) && !out(3L))
  }

  test("column estimate expression agrees with the JVM helper") {
    val sk = sketchOf((1L to 1234L))
    val viaCol = Seq(Tuple1(sk)).toDF("sk")
      .select(Hll.estimate(col("sk"), P).as("e")).head().getDouble(0)
    assert(viaCol == Hll.estimateJvm(sk))
  }

  test("mergeAgg: union of partial sketches is bit-identical to one raw pass") {
    val keys = (1L to 5000L)
    val direct = sketchOf(keys)
    // three overlapping shards — idempotent max-merge must not double count
    val shards = Seq(keys.filter(_ % 2 == 0), keys.filter(_ % 3 == 0),
      keys.filter(k => k % 2 == 1 || k % 3 == 1))
    val merged = shards.map(ks => Tuple1(sketchOf(ks))).toDF("sk")
      .agg(Hll.mergeAgg(col("sk"), P).as("m"))
      .head().getAs[Array[Byte]]("m")
    assert(java.util.Arrays.equals(merged, direct))
    // merging the union with itself changes nothing (idempotence)
    val twice = Seq(Tuple1(merged), Tuple1(merged)).toDF("sk")
      .agg(Hll.mergeAgg(col("sk"), P).as("m")).head().getAs[Array[Byte]]("m")
    assert(java.util.Arrays.equals(twice, direct))
  }
}
