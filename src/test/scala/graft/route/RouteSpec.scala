package graft.route

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RouteSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int) = (0 until n).map(i => i.toLong * 37L + 11L).toDF("k")

  test("rendezvous: deterministic and total — every key gets exactly one shard") {
    val shards = Seq("a", "b", "c")
    val out = Route.rendezvous(keys(2000), col("k"), shards)
      .groupBy("shard").count().as[(String, Long)].collect().toMap
    assert(out.keySet.subsetOf(shards.toSet))
    assert(out.values.sum == 2000L)
    // roughly balanced: each shard within 3x of fair share
    out.values.foreach(c => assert(c > 2000 / 9 && c < 2000, s"skewed: $out"))
  }

  test("rendezvous: adding one shard moves ~1/(n+1) of keys (minimal movement)") {
    val s4 = Seq("s0", "s1", "s2", "s3")
    val df = Route.rendezvous(
      Route.rendezvous(keys(4000), col("k"), s4, "old"),
      col("k"), s4 :+ "s4", "new")
    val moved = df.filter(col("old") =!= col("new")).count()
    // HRW law: a key moves iff the new shard wins it — expect ~1/5 = 800.
    // pmod routing would move ~4/5 = 3200. Bound generously.
    assert(moved > 4000 / 10 && moved < 4000 * 35 / 100, s"moved=$moved")
    // and every moved key moved TO the new shard, never between old shards
    val crossMoves = df.filter(col("old") =!= col("new") && col("new") =!= "s4").count()
    assert(crossMoves == 0, s"keys moved between surviving shards: $crossMoves")
  }

  test("rendezvous: identical assignment at different parallelism") {
    val shards = Seq("x", "y", "z")
    val a = Route.rendezvous(keys(500).repartition(1), col("k"), shards)
      .select("k", "shard").as[(Long, String)].collect().toMap
    val b = Route.rendezvous(keys(500).repartition(13), col("k"), shards)
      .select("k", "shard").as[(Long, String)].collect().toMap
    assert(a == b)
  }
}
