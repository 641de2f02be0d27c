package graft.tokens

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Gen, GenConfig}

class TokenOpsSpec extends SparkSpec {
  import spark.implicits._

  private val Budget = 4096
  private lazy val input = Gen.tokenseq(spark, GenConfig(rows = 5000, parts = 8))
    .toDF().select("doc_id", "n_tok", "source")

  test("packing: no bin exceeds the budget unless it holds one oversized seq") {
    val packed = TokenOps.packSequences(input, Budget).toDF()
    val bins = packed.groupBy("source", "bin")
      .agg(sum("n_tok").as("toks"), count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect()
    bins.foreach { case (s, b, toks, n) =>
      assert(toks <= Budget || n == 1, s"bin ($s,$b): $toks tokens in $n seqs")
    }
    assert(packed.count() == 5000) // every sequence assigned exactly once
  }

  test("packing: greedy means every closed bin could not take its successor") {
    // reconstruct per-source order and check bin boundaries are forced
    val rows = TokenOps.packSequences(input, Budget).collect()
      .groupBy(_.source).map { case (s, rs) => s -> rs.sortBy(_.doc_id) }
    rows.foreach { case (_, rs) =>
      var cum = 0L
      rs.sliding(2).foreach {
        case Array(a, b) if a.bin != b.bin =>
          assert(b.bin == a.bin + 1) // contiguous bins
          assert(cum + a.n_tok + b.n_tok > Budget) // the split was forced
          cum = 0L
        case Array(a, _) => cum += a.n_tok
        case _ => ()
      }
    }
  }

  test("packing is partitioning-invariant") {
    def digest(parts: Int) = TokenOps.packSequences(
      Gen.tokenseq(spark, GenConfig(rows = 3000, parts = parts)).toDF()
        .select("doc_id", "n_tok", "source"), Budget)
      .toDF().agg(expr("bit_xor(xxhash64(doc_id, n_tok, source, bin))")).as[Long].head()
    assert(digest(2) == digest(16))
  }

  test("packing stats: fill fraction is high on large bins") {
    val packed = TokenOps.packSequences(input, Budget).toDF()
    // greedy packing of ~2k-token seqs into 4096 budgets wastes < 50%
    TokenOps.packingStats(packed, Budget)
      .as[(String, Long, Long, Long, Double)].collect()
      .foreach { case (s, nBins, _, _, fill) =>
        assert(nBins > 0 && fill > 0.5, s"source $s: $nBins bins, fill $fill")
      }
  }

  test("sharded packing: per-source totals invariant across shard counts") {
    def stats(shards: Int) = TokenOps.packingStats(
      TokenOps.packSequences(input, Budget, shards).toDF(), Budget)
      .as[(String, Long, Long, Long, Double)].collect()
      .map { case (s, nBins, nSeqs, toks, fill) => s -> (nSeqs, toks, nBins, fill) }
      .toMap
    val s1 = stats(1); val s4 = stats(4); val s8 = stats(8)
    assert(s1.keySet == s4.keySet && s4.keySet == s8.keySet)
    s1.keySet.foreach { s =>
      // sequence and token totals per source don't depend on the shard count
      assert(s1(s)._1 == s4(s)._1 && s4(s)._1 == s8(s)._1)
      assert(s1(s)._2 == s4(s)._2 && s4(s)._2 == s8(s)._2)
      // sharding splits each source's doc order into S interleaved greedy
      // runs — bin count degrades only marginally (tail bins + a few
      // re-cut boundaries), never collapses
      assert(s4(s)._3 <= s1(s)._3 + 8 && s8(s)._3 <= s1(s)._3 + 16,
        s"source $s: bins ${s1(s)._3} -> ${s4(s)._3} (4sh) / ${s8(s)._3} (8sh)")
      // fill holds up under sharding for sources with real volume; tiny
      // sources (the generator's `ghost`) pay tail-bin waste — at scale
      // you shard only hot keys, which is exactly what the parameter allows
      if (s1(s)._1 >= 100)
        assert(s4(s)._4 > 0.5 && s8(s)._4 > 0.5,
          s"source $s: sharded fill ${s4(s)._4} / ${s8(s)._4}")
    }
  }

  test("sharded packing: budget respected per (source, shard) bin") {
    val packed = TokenOps.packSequences(input, Budget, shards = 4).toDF()
    val bins = packed.groupBy("source", "shard", "bin")
      .agg(sum("n_tok").as("toks"), count(lit(1)).as("n"))
      .select("toks", "n").as[(Long, Long)].collect()
    bins.foreach { case (toks, n) => assert(toks <= Budget || n == 1) }
    assert(packed.count() == 5000)
  }

  test("sharded packing is partitioning-invariant and shard-deterministic") {
    def digest(parts: Int) = TokenOps.packSequences(
      Gen.tokenseq(spark, GenConfig(rows = 3000, parts = parts)).toDF()
        .select("doc_id", "n_tok", "source"), Budget, shards = 4)
      .toDF().agg(expr("bit_xor(xxhash64(doc_id, n_tok, source, shard, bin))"))
      .as[Long].head()
    assert(digest(2) == digest(16))
  }

  test("sharded packing spreads the hot source across multiple tasks") {
    // the generator's `web` source is deliberately hot; with shards = 1 it
    // serializes through ONE task, with shards = 8 it must occupy several.
    // AQE's small-partition coalescing hides the fan-out at toy volume (it
    // would NOT coalesce 100 TB partitions), so pin it off for the probe.
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      def webPartitions(shards: Int): Long = TokenOps.packSequences(input, Budget, shards)
        .toDF().filter(col("source") === "web")
        .select(expr("spark_partition_id()").as("p"))
        .distinct().count()
      assert(webPartitions(1) == 1L)
      assert(webPartitions(8) >= 4L,
        "hot source must fan out over the shard key")
    } finally spark.conf.set(key, prev)
  }
}
