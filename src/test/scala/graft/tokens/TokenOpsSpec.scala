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
    TokenOps.packingStats(packed, Budget).as[(String, Long, Double)].collect()
      .foreach { case (s, nBins, fill) =>
        assert(nBins > 0 && fill > 0.5, s"source $s: $nBins bins, fill $fill")
      }
  }
}
