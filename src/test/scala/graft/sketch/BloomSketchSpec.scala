package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tokens.{TokenOps, Winnow}

/** The Bloom sketch aggregate must be BIT-IDENTICAL to the SQL-reproducible
  * bits-table form (same md5 position scheme), mergeable across partitions,
  * and its narrow probes must agree with the bits-table join flags.
  */
class BloomSketchSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1L << 12 // 4096 bits -> dense enough for FPs
  private val K = 3

  private lazy val corpus = Winnow.genWithDups(spark, corpusRows = 400,
    batchRows = 0, parts = 4).toDF()
  private lazy val batch = Winnow.genWithDups(spark, corpusRows = 400,
    batchRows = 200, parts = 4).toDF().filter(col("lane") === "batch")

  test("sketch set bits == the bits-table rows, at any parallelism") {
    val expected = TokenOps.bloomBits(corpus, M, K)
      .as[Long].collect().toSet
    for (parts <- Seq(1, 7)) {
      val sketch = TokenOps.bloomSketchValue(corpus.repartition(parts), M, K)
      val got = (0L until M).filter { b =>
        (sketch((b >>> 3).toInt) & (1 << (b & 7L).toInt)) != 0
      }.toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("packed sketch survives the serialize/deserialize round trip as OR-merge") {
    // two disjoint halves merged must equal the whole-corpus sketch
    val whole = TokenOps.bloomSketchValue(corpus, M, K)
    val h1 = TokenOps.bloomSketchValue(corpus.filter(pmod(xxhash64(col("doc_id")), lit(2)) === 0), M, K)
    val h2 = TokenOps.bloomSketchValue(corpus.filter(pmod(xxhash64(col("doc_id")), lit(2)) === 1), M, K)
    val merged = h1.zip(h2).map { case (a, b) => (a | b).toByte }
    assert(merged.toSeq == whole.toSeq)
  }

  test("broadcast probe, column probe, and bits-table join flags all agree") {
    val sketch = TokenOps.bloomSketchValue(corpus, M, K)
    val viaProbe = TokenOps.bloomPrefilterWithSketch(sketch, batch, K)
      .select("doc_id", "maybe_seen").as[(String, Boolean)].collect().toMap
    val viaBits = TokenOps.bloomPrefilterWithBits(
      TokenOps.bloomBits(corpus, M, K), batch, M, K)
      .select("doc_id", "maybe_seen").as[(String, Boolean)].collect().toMap
    assert(viaProbe == viaBits)
    assert(viaProbe.values.exists(identity), "dense filter must flag something")
  }

  test("scalar mightContain matches per-position arithmetic") {
    val words = new Array[Long]((M / 64).toInt)
    val hashes = Seq(42L, 0L, Long.MaxValue >>> 4, 987654321L)
    hashes.foreach(h => BloomSketch.setBits(words, h, M, K))
    val packed = BloomSketch.pack(words)
    hashes.foreach(h => assert(BloomSketch.mightContain(packed, h, K)))
    // an absent hash with at least one clear bit must read false
    val absent = (1L to 10000L).find { h =>
      (0 until K).exists { j =>
        val b = BloomSketch.bitPosition(j, h, M)
        (packed((b >>> 3).toInt) & (1 << (b & 7L).toInt)) == 0
      }
    }.get
    assert(!BloomSketch.mightContain(packed, absent, K))
  }
}
