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

class TokenChunkDedupSpec extends graft.SparkSpec {
  import spark.implicits._

  private def tokDf(rows: (String, Seq[Int], String)*) =
    rows.map { case (id, tk, src) => (id, tk, tk.size, src) }
      .toDF("doc_id", "tokens", "n_tok", "source")

  // ---- context-window chunking ----

  test("chunking reconstructs the original sequence (overlap removed)") {
    val docs = Winnow.genWithBoilerplate(spark, rows = 300, parts = 4).toDF()
    val maxLen = 128; val overlap = 32
    // reconstruction: chunk 0 whole, chunk c>0 minus its leading overlap
    val recon = TokenOps.chunkSequences(docs, maxLen, overlap)
      .withColumn("novel", when(col("chunk_idx") === 0, col("chunk_tokens"))
        .otherwise(slice(col("chunk_tokens"), overlap + 1, maxLen)))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("chunk_idx"), col("novel")))).as("cs"))
      .select(col("doc_id"), flatten(col("cs.novel")).as("cat"))
    val bad = recon.join(docs.select("doc_id", "tokens"), "doc_id")
      .filter(col("cat") =!= col("tokens")).count()
    assert(bad == 0, "concatenated de-overlapped chunks must equal the source tokens")
  }

  test("chunking edge shapes: single chunk, exact multiples, bounds") {
    val docs = tokDf(
      ("tiny", 1 to 5, "web"),          // n_tok < maxLen -> 1 chunk
      ("exact", 1 to 16, "web"),        // n_tok == maxLen -> 1 chunk
      ("plus1", 1 to 17, "web"),        // one token past -> 2 chunks
      ("multi", 1 to 100, "web"))
    val out = TokenOps.chunkSequences(docs, maxLen = 16, overlap = 4)
      .select("doc_id", "chunk_idx", "chunk_len").as[(String, Long, Long)].collect()
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byDoc("tiny").map(_._3).toSeq == Seq(5L))
    assert(byDoc("exact").map(_._3).toSeq == Seq(16L))
    assert(byDoc("plus1").length == 2 && byDoc("plus1").last._3 == 5L) // tokens 13..17
    assert(byDoc("multi").forall(c => c._3 > 0 && c._3 <= 16))
    // last chunk of multi must reach position 100: start 12*8... stride=12
    val last = byDoc("multi").last
    assert(last._2 * 12 + last._3 == 100L, "last chunk must end exactly at n_tok")
  }

  // ---- token-level decontamination ----

  test("token contamination flags exactly the docs sharing an n-gram with the bench") {
    val shared = (1 to 20).map(_ + 900)
    val corpus = tokDf(
      ("hit", (1 to 30).map(_ + 100) ++ shared, "web"),
      ("clean", (1 to 60).map(_ + 5000), "web"),
      ("short", 1 to 5, "web")) // below n, never flagged
    val bench = tokDf(("b1", (1 to 7).map(_ + 300) ++ shared ++ Seq(7777), "eval"))
    val out = TokenOps.tokenContamination(corpus, bench, n = 13)
      .as[(String, String, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(out.keySet == Set("hit"))
    assert(out("hit") == 20 - 13 + 1, "every 13-gram inside the shared 20-run must hit")
  }

  test("token contamination: hit_grams never exceeds the doc's distinct gram count") {
    val corpus = Winnow.genWithBoilerplate(spark, rows = 500, parts = 4).toDF()
    val bench = Winnow.genWithBoilerplate(spark, rows = 100, parts = 2, startId = 5000000L).toDF()
    val bad = TokenOps.tokenContamination(corpus, bench, n = 13)
      .filter(col("hit_grams") > col("n_grams") || col("hit_grams") < 1).count()
    assert(bad == 0)
  }

  // ---- bloom prefilter + incremental dedup ----

  private lazy val genAll = Winnow.genWithDups(spark, corpusRows = 1500,
    batchRows = 600, parts = 8).toDF().cache()
  private lazy val corpusLane = genAll.filter(col("lane") === "corpus")
  private lazy val batchLane = genAll.filter(col("lane") === "batch")

  test("bloom prefilter has NO false negatives: every true dup is flagged maybe_seen") {
    val flagged = TokenOps.bloomPrefilter(corpusLane, batchLane, mBits = 1L << 13, k = 3)
    val trueDups = batchLane.join(
      corpusLane.select(TokenOps.contentHash(col("tokens")).as("ch")).distinct(),
      TokenOps.contentHash(col("tokens")) === col("ch"), "left_semi")
      .select("doc_id")
    val missed = trueDups.join(
      flagged.filter(!col("maybe_seen")).select("doc_id"), "doc_id").count()
    assert(missed == 0, "a bloom filter must never clear a row that IS in the corpus")
    // and at this deliberately tiny m the maybe-lane must include some FPs,
    // otherwise the resolver path is untested
    assert(flagged.filter(col("maybe_seen")).count() > trueDups.count())
  }

  test("incremental dedup equals the exact content-hash anti join at any bloom width") {
    val exact = batchLane.join(
      corpusLane.select(TokenOps.contentHash(col("tokens")).as("ch")).distinct(),
      TokenOps.contentHash(col("tokens")) === col("ch"), "left_anti")
      .select("doc_id").as[String].collect().sorted.toSeq
    for (m <- Seq(1L << 10, 1L << 20)) {
      val got = TokenOps.incrementalDedupe(corpusLane, batchLane, mBits = m, k = 3)
        .select("doc_id").as[String].collect().sorted.toSeq
      assert(got == exact, s"mBits=$m must not change exact semantics")
    }
  }

  test("split assignment: exhaustive, rate-accurate, append-stable, mix-independent") {
    val docs = Gen.tokenseq(spark, GenConfig(rows = 20000, parts = 8)).toDF()
      .select("doc_id", "n_tok", "source")
    val s = TokenOps.assignSplit(docs, valPpm = 20000, testPpm = 10000)
    val byTier = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byTier.values.sum == 20000L, "every row gets exactly one split")
    assert(math.abs(byTier("test") - 200L) < 100, s"test rate off: $byTier")
    assert(math.abs(byTier("val") - 400L) < 150, s"val rate off: $byTier")
    // append stability: the first 5000 docs keep their assignment when the
    // corpus grows (split depends only on doc_id, never position/count)
    val small = TokenOps.assignSplit(
      Gen.tokenseq(spark, GenConfig(rows = 5000, parts = 4)).toDF()
        .select("doc_id", "n_tok", "source"), valPpm = 20000, testPpm = 10000)
      .select("doc_id", "split").as[(String, String)].collect().toMap
    val bigSubset = s.select("doc_id", "split").as[(String, String)].collect()
      .toMap.view.filterKeys(small.keySet).toMap
    assert(bigSubset == small)
    // salt isolation: the holdout rate among mix-kept rows matches the
    // global rate (a shared hash would correlate selection and split)
    val kept = TokenOps.mixSample(s)
    val keptTest = kept.filter(col("split") === "test").count().toDouble /
      kept.count().toDouble
    assert(math.abs(keptTest - 0.01) < 0.006, s"mix-kept test rate $keptTest")
  }

  test("planted-dup generator: batch dups carry a corpus payload verbatim") {
    val dupBatch = batchLane.join(
      corpusLane.select(TokenOps.contentHash(col("tokens")).as("ch")).distinct(),
      TokenOps.contentHash(col("tokens")) === col("ch"), "left_semi").count()
    assert(dupBatch > 100, "the 30% dup rate must materialize")
    // generator parallelism invariance
    val d2 = Winnow.genWithDups(spark, 1500, 600, parts = 2).toDF()
      .agg(expr("bit_xor(xxhash64(doc_id, tokens, n_tok, source, lane))")).as[Long].head()
    val d16 = Winnow.genWithDups(spark, 1500, 600, parts = 16).toDF()
      .agg(expr("bit_xor(xxhash64(doc_id, tokens, n_tok, source, lane))")).as[Long].head()
    assert(d2 == d16)
  }

  test("stratified sample: exact n per group, deterministic, partitioning-invariant") {
    val base = graft.core.Gen.tokenseq(spark, graft.core.GenConfig(rows = 5000, parts = 8))
      .toDF().select("doc_id", "source")
    val n = 25
    val out = TokenOps.stratifiedSample(base, col("source"), col("doc_id"), n)
      .select("doc_id", "source", "sample_rank")
    val perGroup = out.groupBy("source").count().as[(String, Long)].collect().toMap
    val popGroup = base.groupBy("source").count().as[(String, Long)].collect().toMap
    popGroup.foreach { case (src, pop) =>
      assert(perGroup(src) == math.min(n.toLong, pop), s"group $src size")
    }
    // ranks are 1..size within each group
    val ranks = out.groupBy("source")
      .agg(min("sample_rank").as("lo"), max("sample_rank").as("hi"), count(lit(1)).as("c"))
      .as[(String, Long, Long, Long)].collect()
    ranks.foreach { case (src, lo, hi, c) => assert(lo == 1L && hi == c, s"ranks $src") }
    // same selection at different partitioning (hash order, not row order)
    val ids = out.select("doc_id").as[String].collect().sorted.toSeq
    val ids2 = TokenOps.stratifiedSample(base.repartition(17), col("source"), col("doc_id"), n)
      .select("doc_id").as[String].collect().sorted.toSeq
    assert(ids == ids2)
    // smaller n selects a prefix of larger n's selection (hash-order nesting)
    val ids10 = TokenOps.stratifiedSample(base, col("source"), col("doc_id"), 10)
      .select("doc_id").as[String].collect().toSet
    assert(ids10.subsetOf(ids.toSet) && ids10.size < ids.size)
  }

  test("tfidf top-k: scores match an independent recompute; common words lose") {
    val d = Seq(
      (1L, "alpha beta gamma alpha common"),
      (2L, "beta delta common common"),
      (3L, "epsilon common zeta")
    ).toDF("doc_id", "text")
    val out = graft.text.TextOps.tfidfTopK(d, col("text"), col("doc_id"), k = 2)
      .select("doc_id", "w", "tf", "score", "rank")
      .as[(Long, String, Long, Long, Long)].collect()
    val toks = Map(1L -> "alpha beta gamma alpha common", 2L -> "beta delta common common",
      3L -> "epsilon common zeta").map { case (k2, v) => k2 -> v.split(" ").toSeq }
    val dfreq = toks.values.flatMap(_.distinct).groupBy(identity).map { case (w, g) => w -> g.size }
    def idf(w: String): Long =
      math.round((math.log(3 + 1.0) - math.log(dfreq(w) + 1.0)) * 1e6 + 1e-9)
    // expected top-2 per doc: score desc then word asc over tf*idf
    val expected = toks.map { case (id, ws) =>
      id -> ws.groupBy(identity).map { case (w, g) => (w, g.size.toLong, g.size * idf(w)) }
        .toSeq.sortBy { case (w, _, s) => (-s, w) }.take(2)
    }
    expected.foreach { case (id, exp) =>
      val got = out.filter(_._1 == id).sortBy(_._5).map(r => (r._2, r._3, r._4))
      assert(got.toSeq == exp, s"doc $id: $got vs $exp")
    }
    // 'common' appears in every doc -> lowest idf; never a doc-1 keyword
    assert(!out.exists(r => r._1 == 1L && r._2 == "common"))
  }

  test("bpe pair counts: match an independent recompute; ranks fully ordered") {
    val rows = Seq(
      Array(1, 2, 3, 1, 2),     // pairs (1,2)x2 via positions 0 and 3
      Array(2, 3),              // (2,3)
      Array(7),                 // no pairs
      Array(1, 2, 1, 2, 1))     // (1,2)x2, (2,1)x2
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "tokens")
    val got = TokenOps.bpePairCounts(df, k = 10)
      .select("a", "b", "n", "rank").as[(Int, Int, Long, Long)]
      .collect().sortBy(_._4)
    val expected = rows.flatMap(t => t.dropRight(1).zip(t.drop(1)))
      .groupBy(identity).map { case (p, g) => (p._1, p._2, g.size.toLong) }
      .toSeq.sortBy { case (a, b, n) => (-n, a, b) }
      .zipWithIndex.map { case ((a, b, n), i) => (a, b, n, i + 1L) }
    assert(got.toSeq == expected, s"${got.toSeq} vs $expected")
    // ties ((2,3) and (3,1) both count 1...) break on (a, b) ascending
    assert(got.map(_._4).toSeq == (1L to expected.size))
  }

  test("bpe merge: greedy left-to-right, non-overlapping; reference aaa case") {
    val rows = Seq(
      (1L, Array(1, 2, 3, 1, 2)),    // both (1,2) merge
      (2L, Array(7, 7, 7)),          // aaa with (7,7): ZA7, not 7Z
      (3L, Array(7, 7, 7, 7)),       // ZZ
      (4L, Array(2, 1)),             // no match (order matters)
      (5L, Array[Int]()))            // empty stays empty
    val df = rows.toDF("doc_id", "tokens")
    val got12 = df.select(col("doc_id"),
        TokenOps.bpeMerge(col("tokens"), 1, 2, 99).as("m"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got12(1L) == Seq(99, 3, 99) && got12(4L) == Seq(2, 1) &&
      got12(5L) == Seq())
    val got77 = df.select(col("doc_id"),
        TokenOps.bpeMerge(col("tokens"), 7, 7, 99).as("m"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got77(2L) == Seq(99, 7), got77(2L))
    assert(got77(3L) == Seq(99, 99), got77(3L))
  }

  test("bpe iteration: applying the argmax merge removes the pair from the count table") {
    val big = graft.tokens.Winnow.genWithBoilerplate(spark, rows = 800, parts = 8).toDF()
    val top = TokenOps.bpePairCounts(big, k = 1)
      .select("a", "b", "n").as[(Int, Int, Long)].head()
    val out = TokenOps.applyTopBpeMerge(big, newId = 50257)
    // each merge shortens its row by exactly one token, so the corpus-wide
    // length drop equals the number of GREEDY occurrences (<= pair count,
    // < only when occurrences overlap)
    val drop = out.agg(sum(col("n_before") - col("n_after"))).head().getLong(0)
    assert(drop > 0 && drop <= top._3, s"drop=$drop top_n=${top._3}")
    // after the merge the picked pair no longer exists anywhere
    val merged = big.select(col("doc_id"),
      TokenOps.bpeMerge(col("tokens"), top._1, top._2, 50257).as("tokens"))
    val left = TokenOps.bpePairCounts(merged, k = 10000)
      .filter(col("a") === top._1 && col("b") === top._2).count()
    assert(left == 0L)
  }

  test("bpe training loop: merges compose (round 2 merges round 1's id), " +
    "totals fall, first round == single-iteration op") {
    // [7,7,7,7] x N: round 1 argmax = (7,7) -> Z giving [Z,Z]; round 2's
    // only pair is (Z,Z) — a pair of LEARNED ids
    val docs = (1L to 50L).map(i => (i, Array(7, 7, 7, 7)))
      .toDF("doc_id", "tokens")
    val m = TokenOps.trainBpe(docs, iters = 2, baseId = 100)
      .select("it", "merge_a", "merge_b", "new_id", "n_pair", "total_after")
      .as[(Long, Int, Int, Int, Long, Long)].collect().sortBy(_._1)
    // 3 (7,7) pairs/row pre-merge; greedy non-overlap merges 2/row
    assert(m(0) == ((0L, 7, 7, 100, 150L, 100L)))
    assert(m(1) == ((1L, 100, 100, 101, 50L, 50L))) // (Z,Z) -> 101
    assert(m.map(_._6).toSeq == m.map(_._6).toSeq.sorted.reverse) // monotone compression
    // pair-exhausted corpus: the loop stops early with the rounds learned
    // (here round 1 leaves [Z] rows with no pairs; round 2 finds none)
    val tiny = Seq((1L, Array(3, 3)), (2L, Array(3, 3))).toDF("doc_id", "tokens")
    val ex = TokenOps.trainBpe(tiny, iters = 5, baseId = 200)
      .select("it", "merge_a", "merge_b").as[(Long, Int, Int)].collect()
    assert(ex.toSeq == Seq((0L, 3, 3)))
    // round 1 of the loop agrees with the standalone single-iteration op
    val gen = graft.tokens.Winnow.genWithBoilerplate(spark, rows = 400, parts = 4).toDF()
    val one = TokenOps.applyTopBpeMerge(gen, newId = 900)
      .select("merge_a", "merge_b").as[(Int, Int)].head()
    val loop = TokenOps.trainBpe(gen, iters = 1, baseId = 900)
      .select("merge_a", "merge_b").as[(Int, Int)].head()
    assert(one == loop)
  }

  test("bpe encode: applying the trained merge table reproduces the training-loop corpus") {
    val gen = graft.tokens.Winnow.genWithBoilerplate(spark, rows = 400, parts = 4).toDF()
    val mt = TokenOps.trainBpe(gen, iters = 3, baseId = 700)
      .select("it", "merge_a", "merge_b", "new_id")
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1)
      .map(t => (t._2, t._3, t._4)).toSeq
    assert(mt.size == 3)
    val enc = TokenOps.applyMergeTable(gen, mt)
      .select("doc_id", "n_after", "encoded_hash")
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // independently re-apply the merges as a manual chain
    val manual = mt.foldLeft(gen.select(col("doc_id"), col("tokens"))) {
      case (d, (a, b, nid)) =>
        d.select(col("doc_id"), TokenOps.bpeMerge(col("tokens"), a, b, nid).as("tokens"))
    }.select(col("doc_id"), size(col("tokens")).cast("long").as("n"),
        TokenOps.contentHash(col("tokens")).as("h"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(enc == manual)
    // the chain actually compressed something
    assert(enc.values.map(_._1).sum <
      gen.agg(sum(col("n_tok"))).head().getLong(0))
  }

  test("bpe pair counts: k truncation is a prefix; partitioning-invariant") {
    val big = graft.tokens.Winnow.genWithBoilerplate(spark, rows = 500, parts = 8).toDF()
    val k10 = TokenOps.bpePairCounts(big, k = 10)
      .select("a", "b", "n", "rank").as[(Int, Int, Long, Long)].collect().sortBy(_._4)
    val k30 = TokenOps.bpePairCounts(big, k = 30)
      .select("a", "b", "n", "rank").as[(Int, Int, Long, Long)].collect().sortBy(_._4)
    assert(k30.take(10).toSeq == k10.toSeq)
    val repart = TokenOps.bpePairCounts(big.repartition(13), k = 10)
      .select("a", "b", "n", "rank").as[(Int, Int, Long, Long)].collect().sortBy(_._4)
    assert(repart.toSeq == k10.toSeq)
  }

  test("pmi: an always-co-occurring pair survives minCount and tops the rank") {
    // 9001 is always followed by 9002; surrounding tokens are unique per
    // doc, so every other adjacent pair falls under minCount
    val docs = (1 to 8).map(i => (s"d$i", Seq(100 + i, 9001, 9002, 200 + i), "web"))
    val out = TokenOps.pmiTopPairs(tokDf(docs: _*), k = 5, minCount = 5)
      .select("a", "b", "n_ab", "rank").as[(Int, Int, Long, Long)].collect()
    assert(out.toSeq == Seq((9001, 9002, 8L, 1L)))
  }

  test("snapshot diff: exact added/removed/changed lanes on the slid window") {
    val oldDf = Winnow.genWithBoilerplate(spark, rows = 3000, parts = 8).toDF()
    val newDf = Winnow.genSnapshotNew(spark, rows = 3000, parts = 8)
    val out = TokenOps.snapshotDiff(oldDf, newDf)
      .select("doc_id", "lane").as[(String, String)].collect()
    val lanes = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val oldIds = oldDf.select("doc_id").as[String].collect().toSet
    val newIds = newDf.select("doc_id").as[String].collect().toSet
    assert(lanes("removed") == (oldIds -- newIds)) // the slid-out head
    assert(lanes("added") == (newIds -- oldIds))   // the slid-in tail
    assert(lanes("removed").size == 500 && lanes("added").size == 500)
    // changed = surviving ids whose h15 mod 11 == 0 (the planted mutation)
    def h(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
          .map("%02x".format(_)).mkString.take(15), 16)
    val expectChanged = (oldIds & newIds).filter(id => h(id) % 11 == 0)
    assert(lanes("changed") == expectChanged)
    assert(out.length == lanes.values.map(_.size).sum) // no unchanged leaks
  }

  test("vocab prune: fully-ordered cut, UNK counts and hashes exact") {
    val df = tokDf(
      ("d1", Seq(1, 1, 2, 3), "web"),
      ("d2", Seq(2, 2, 3, 9), "web"))
    // counts: 2→3, 1→2, 3→2, 9→1; V=2 cut by (n DESC, t ASC) = {2, 1}
    val out = TokenOps.pruneVocab(df, vocabSize = 2, unkId = 777)
      .select("doc_id", "n_unk", "pruned_hash")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    def h(tk: Seq[Int]): Long = {
      val s = tk.mkString(",")
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
          .map("%02x".format(_)).mkString.take(15), 16)
    }
    assert(out("d1")._2 == 1L) // token 3
    assert(out("d2")._2 == 2L) // tokens 3, 9
    assert(out("d1")._3 == h(Seq(1, 1, 2, 777)))
    assert(out("d2")._3 == h(Seq(2, 2, 777, 777)))
  }

  test("shuffle order: exact permutation equal to the global (hash, id) rank") {
    val shufIn = Gen.tokenseq(spark, GenConfig(rows = 5000, parts = 8))
      .toDF().select("doc_id", "n_tok", "source")
    val out = TokenOps.shuffleOrder(shufIn, buckets = 8)
      .select("doc_id", "order_idx").as[(String, Long)].collect()
    assert(out.length == 5000)
    // a permutation of [0, N)
    assert(out.map(_._2).sorted.toSeq == (0L until 5000L).toSeq)
    // equals the single-partition global rank over the same order key
    val ref: Map[String, Long] = shufIn
      .withColumn("h", graft.text.Hashing.h15(concat(lit("shuf|"), col("doc_id"))))
      .select("doc_id", "h").as[(String, Long)].collect()
      .sortBy { case (d, h) => (h, d) }.map(_._1).zipWithIndex
      .map { case (d, i) => d -> i.toLong }.toMap
    out.foreach { case (d, i) => assert(ref(d) == i, s"doc $d") }
  }

  test("shuffle order: bucket count and input partitioning are invisible") {
    val shufIn = Gen.tokenseq(spark, GenConfig(rows = 3000, parts = 8))
      .toDF().select("doc_id", "n_tok", "source")
    def digest(df: org.apache.spark.sql.DataFrame, b: Int) =
      TokenOps.shuffleOrder(df, buckets = b)
        .agg(expr("bit_xor(xxhash64(doc_id, order_idx))")).as[Long].head()
    val base = digest(shufIn, 8)
    assert(digest(shufIn, 1) == base)      // one bucket = plain global sort
    assert(digest(shufIn, 64) == base)     // more buckets than needed
    assert(digest(shufIn.repartition(3), 8) == base) // partitioning-invariant
    // self-sized form picks some B > 0 and must agree too
    assert(digest(shufIn, 0) == base)
  }
}
