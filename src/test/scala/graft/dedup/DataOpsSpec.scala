package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sim.Similarity
import graft.text.TextOps

/** Mechanism tests for the training-data curation operators with synthetic
  * near-duplicates (the sf* corpus is all-distinct, so these suites build
  * their own dup clusters to prove the detectors actually detect).
  */
class DataOpsSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away into the green hills tonight"
  private val nearDup = // one word changed → high 3-gram Jaccard
    "the quick brown fox jumps over the lazy cat and runs far away into the green hills tonight"
  private val unrelated =
    "completely different content about spark catalyst optimizer rules and columnar execution engines"

  private def docs = Seq(
    (1L, base), (2L, nearDup), (3L, unrelated), (4L, base) // 4 = exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup: duplicate text collapses to the smallest id") {
    val out = Dedupe.exact(docs, col("text"), col("doc_id"))
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 3L)) // 4 deduped against 1
  }

  test("minhash LSH finds the near-dup pair and skips unrelated docs") {
    // r=2 rows/band (8 bands over k=16): band-collision prob at jaccard 0.68
    // is 1-(1-0.68^2)^8 ≈ 0.99 — the sensitivity config for ~0.5+ dup hunting
    val pairs = Dedupe.minhashNearDups(docs, col("text"), col("doc_id"),
      n = 3, k = 16, bands = 8, threshold = 0.5)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))   // near-dup found
    assert(pairs.contains((1L, 4L)))   // exact dup found (jaccard 1.0)
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated never pairs
  }

  test("jaccard verification value is the true n-gram jaccard") {
    val j = Dedupe.minhashNearDups(docs, col("text"), col("doc_id"), threshold = 0.0)
      .filter(col("id_l") === 1 && col("id_r") === 4)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("simhash: near-dup within hamming 3, unrelated far away") {
    val sims = docs.select(col("doc_id"), Dedupe.simhash32(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(1L), sims(4L)) == 0)  // identical text → identical simhash
    assert(ham(sims(1L), sims(2L)) <= 3)  // one word changed → tiny distance
    assert(ham(sims(1L), sims(3L)) > 3)   // unrelated → far
    val pairs = Dedupe.simhashNearDups(docs, col("text"), col("doc_id"), maxDist = 3)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("simhash band join is exhaustive for dist<=3 (pigeonhole, property)") {
    // 40 docs derived from base by replacing word i — many small distances;
    // band-join result must equal the brute-force result exactly.
    val words = base.split(" ")
    val mutated = (0 until 40).map { i =>
      val w = words.clone(); w(i % w.length) = s"mut$i"
      (i.toLong, w.mkString(" "))
    }.toDF("doc_id", "text")
    val viaBands = Dedupe.simhashNearDups(mutated, col("text"), col("doc_id"), maxDist = 3)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    val sims = mutated.select(col("doc_id"), Dedupe.simhash32(col("text")))
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, sa) <- sims; (b, sb) <- sims
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    assert(viaBands == brute)
  }

  test("simhash wide bands (scale lever): pigeonhole still exact at bandBits=15") {
    // same exhaustiveness property at the 60-bit signature width used when
    // the corpus outgrows 8-bit band buckets (BENCH.md round-4 measurement)
    val words = base.split(" ")
    val mutated = (0 until 40).map { i =>
      val w = words.clone(); w(i % w.length) = s"mut$i"
      (i.toLong, w.mkString(" "))
    }.toDF("doc_id", "text")
    val viaBands = Dedupe.simhashNearDups(mutated, col("text"), col("doc_id"),
      maxDist = 3, bandBits = 15)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    val sims = Dedupe.simhashTable(mutated, col("text"), col("doc_id"), bits = 60)
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, sa) <- sims; (b, sb) <- sims
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    assert(viaBands == brute)
    // identical docs still collide at every width; the wider signature is a
    // strictly finer criterion (fewer-or-equal pairs than 32-bit)
    val narrow = Dedupe.simhashNearDups(mutated, col("text"), col("doc_id"),
      maxDist = 3).select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(viaBands.size <= narrow.size)
  }

  // ---------- embeddings ----------

  /** Deterministic pseudo-random unit-ish vectors (hash-based, no Random). */
  private def vecs(n: Int, dim: Int = 16) = (0 until n).map { id =>
    (id.toLong, Array.tabulate(dim)(d =>
      ((graft.core.Mix.mix64(id * 131L + d) % 1000L) / 1000.0f)))
  }.toDF("vec_id", "embedding")

  test("autoBandBits: clamp(ceil(log2(corpus)) - 5, 8, 15) — the self-sizing " +
    "LSH width formula (sandbox-measured: fixed 8-bit bands blow up at 50k docs)") {
    assert(Dedupe.autoBandBits(0L) == 8)
    assert(Dedupe.autoBandBits(1L) == 8)
    assert(Dedupe.autoBandBits(500L) == 8) // sf0.1 documents corpus → old default
    assert(Dedupe.autoBandBits(8192L) == 8) // 2^13: 13-5 = 8
    assert(Dedupe.autoBandBits(8193L) == 9) // ceil(log2) = 14
    assert(Dedupe.autoBandBits(50000L) == 11) // the measured blowup point → 11
    assert(Dedupe.autoBandBits(1L << 20) == 15) // 2^20: 20-5 = 15 (cap)
    assert(Dedupe.autoBandBits(Long.MaxValue) == 15) // hard cap: 4 bands * 15 <= 60
    // auto width (bandBits omitted) equals the pinned old default at
    // sandbox corpus sizes — the oracled queries stay bit-identical
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val auto = Dedupe.simhashNearDups(docs, col("text"), col("doc_id"), maxDist = 3)
    val pinned = Dedupe.simhashNearDups(docs, col("text"), col("doc_id"),
      maxDist = 3, bandBits = 8)
    assert(auto.collect().toSet == pinned.collect().toSet)
  }

  test("connected components: chains, stars, disjoint clusters, determinism") {
    // chain 0..19 (diameter 19 — pointer jumping must converge inside
    // maxIter), star at 100, pair at 200
    val pairs = ((0L until 19L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (100L, 102L), (100L, 103L), (200L, 201L)))
      .toDF("id_l", "id_r")
    val got = Dedupe.components(pairs).as[(Long, Long)].collect().toMap
    (0L to 19L).foreach(i => assert(got(i) == 0L, s"chain node $i"))
    Seq(100L, 101L, 102L, 103L).foreach(i => assert(got(i) == 100L))
    assert(got(200L) == 200L && got(201L) == 200L)
    assert(got.size == 26)
    // partitioning invariance
    val got2 = Dedupe.components(pairs.repartition(7)).as[(Long, Long)].collect().toMap
    assert(got2 == got)
  }

  test("connected components: reliable checkpoint mode yields same labels") {
    val pairs = ((0L until 19L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (100L, 102L), (100L, 103L), (200L, 201L)))
      .toDF("id_l", "id_r")
    val local = Dedupe.components(pairs).as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    val reliable = Dedupe.components(pairs, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(reliable == local)
    // reliable mode actually wrote checkpoint data to the chosen dir
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, "reliable checkpoint must materialize to the dir")
  }

  test("connected components: non-convergence raises instead of silent wrong labels") {
    val pairs = (0L until 40L).map(i => (i, i + 1)).toDF("id_l", "id_r")
    intercept[IllegalStateException] {
      Dedupe.components(pairs, maxIter = 2).collect()
    }
  }

  test("fused curation gates equal the separate repetition + contamination ops") {
    val d = Seq(
      (1L, base), (2L, nearDup), (3L, unrelated), (4L, base),
      (5L, "spam spam spam spam spam spam spam spam"),
      (6L, "tiny"), (7L, "")
    ).toDF("doc_id", "text")
    val bench = d.filter(col("doc_id") === 3)
    val fused = graft.text.Curation.gateSignals(d, col("text"), col("doc_id"),
      bench, col("text"), n = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val rep = TextOps.repetitionStats(d, col("text"), col("doc_id"))
      .select("doc_id", "top_bigram_n").as[(Long, Long)].collect().toMap
    val cont = Dedupe.contamination(d, col("text"), col("doc_id"),
      bench, col("text"), n = 3)
      .select("doc_id", "n_overlap").as[(Long, Long)].collect().toMap
    d.select("doc_id").as[Long].collect().foreach { id =>
      val (top, ov) = fused.getOrElse(id, (0L, 0L))
      assert(top == rep(id), s"doc $id top_bigram_n: fused $top vs ${rep(id)}")
      assert(ov == cont(id), s"doc $id n_overlap: fused $ov vs ${cont(id)}")
    }
    // the benchmark doc is fully self-contaminated; unrelated docs are clean
    assert(fused(3L)._2 > 0 && fused(1L)._2 == 0)
  }

  test("lm perplexity: integer micro-nat costs match an independent recompute") {
    val d = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the the the the"),                      // all common words → low CE
      (3L, "zyxwv qqqqq unique rareword singleton"), // all hapaxes → high CE
      (4L, "the cat sat")
    ).toDF("doc_id", "text")
    val out = TextOps.lmPerplexity(d, col("text"), col("doc_id"))
      .select("doc_id", "n_words", "sum_cost", "ce_micronats")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

    // independent recompute of the same quantization, straight Scala
    val toks = Map(
      1L -> "the cat sat on the mat".split(" ").toSeq,
      2L -> "the the the the".split(" ").toSeq,
      3L -> "zyxwv qqqqq unique rareword singleton".split(" ").toSeq,
      4L -> "the cat sat".split(" ").toSeq)
    val counts = toks.values.flatten.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val n = counts.values.sum.toDouble
    def cost(w: String): Long =
      math.round((math.log(n) - math.log(counts(w).toDouble)) * 1e6 + 1e-9)
    toks.foreach { case (id, ws) =>
      val (nw, sc, ce) = out(id)
      assert(nw == ws.size, s"doc $id n_words")
      assert(sc == ws.map(cost).sum, s"doc $id sum_cost")
      assert(ce == sc / nw, s"doc $id ce integer division")
    }
    // fluent repetition scores lower cross-entropy than hapax soup
    assert(out(2L)._3 < out(3L)._3)
    // keep flag honors the threshold parameter
    val kept = TextOps.lmPerplexity(d, col("text"), col("doc_id"),
        keepUnderMicroNats = out(2L)._3 + 1)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(2L))
  }

  test("nb quality classifier: log-odds match an independent recompute; fluent docs score higher") {
    // base/nearDup pass the Gopher gates (>=10 words); the short/symbol docs fail
    val d = Seq(
      (1L, base), (2L, nearDup),
      (3L, "@@ ## $$ %% ^^ && ** (( )) !! ~~ ``"), // 12 words, all symbols → fails symbol gate
      (4L, "tiny doc"),                            // fails length gate
      (5L, base + " and the story continues onward")
    ).toDF("doc_id", "text")
    val out = TextOps.nbQualityClassifier(d, col("text"), col("doc_id"))
      .select("doc_id", "n_words", "logodds_micronats", "pred_quality", "seed_label")
      .as[(Long, Long, Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

    // independent recompute (same quantization, straight Scala)
    val txt = Map(1L -> base, 2L -> nearDup,
      3L -> "@@ ## $$ %% ^^ && ** (( )) !! ~~ ``", 4L -> "tiny doc",
      5L -> (base + " and the story continues onward"))
    val toks = txt.map { case (k, v) => k -> v.split(" ", -1).toSeq }
    def gates(ws: Seq[String], t: String): Boolean = {
      val nW = ws.size.toDouble
      val mwl = BigDecimal(ws.map(_.length).sum / nW)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val sym = BigDecimal("[^a-z0-9 ]".r.findAllIn(t).size / math.max(t.length, 1).toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      ws.size >= 10 && ws.size <= 100000 && mwl >= 2 && mwl <= 12 && sym <= 0.2
    }
    val pos = txt.map { case (k, t) => k -> gates(toks(k), t) }
    val cPos = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val cNeg = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    toks.foreach { case (k, ws) => ws.foreach(w => if (pos(k)) cPos(w) += 1 else cNeg(w) += 1) }
    val vocabSet = (cPos.keySet ++ cNeg.keySet).toSet
    val (nPos, nNeg, v) = (cPos.values.sum.toDouble, cNeg.values.sum.toDouble, vocabSet.size.toDouble)
    val prior = math.round((math.log(pos.values.count(identity) + 1.0) -
      math.log(pos.values.count(!_) + 1.0)) * 1e6 + 1e-9)
    def lo(w: String): Long = math.round(
      ((math.log(cPos(w) + 1.0) - math.log(nPos + v)) -
       (math.log(cNeg(w) + 1.0) - math.log(nNeg + v))) * 1e6 + 1e-9)
    toks.foreach { case (id, ws) =>
      val (nw, score, pred, seed) = out(id)
      assert(nw == ws.size, s"doc $id n_words")
      assert(score == prior + ws.map(lo).sum, s"doc $id logodds")
      assert(pred == (score > 0), s"doc $id pred")
      assert(seed == pos(id), s"doc $id seed label")
    }
    // the classifier generalizes the gates: gate-passing docs score positive,
    // the symbol soup scores negative
    assert(out(1L)._2 > 0 && out(3L)._2 < 0)
  }

  test("native top_bigram_count equals the exploded groupBy formulation") {
    import org.apache.spark.sql.graft.Bridge
    val d = Seq(
      (1L, base), (2L, "spam spam spam spam"), (3L, "tiny"), (4L, ""),
      (5L, "καλημέρα κόσμε καλημέρα κόσμε καλημέρα"),
      (6L, "a b a b a b c")
    ).toDF("doc_id", "text")
    val tk = TextOps.words(col("text"))
    val native = d.select(col("doc_id"),
      Bridge.column(graft.functions.TopBigramCount(Bridge.expression(tk))).as("n"))
      .as[(Long, Long)].collect().toMap
    val exploded = d.select(col("doc_id"), explode_outer(
        when(size(tk) >= 2, transform(sequence(lit(1), size(tk) - 1),
          j => concat_ws(" ", slice(tk, j, lit(2))))).otherwise(array())).as("bg"))
      .groupBy("doc_id", "bg").count()
      .groupBy("doc_id")
      .agg(max(when(col("bg").isNotNull, col("count")).otherwise(0L)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(native == exploded, s"$native vs $exploded")
    assert(native(2L) == 3L && native(6L) == 3L && native(3L) == 0L)
  }

  test("cosine near-dup: identical vector pair found at threshold ~1") {
    val v = Array.tabulate(16)(_.toFloat / 16f)
    val df = Seq((1L, v), (2L, v), (3L, v.map(x => 1f - x))).toDF("vec_id", "embedding")
    val exact = Similarity.cosineNearDups(df, col("vec_id"), col("embedding"),
      threshold = 0.999, nBits = 0)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(exact == Set((1L, 2L)))
    // bucketed mode finds it too (identical vectors share every sign bucket)
    val lsh = Similarity.cosineNearDups(df, col("vec_id"), col("embedding"),
      threshold = 0.999, nBits = 4)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(lsh == Set((1L, 2L)))
  }

  test("banded cosine LSH: precision exact, dup-recall 1, superset of narrower single bucket") {
    val df = vecs(200)
    val exact = Similarity.cosineNearDups(df, col("vec_id"), col("embedding"),
      threshold = 0.5, nBits = 0)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    val banded = Similarity.cosineNearDupsBanded(df, col("vec_id"), col("embedding"),
      threshold = 0.5, bands = 4, rowBits = 4)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    // verified candidates → every banded pair is a true pair
    assert(banded.subsetOf(exact), s"${banded -- exact} not in exact")
    // OR-amplification: 4 bands of the SAME leading 4 bits as the
    // single-bucket form can only add candidates relative to one band
    val single = Similarity.cosineNearDups(df, col("vec_id"), col("embedding"),
      threshold = 0.5, nBits = 4)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(single.subsetOf(banded), s"${single -- banded} lost by banding")
    // identical vectors agree on every sign bit → always found
    val v = Array.tabulate(16)(_.toFloat / 16f)
    val dups = Seq((1L, v), (2L, v), (3L, v.map(x => 1f - x))).toDF("vec_id", "embedding")
    val got = Similarity.cosineNearDupsBanded(dups, col("vec_id"), col("embedding"),
      threshold = 0.999, bands = 8, rowBits = 6)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("brute-force top-k: exact, ties broken by id, self excluded") {
    val df = vecs(50)
    val q = df.filter(col("vec_id") < 3)
    val out = Similarity.bruteForceTopK(df, q, col("vec_id"), col("embedding"), k = 5)
    val rows = out.select("query_id", "nbr_id", "rank").as[(Long, Long, Int)].collect()
    assert(rows.length == 15) // 3 queries × 5
    assert(!rows.exists(r => r._1 == r._2)) // never self
    assert(rows.groupBy(_._1).values.forall(_.map(_._3).sorted.toSeq == Seq(1, 2, 3, 4, 5)))
  }

  test("LSH ANN: recall vs brute force is usable (multiprobe)") {
    val df = vecs(300).cache()
    val q = df.filter(col("vec_id") < 20)
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(df, q, col("vec_id"), col("embedding"), k = 5))
    val approx = pairs(Similarity.lshTopK(df, q, col("vec_id"), col("embedding"), k = 5, nBits = 4))
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("IVF ANN: recall vs brute force (nprobe/nlist tunable)") {
    val df = vecs(300).cache()
    val q = df.filter(col("vec_id") < 20)
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(df, q, col("vec_id"), col("embedding"), k = 5))
    val ivf = pairs(Similarity.ivfTopK(df, q, col("vec_id"), col("embedding"),
      k = 5, nlist = 8, nprobe = 4))
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("BM25 top-k: independent recompute, no-term docs absent, exact-copy self-rank 1") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana banana durian durian durian"),
      (3L, "elderberry fig grape"),          // shares no term with query 1
      (4L, "apple banana apple cherry"),     // exact copy of doc 1
      (5L, "apple")).toDF("doc_id", "text")
    val queries = Seq((1L, "apple banana apple cherry")).toDF("doc_id", "text")
    val out = TextOps.bm25TopK(docs, col("text"), col("doc_id"),
        queries, col("doc_id"), col("text"), k = 10)
      .select("query_id", "doc_id", "score", "rank")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    // doc 3 shares no query term -> never retrieved
    assert(!out.exists(_._2 == 3L))
    // independent in-memory recompute of every score
    val corpus = Seq(1L -> "apple banana apple cherry",
      2L -> "banana banana durian durian durian", 3L -> "elderberry fig grape",
      4L -> "apple banana apple cherry", 5L -> "apple")
    val dls = corpus.map { case (id, t) => id -> t.split(" ", -1).length.toLong }.toMap
    val avgdl = dls.values.sum.toDouble / dls.size
    val nDocs = dls.size.toDouble
    val qws = "apple banana apple cherry".split(" ", -1).distinct
    val dfm = qws.map(w => w -> corpus.count(_._2.split(" ", -1).contains(w)).toLong).toMap
    val want = corpus.map { case (id, t) =>
      val toks = t.split(" ", -1)
      id -> qws.filter(toks.contains).map { w =>
        val tf = toks.count(_ == w).toDouble
        val s = (math.log(nDocs + 1.0) - math.log(dfm(w).toDouble + 1.0)) *
          ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dls(id).toDouble / avgdl)))
        math.round(s * 1e6 + 1e-9)
      }.sum
    }.filter(_._2 != 0L).toMap
    out.foreach { case (_, d, s, _) => assert(s == want(d), s"doc $d: $s != ${want(d)}") }
    // exact copies of the query text tie at the top; smaller id ranks first
    assert(out.take(2).map(_._2).toSeq == Seq(1L, 4L))
    assert(out(0)._3 == out(1)._3)
  }

  test("PQ ANN: codes in range, independent recompute, seeds self-encode to zero ADC") {
    import org.apache.spark.sql.graft.Bridge
    val df = vecs(100).cache()
    val m = 4; val ksub = 16; val dsub = 4
    val cbs = Similarity.pqCodebooks(df, col("vec_id"), col("embedding"), m, ksub)
    assert(cbs.size == m && cbs.forall(cb => cb.size == ksub && cb.forall(_.length == dsub)))
    val coded = df
      .withColumn("codes", Bridge.column(
        graft.sim.PqEncode(Bridge.expression(col("embedding")), cbs)))
      .withColumn("lut", Bridge.column(
        graft.sim.PqLut(Bridge.expression(col("embedding")), cbs)))
      .withColumn("ad2", Bridge.column(graft.sim.PqAdc(
        Bridge.expression(col("lut")), Bridge.expression(col("codes")), m, ksub)))
      .select("vec_id", "embedding", "codes", "ad2")
      .as[(Long, Array[Float], Array[Int], Double)].collect()
    assert(coded.forall(_._3.length == m))
    assert(coded.forall(_._3.forall(c => c >= 0 && c < ksub)))
    // independent in-memory recompute of every code and every ADC distance
    // (ADC = s-ordered sum of per-subspace LUT partials)
    coded.foreach { case (id, v, codes, ad2) =>
      var acc = 0.0
      (0 until m).foreach { s =>
        val d2s = (0 until ksub).map { j =>
          j -> (0 until dsub).map { i =>
            val d = v(s * dsub + i).toDouble - cbs(s)(j)(i).toDouble; d * d
          }.foldLeft(0.0)(_ + _)
        }
        val want = d2s.minBy { case (j, d) => (d, j) }._1
        assert(codes(s) == want, s"vec $id sub $s: got ${codes(s)}, want $want")
        acc += d2s(codes(s))._2
      }
      assert(acc == ad2, s"vec $id: adc $ad2 != recomputed $acc")
    }
    // the ksub hash-seeded codebook source vectors quantize to themselves:
    // zero quantization error in every subspace -> ADC exactly 0
    assert(coded.count(_._4 == 0.0) >= ksub)
    assert(coded.map(_._4).min == 0.0)
  }

  test("PQ ANN: malformed codes or lut (wrong length, out-of-range id) -> NULL, never a crash") {
    import org.apache.spark.sql.graft.Bridge
    val df = vecs(20)
    val cbs = Similarity.pqCodebooks(df, col("vec_id"), col("embedding"), 4, 16)
    val bad = Seq(
      (1L, Array.fill(16)(0.5f), Array(0, 1, 2)),        // wrong codes length
      (2L, Array.fill(16)(0.5f), Array(0, 1, 2, 16)),    // code >= ksub
      (3L, Array.fill(16)(0.5f), Array(0, 1, -1, 3)),    // negative code
      (4L, Array.fill(16)(0.5f), Array(0, 1, 2, 3)))     // well-formed
      .toDF("id", "v", "codes")
      .withColumn("lut", Bridge.column(
        graft.sim.PqLut(Bridge.expression(col("v")), cbs)))
    val adc = (lut: org.apache.spark.sql.Column) => Bridge.column(graft.sim.PqAdc(
      Bridge.expression(lut), Bridge.expression(col("codes")), 4, 16))
    val out = bad.select(col("id"), adc(col("lut")).as("ad2"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L) && out(2L) && out(3L) && !out(4L))
    // truncated lut -> NULL even with valid codes
    val shortLut = bad.filter(col("id") === 4L)
      .select(adc(slice(col("lut"), 1, 10)).as("ad2")).head()
    assert(shortLut.isNullAt(0))
  }

  test("IVF-PQ ANN: full probe degenerates to the pure PQ scan; pruned probe keeps recall") {
    val df = vecs(300).cache()
    val q = df.filter(col("vec_id") < 20)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("query_id", "nbr_id", "ad2", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    // probing every cell = the exact compressed-domain scan, bit for bit
    val full = rows(Similarity.ivfPqTopK(df, q, col("vec_id"), col("embedding"),
      k = 5, nlist = 8, nprobe = 8, m = 4, ksub = 16))
    val pq = rows(Similarity.pqTopK(df, q, col("vec_id"), col("embedding"),
      k = 5, m = 4, ksub = 16))
    assert(full == pq)
    // pruned probe: usable recall vs the uncompressed exact baseline
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(df, q, col("vec_id"), col("embedding"), k = 5))
    val pruned = pairs(Similarity.ivfPqTopK(df, q, col("vec_id"), col("embedding"),
      k = 5, nlist = 8, nprobe = 4, m = 4, ksub = 16))
    val recall = (exact intersect pruned).size.toDouble / exact.size
    assert(recall >= 0.25, s"recall $recall") // floor measured on the hash generator
  }

  test("PQ ANN: recall vs brute force (compressed-domain scan)") {
    val df = vecs(300).cache()
    val q = df.filter(col("vec_id") < 20)
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(df, q, col("vec_id"), col("embedding"), k = 5))
    val pq = pairs(Similarity.pqTopK(df, q, col("vec_id"), col("embedding"),
      k = 5, m = 4, ksub = 16))
    val recall = (exact intersect pq).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall") // floor measured on the hash generator
  }

  private def checkSemDedup(n: Int, tau: Double, nlist: Int): Unit = {
    val dim = 16
    val df = vecs(n, dim)
    val got = Similarity.semDedup(df, col("vec_id"), col("embedding"),
      tau = tau, nlist = nlist)
      .select("vec_id", "cell", "is_dup").as[(Long, Int, Boolean)]
      .collect().map { case (id, c, d) => id -> ((c, d)) }.toMap

    // independent recompute: same seeded-centroid rule, plain Scala math
    def h15(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val all = (0 until n).map { id =>
      id.toLong -> Array.tabulate(dim)(d =>
        ((graft.core.Mix.mix64(id * 131L + d) % 1000L) / 1000.0f))
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dp += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    val cents = all.sortBy { case (id, _) => (h15(id.toString), id) }
      .take(nlist).map(_._2)
    val cellOf = all.map { case (id, v) =>
      id -> cents.zipWithIndex.map { case (c, j) => (-cos(v, c), j) }.min._2
    }.toMap
    val byId = all.toMap
    for ((id, v) <- all) {
      val dup = all.exists { case (o, w) =>
        o < id && cellOf(o) == cellOf(id) && cos(w, v) >= tau }
      assert(got(id) === ((cellOf(id), dup)), s"id=$id")
    }
    // with hash-random 16-dim vectors in few cells some dups must exist AND
    // some survivors must remain, or the fixture proves nothing
    val nd = got.values.count(_._2)
    assert(nd > 0 && nd < n, s"degenerate fixture: $nd dups of $n")
  }

  test("semdedup: matches an independent in-memory recompute (cells, pairs, survivors)") {
    checkSemDedup(n = 120, tau = 0.8, nlist = 8)
  }

  test("semdedup: broadcast-join assignment path (nlist > 64) matches the recompute too") {
    // > 64 cells switches assignment from plan-literal argmax to the
    // broadcast-centroids + min(struct) aggregate — same output contract
    checkSemDedup(n = 400, tau = 0.6, nlist = 80)
  }

  test("autoNlist: linear in corpus (constant expected cell size), floor 16") {
    assert(Similarity.autoNlist(0L) == 16)
    assert(Similarity.autoNlist(500L) == 16) // sf0.1 embeddings → pinned width
    assert(Similarity.autoNlist(16384L) == 16)
    assert(Similarity.autoNlist(1L << 20) == 1024)
    assert(Similarity.autoNlist(1L << 30) == (1L << 20).toInt)
    // auto (nlist <= 0) equals the explicit value at sandbox corpus size
    val df = vecs(100)
    val auto = Similarity.semDedup(df, col("vec_id"), col("embedding"),
      tau = 0.8, nlist = 0).collect().toSet
    val pinned = Similarity.semDedup(df, col("vec_id"), col("embedding"),
      tau = 0.8, nlist = 16).collect().toSet
    assert(auto == pinned)
  }

  test("semdedup: exactly one survivor per identical group; partitioning-invariant") {
    val v1 = Array.tabulate(16)(_.toFloat / 16f)
    val v2 = Array.tabulate(16)(i => 1f - i.toFloat / 16f)
    val df = Seq((10L, v1), (11L, v1), (12L, v1), (20L, v2), (21L, v2))
      .toDF("vec_id", "embedding")
    val out = Similarity.semDedup(df, col("vec_id"), col("embedding"),
      tau = 0.999, nlist = 2)
      .select("vec_id", "is_dup").as[(Long, Boolean)].collect().toMap
    // identical vectors land in the same cell by construction; lowest id wins
    assert(out === Map(10L -> false, 11L -> true, 12L -> true,
      20L -> false, 21L -> true))
    val repart = Similarity.semDedup(df.repartition(7), col("vec_id"),
      col("embedding"), tau = 0.999, nlist = 2)
      .select("vec_id", "is_dup").as[(Long, Boolean)].collect().toMap
    assert(repart === out)
  }

  test("diversity sample: exact per-cell sizes, hash-minimal picks, invariant") {
    val df = vecs(200)
    val out = Similarity.diversitySample(df, col("vec_id"), col("embedding"),
      perCell = 3, nlist = 8)
      .select("vec_id", "cell", "cell_rank").as[(Long, Int, Long)].collect()
    // sizes: min(3, |cell|) per cell; ranks contiguous from 1
    out.groupBy(_._2).foreach { case (cell, rows) =>
      assert(rows.length <= 3, s"cell $cell oversampled")
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // the picked ids are the smallest salted hashes within each full cell
    def h(id: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"divers|$id".getBytes).map("%02x".format(_))
          .mkString.take(15), 16)
    val full = Similarity.semDedup(df, col("vec_id"), col("embedding"),
      tau = 2.0, nlist = 8) // tau>1: nothing dedups; reuse the cell assignment
      .select("vec_id", "cell").as[(Long, Int)].collect()
    assert(full.map(_._2).toSet == out.map(_._2).toSet ||
      out.map(_._2).toSet.subsetOf(full.map(_._2).toSet))
    full.groupBy(_._2).foreach { case (cell, rows) =>
      val expect = rows.map(_._1).sortBy(id => (h(id), id)).take(3).toSet
      val got = out.filter(_._2 == cell).map(_._1).toSet
      assert(got == expect, s"cell $cell picks differ")
    }
    val repart = Similarity.diversitySample(df.repartition(7), col("vec_id"),
      col("embedding"), perCell = 3, nlist = 8)
      .select("vec_id", "cell", "cell_rank").as[(Long, Int, Long)].collect()
    assert(repart.toSet == out.toSet)
  }

  // ---------- text ops ----------

  test("language-ID picks the profile language; 'und' when no stopwords hit") {
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "der hund ist nicht zu haus und die katze"),
      (3L, "le chat est dans la maison et pas dehors"),
      (4L, "xyzzy plugh qwerty asdf")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextOps.langId(col("text")).as("p"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en" && out(2L) == "de" && out(3L) == "fr" && out(4L) == "und")
  }

  test("oov rate: top-V cut deterministic, ppm integer-exact, OOV words counted") {
    val df = Seq(
      (1L, "a a a b b c"),     // with V=2: vocab {a,b} -> c is OOV
      (2L, "c c c c"),         // all OOV
      (3L, "a b a b")          // none OOV
    ).toDF("doc_id", "text")
    val out = TextOps.oovRate(df, col("text"), col("doc_id"), vocabSize = 2)
      .select("doc_id", "n_words", "n_oov", "oov_ppm")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // corpus counts: a=6, b=4, c=5 -> top-2 by (n desc, w asc) = {a, c}
    assert(out(1L) === ((1L, 6L, 2L, 333333L)))  // b b are OOV
    assert(out(2L) === ((2L, 4L, 0L, 0L)))
    assert(out(3L) === ((3L, 4L, 2L, 500000L)))
  }

  test("source drift: matches an independent integer recompute; partitioning-invariant") {
    val df = Seq(
      (1L, "a a b", "web"), (2L, "a b b c", "web"), (3L, "b c c", "web"),
      (4L, "a a a", "code"), (5L, "c c", "code"), (6L, "a b c d", "code"),
      (7L, "d d d d", "web")
    ).toDF("doc_id", "text", "source")
    val out = TextOps.sourceDrift(df, col("text"), col("doc_id"), topV = 3)
      .select("source", "tok_a", "tok_b", "drift_l2", "n_words")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap

    // independent recompute in plain Scala from the same hash rule
    def h15(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
          .map("%02x".format(_)).mkString.take(15), 16)
    val rows = Seq(
      (1L, "a a b", "web"), (2L, "a b b c", "web"), (3L, "b c c", "web"),
      (4L, "a a a", "code"), (5L, "c c", "code"), (6L, "a b c d", "code"),
      (7L, "d d d d", "web"))
    val halves = rows.map { case (id, _, _) => id -> h15(s"drift|$id") % 2 }.toMap
    val wc = rows.flatMap { case (id, t, s) =>
      t.split(" ", -1).map(w => ((s, halves(id), w), 1L)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val vocab = wc.groupBy(_._1._3).view.mapValues(_.values.sum).toSeq
      .sortBy { case (w, n) => (-n, w) }.take(3).map(_._1).toSet
    for (src <- Seq("web", "code")) {
      val ta = wc.collect { case ((s, 0L, _), n) if s == src => n }.sum
      val tb = wc.collect { case ((s, 1L, _), n) if s == src => n }.sum
      val wordsIn = wc.keys.collect { case (s, _, w) if s == src && vocab(w) => w }.toSet
      val drift = wordsIn.toSeq.map { w =>
        val na = wc.getOrElse((src, 0L, w), 0L); val nb = wc.getOrElse((src, 1L, w), 0L)
        val pa = na * 1000000L / math.max(ta, 1L); val pb = nb * 1000000L / math.max(tb, 1L)
        (pa - pb) * (pa - pb)
      }.sum
      assert(out(src) === ((src, ta, tb, drift, wordsIn.size.toLong)), s"source $src")
    }

    val repart = TextOps.sourceDrift(df.repartition(5), col("text"), col("doc_id"), topV = 3)
      .select("source", "tok_a", "tok_b", "drift_l2", "n_words")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(repart === out)
  }

  test("corpus card: exact one-row audit on a hand fixture") {
    val good = (1 to 20).map(i => s"word$i").mkString(" ") // passes the gate
    val df = Seq(
      (1L, good, "en"), (2L, good, "en"),      // exact dup pair
      (3L, "too short", "fr"), (4L, good + " tail", "en"))
      .toDF("doc_id", "text", "lang")
    val r = TextOps.corpusCard(df, col("text"), col("lang")).head()
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_distinct") == 3L)
    assert(r.getAs[Long]("dup_ppm") == 250000L)
    assert(r.getAs[Long]("n_keep") == 3L) // doc 3 fails the length gate
    assert(r.getAs[Long]("keep_ppm") == 750000L)
    assert(r.getAs[String]("top_lang") == "en")
  }

  test("quality sample: rate map from the classifier score; replay-stable") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.01")
    val out = TextOps.qualitySample(docs, col("text"), col("doc_id"))
      .select("doc_id", "keep_ppm", "kept").as[(Long, Long, Boolean)].collect()
    assert(out.length == 500)
    out.foreach { case (_, ppm, _) =>
      assert(ppm >= 10000L && ppm <= 1000000L) }
    // keep decision recomputes from the hash rule exactly
    def h(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
          .map("%02x".format(_)).mkString.take(15), 16)
    out.foreach { case (id, ppm, kept) =>
      assert(kept == (h(s"qs|$id") % 1000000L < ppm), s"doc $id") }
    // partitioning-invariant
    val again = TextOps.qualitySample(docs.repartition(7), col("text"), col("doc_id"))
      .select("doc_id", "keep_ppm", "kept").as[(Long, Long, Boolean)].collect()
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("quality keep: too-short and symbol-heavy docs dropped") {
    val df = Seq(
      (1L, base),                                  // good
      (2L, "too short"),                           // < 10 words
      (3L, ("x@#$ " * 20).trim)                    // symbol-heavy
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextOps.qualityKeep(col("text")).as("k"))
      .as[(Long, Boolean)].collect().toMap
    assert(out(1L) && !out(2L) && !out(3L))
  }

  test("fingerprint: equal texts equal, word order matters") {
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "gamma beta alpha"))
      .toDF("doc_id", "text")
    val fp = df.select(col("doc_id"), TextOps.fingerprint(col("text")).as("f"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L) && fp(1L) != fp(3L))
  }

  test("shingles: distinct word n-grams; short docs yield empty set") {
    val out = Seq((1L, "a b c d"), (2L, "a b"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedupe.shingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L).toSet == Set("a b c", "b c d"))
    assert(out(2L).isEmpty)
  }

  test("scoreCalibrate: matches percent_rank window semantics; ties share buckets") {
    import org.apache.spark.sql.expressions.{Window => W}
    val docs = (0L until 200L).map(i => (i, s"s${i % 3}", (i * 7 % 23).toInt))
      .toDF("doc_id", "source", "sc")
    val out = TextOps.scoreCalibrate(docs, col("doc_id"), col("source"),
      col("sc"), buckets = 4)
      .select("doc_id", "pct_rank", "bucket")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // independent recompute with Spark's own percent_rank window
    val ref = docs.withColumn("pr",
      round(percent_rank().over(W.partitionBy("source").orderBy("sc")), 6))
      .select("doc_id", "pr").as[(Long, Double)].collect().toMap
    ref.foreach { case (id, pr) =>
      assert(out(id)._1 === pr, s"doc $id: ${out(id)._1} vs window $pr")
    }
    // equal (source, score) → equal bucket, and buckets stay in [0, 4)
    val byKey = (0L until 200L).groupBy(i => (i % 3, i * 7 % 23))
    byKey.values.foreach { ids =>
      assert(ids.map(out(_)._2).toSet.size === 1, s"tie split: $ids")
    }
    assert(out.values.forall(v => v._2 >= 0 && v._2 < 4))
  }

  test("invertedIndex: true df, smallest-ids cap, minDf gate, parallelism-invariant") {
    // token "common" in 30 docs, "rare" in 2, "hapax" in 1
    val docs = (0L until 30L).map { i =>
      val extra = if (i < 2) " rare" else ""
      val h = if (i == 5) " hapax" else ""
      (i, s"common$extra$h")
    }.toDF("doc_id", "text")
    def run(parts: Int) = TextOps.invertedIndex(
      docs.repartition(parts), col("text"), col("doc_id"),
      minDf = 2, maxPostings = 10)
      .select("token", "df", "postings")
      .as[(String, Long, Seq[Long])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val out = run(4)
    assert(out.keySet === Set("common", "rare")) // hapax gated by minDf
    assert(out("common")._1 === 30L)             // TRUE df despite the cap
    assert(out("common")._2 === (0L until 10L))  // smallest 10 ids, sorted
    assert(out("rare") === ((2L, Seq(0L, 1L))))
    assert(run(1) === out)                       // cap is order-independent
  }

  test("logTemplates: masking order and grouping — IPs, hex ids, numbers") {
    val lines = Seq(
      "GET /api/v2/users/123 from 10.0.0.1 req=deadbeefcafe took 45ms",
      "GET /api/v2/users/999 from 192.168.7.13 req=0123456789ab took 9ms",
      // all-digit 12-char run: must mask as HEX (matched before \d+)
      "GET /api/v2/users/4 from 10.1.2.3 req=123456789012 took 1ms",
      "POST /login ok")
    val out = TextOps.logTemplates(lines.toDF("msg"), col("msg"), topK = 5)
      .select("template", "n").as[(String, Long)].collect().toMap
    assert(out === Map(
      "GET /api/v<N>/users/<N> from <IP> req=<HEX> took <N>ms" -> 3L,
      "POST /login ok" -> 1L))
  }

  test("logTemplates: corpus never shuffles — agg is map-side combinable on template") {
    val df = TextOps.logTemplates(
      (1 to 100).map(i => s"evt $i from 10.0.0.$i").toDF("msg"), col("msg"), 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("dsir: target-like docs outweigh raw-typical ones; exactly k kept; lr broadcasts") {
    // target slice (id < 10) speaks vocabulary A; the rest vocabulary B.
    // A held-out A-pure doc must weigh higher than a B-pure doc.
    val docs = (0L until 20L).map { i =>
      val v = if (i < 10) "alpha beta gamma delta" else "omega psi chi phi"
      (i, s"$v $v $v")
    }.toDF("doc_id", "text")
    val df = TextOps.dsirSample(docs, col("text"), col("doc_id"),
      col("doc_id") < 10, buckets = 512, k = 5)
    val out = df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(out.size === 20)
    assert(out.count(_._2._2) === 5) // exact budget
    // every A-doc outweighs every B-doc (A tokens are 2x likely under the
    // target LM, B tokens near-absent from it)
    val aMin = (0L until 10L).map(out(_)._1).min
    val bMax = (10L until 20L).map(out(_)._1).max
    assert(aMin > bMax, s"aMin=$aMin bMax=$bMax")
    // the log-ratio table is model-sized: it must broadcast, and the
    // corpus must not sort-merge anywhere
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
