package graft.tokens

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Winnowing substring-dedup mechanism tests: the guarantee (shared runs of
  * ≥ w+k-1 tokens always yield a shared fingerprint), the negative case,
  * alignment-freedom, the mixing sampler's determinism, and the boilerplate
  * generator's parallelism invariance.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = Winnow.K // 16
  private val W = Winnow.W // 8
  private val Guarantee = K + W - 1 // 23

  /** Distinct filler tokens outside the shared-run alphabet. */
  private def filler(seed: Int, n: Int): Seq[Int] =
    (0 until n).map(i => 10000 + seed * 997 + i)

  private def df(rows: (String, Seq[Int], String)*) =
    rows.map { case (id, tk, src) => (id, tk, tk.size, src) }
      .toDF("doc_id", "tokens", "n_tok", "source")

  test("guarantee: a shared run of w+k-1 tokens at DIFFERENT offsets yields a shared fingerprint") {
    val run = (1 to Guarantee).map(_ + 100) // 23 shared tokens
    val a = filler(1, 7) ++ run ++ filler(2, 10)
    val b = filler(3, 19) ++ run ++ filler(4, 3) // misaligned vs a
    val stats = Winnow.dupStats(df(("a", a, "web"), ("b", b, "web")))
      .select("doc_id").as[String].collect().sorted
    assert(stats.toSeq == Seq("a", "b"))
  }

  test("negative: documents with no shared run share no fingerprint") {
    val a = filler(5, 60)
    val b = filler(6, 60)
    assert(Winnow.dupStats(df(("a", a, "web"), ("b", b, "web"))).count() == 0)
  }

  test("docs below the guarantee length are excluded on both engines' rule") {
    val short = filler(7, Guarantee - 1)
    assert(Winnow.fingerprints(df(("s", short, "web"))).count() == 0)
    val exact = filler(8, Guarantee)
    assert(Winnow.fingerprints(df(("e", exact, "web"))).count() >= 1)
  }

  test("dup_fp counts only shared fingerprints; unique tails stay unique") {
    // a and b share one long run; c is unrelated and must not appear
    val run = (1 to 64).map(_ + 500)
    val a = filler(9, 11) ++ run ++ filler(10, 40)
    val b = filler(11, 29) ++ run ++ filler(12, 8)
    val c = filler(13, 80)
    val out = Winnow.dupStats(df(("a", a, "web"), ("b", b, "web"), ("c", c, "books")))
      .select("doc_id", "n_fp", "dup_fp")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == Set("a", "b"))
    assert(out("a")._2 >= 1 && out("a")._2 <= out("a")._1)
    assert(out("b")._2 >= 1 && out("b")._2 <= out("b")._1)
  }

  test("native WinnowFingerprints equals the builtin column formulation") {
    val sample = Winnow.genWithBoilerplate(spark, rows = 300, parts = 4).toDF()
    val native = Winnow.fingerprints(sample)
      .select("doc_id", "fp").as[(String, Long)].collect().toSet
    val builtin = Winnow.fingerprintsColumns(sample)
      .select("doc_id", "fp").as[(String, Long)].collect().toSet
    assert(native == builtin && native.nonEmpty)
  }

  test("boilerplate generator is parallelism-invariant and actually injects shared runs") {
    val p2 = Winnow.genWithBoilerplate(spark, rows = 400, parts = 2).collect()
      .sortBy(_.doc_id)
    val p8 = Winnow.genWithBoilerplate(spark, rows = 400, parts = 8).collect()
      .sortBy(_.doc_id)
    assert(p2.length == 400 && p8.length == 400)
    assert(p2.zip(p8).forall { case (x, y) =>
      x.doc_id == y.doc_id && java.util.Arrays.equals(x.tokens, y.tokens) })
    // at 35% share rate over 400 docs, the dup detector must fire
    val dups = Winnow.dupStats(
      Winnow.genWithBoilerplate(spark, rows = 400, parts = 4).toDF())
    assert(dups.count() > 50)
  }

  test("duplicate-run removal: losing runs deleted, winner kept, clean hash exact") {
    // k = Winnow.K = 16; run of 20 tokens shared by a < b < c; c also
    // repeats the run twice internally
    val run = (1 to 20).map(_ + 500)
    val aTok = filler(10, 5) ++ run ++ filler(11, 6)
    val bTok = filler(12, 9) ++ run ++ filler(13, 4)
    val cTok = run ++ filler(14, 7) ++ run
    val out = Winnow.removeDuplicateRuns(df(
        ("a", aTok, "web"), ("b", bTok, "web"), ("c", cTok, "web"),
        ("z", filler(20, 40), "web")))
      .select("doc_id", "n_before", "n_removed", "clean_hash")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // 'a' holds the lexicographically-first site of every run gram → winner
    assert(!out.contains("a"))
    assert(!out.contains("z")) // nothing shared
    assert(out("b")._3 == 20L) // the whole run, exactly
    // c loses both of its copies (winner sites live in a)
    assert(out("c")._3 == 40L)
    // clean hash equals the hash of the expected surviving arrays
    def h(tk: Seq[Int]): Long = {
      val s = tk.mkString(",")
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
          .map("%02x".format(_)).mkString.take(15), 16)
    }
    assert(out("b")._4 == h(filler(12, 9) ++ filler(13, 4)))
    assert(out("c")._4 == h(filler(14, 7)))
  }

  test("duplicate-run removal: one winner per planted block; removal lane exact") {
    val rows = 600
    val docs = Winnow.genWithBoilerplate(spark, rows = rows, parts = 4).toDF()
    val out = Winnow.removeDuplicateRuns(docs)
      .select("doc_id", "n_removed").as[(String, Long)].collect().toMap
    // regenerate carrier membership the generator's way
    val cfg = graft.core.GenConfig(rows = rows, maxTok = 384)
    val carriers = (0L until rows).flatMap { id =>
      val base = graft.core.Gen.rowOf(id, cfg)
      val pick = graft.core.Mix.bounded(0xB011L, id, 7, 100)
      if (pick < 35 && base.n_tok >= 96 + 8)
        Some(base.doc_id -> graft.core.Mix.bounded(0xB022L, id, 8, 24))
      else None
    }
    val byBlock = carriers.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    // each block keeps exactly one carrier out of the lane; all in-lane
    // docs lose at least their 96-token planted run
    val expectedLane = byBlock.values.flatMap(_.drop(1)).toSet
    assert(out.keySet == expectedLane,
      s"lane mismatch: extra=${out.keySet -- expectedLane} missing=${expectedLane -- out.keySet}")
    out.values.foreach(n => assert(n >= 96L))
  }

  test("duplicate-run removal is partitioning-invariant") {
    def digest(parts: Int) = Winnow.removeDuplicateRuns(
        Winnow.genWithBoilerplate(spark, rows = 400, parts = parts).toDF())
      .agg(expr("bit_xor(xxhash64(doc_id, n_removed, clean_hash))")).as[Long].head()
    assert(digest(2) == digest(8))
  }

  test("mixSample is a deterministic subset honoring per-source rates (ghost excluded)") {
    val rows = graft.core.Gen.tokenseq(spark,
      graft.core.GenConfig(rows = 4000, parts = 4)).toDF()
      .select(col("doc_id"), col("n_tok"), col("source"))
    val kept1 = TokenOps.mixSample(rows).select("doc_id").as[String].collect().toSet
    val kept2 = TokenOps.mixSample(rows.repartition(13))
      .select("doc_id").as[String].collect().toSet
    assert(kept1 == kept2) // replay/partitioning stable
    val stats = TokenOps.mixStats(rows)
      .select("source", "n_docs", "n_kept")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // code keeps everything (ppm=1e6); ghost keeps nothing (absent from rates)
    assert(stats("code")._1 == stats("code")._2)
    assert(stats.get("ghost").forall(_._2 == 0L))
    // web's realized rate lands near its 12% target
    val (webDocs, webKept) = stats("web")
    val rate = webKept.toDouble / webDocs
    assert(rate > 0.08 && rate < 0.16, s"web rate $rate")
  }
}
