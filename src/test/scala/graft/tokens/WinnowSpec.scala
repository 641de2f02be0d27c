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
