package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Paragraph-dedup mechanism tests: first-occurrence policy (cross-doc and
  * within-doc), the frequency policy's remove-everywhere semantics, the
  * all-removed NULL lane, no-dup round-trip, idempotence, and the
  * generator's parallelism invariance.
  */
class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private val Sep = ParagraphDedup.Sep

  private def docs(rows: (Long, Seq[String])*) =
    rows.map { case (id, ps) => (id, "web", ps.mkString(Sep)) }
      .toDF("doc_id", "source", "text")

  private def byId(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_para", "n_removed", "clean_text")
      .as[(Long, Long, Long, Option[String])].collect().sortBy(_._1)

  test("first-wins: earliest (doc_id, idx) survives; later copies removed across and within docs") {
    val out = byId(ParagraphDedup.dedupeFirstWins(
      docs(1L -> Seq("aa bb", "cc dd", "aa bb"), 2L -> Seq("cc dd", "ee ff"))))
    assert(out(0) == ((1L, 3L, 1L, Some(s"aa bb${Sep}cc dd"))))
    assert(out(1) == ((2L, 2L, 1L, Some("ee ff"))))
  }

  test("first-wins: a doc whose every paragraph is a later copy yields NULL clean_text") {
    val out = byId(ParagraphDedup.dedupeFirstWins(
      docs(1L -> Seq("aa", "bb"), 2L -> Seq("bb", "aa"))))
    assert(out(1) == ((2L, 2L, 2L, None)))
  }

  test("stripCommon removes EVERY copy (including the first) once >= minDocs docs carry it") {
    val out = byId(ParagraphDedup.stripCommon(
      docs(1L -> Seq("shared", "u1"), 2L -> Seq("shared", "u2"), 3L -> Seq("u3", "shared")),
      minDocs = 2))
    assert(out.map(_._3).toSeq == Seq(1L, 1L, 1L)) // one removal per doc
    assert(out.map(_._4).toSeq == Seq(Some("u1"), Some("u2"), Some("u3")))
  }

  test("stripCommon keeps within-doc repeats below the doc threshold") {
    // "twice" appears twice in ONE doc: 1 distinct doc < minDocs=2 -> kept
    val out = byId(ParagraphDedup.stripCommon(
      docs(1L -> Seq("twice", "twice"), 2L -> Seq("u2")), minDocs = 2))
    assert(out(0) == ((1L, 2L, 0L, Some(s"twice${Sep}twice"))))
  }

  test("no-dup corpus round-trips: clean_text == text, zero removals") {
    val in = docs(1L -> Seq("p1 a", "p2 b"), 2L -> Seq("p3 c"))
    val out = ParagraphDedup.dedupeFirstWins(in)
    assert(out.filter(col("n_removed") =!= 0).count() == 0)
    assert(out.join(in, Seq("doc_id"))
      .filter(col("clean_text") =!= col("text")).count() == 0)
  }

  test("idempotence: dedup of the cleaned corpus removes nothing") {
    val once = ParagraphDedup.dedupeFirstWins(
      ParagraphDedup.genParaDocs(spark, rows = 300, parts = 4).toDF())
      .filter(col("clean_text").isNotNull)
      .select(col("doc_id"), col("source"), col("clean_text").as("text"))
    val twice = ParagraphDedup.dedupeFirstWins(once)
    assert(twice.filter(col("n_removed") =!= 0).count() == 0)
  }

  test("generator is a pure function of the row id (parallelism-invariant)") {
    val a = ParagraphDedup.genParaDocs(spark, rows = 200, parts = 2).collect().sortBy(_.doc_id)
    val b = ParagraphDedup.genParaDocs(spark, rows = 200, parts = 7).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
  }

  test("generator produces real cross-doc duplication for the oracles to bite on") {
    val stats = ParagraphDedup.dedupeFirstWins(
      ParagraphDedup.genParaDocs(spark, rows = 500, parts = 4).toDF())
      .agg(sum("n_removed"), sum("n_para")).as[(Long, Long)].head()
    assert(stats._1 > 50, s"expected substantial dup mass, got $stats")
    assert(stats._1 < stats._2, "not everything should be removed")
  }
}
