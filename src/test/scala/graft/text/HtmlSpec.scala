package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HtmlSpec extends SparkSpec {

  test("extract: tags stripped, scripts dropped, whitespace normalized (hand case)") {
    import spark.implicits._
    val df = Seq(
      (1L, "<html><head><title>hi there</title><script >var x;</script></head>" +
        "<body><a href=\"/x\">link text</a> <p>body words here</p></body></html>"),
      (2L, "no markup at all"),
      (3L, "<p></p><p></p>")
    ).toDF("doc_id", "html")
    val out = Html.extract(df, col("html"), col("doc_id"))
      .select("doc_id", "n_tags", "n_links", "text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // doc 1: tags = html,head,title,/title,script,/script,/head,body,a,/a,p,/p,/body,/html = 14
    assert(out(1L)._2 === 14L, out(1L))
    assert(out(1L)._3 === 1L)
    assert(out(1L)._4 === "hi there link text body words here", s"'${out(1L)._4}'")
    assert(out(2L) === ((2L, 0L, 0L, "no markup at all")))
    assert(out(3L)._4 === "")
  }

  test("generated pages: script share and link counts follow the plant schedule") {
    val docs = Html.genHtmlDocs(spark, rows = 900, parts = 8).toDF()
    val out = Html.extract(docs, col("html"), col("doc_id")).cache()
    // scripts appear on ids % 3 == 0 and are never in the extracted text
    val withJs = out.filter(col("text").contains("javascript") ||
      col("text").contains("var x")).count()
    assert(withJs === 0L)
    // every page extracts SOME text and text is always shorter than raw
    assert(out.filter(length(col("text")) === 0).count() === 0L)
    assert(out.filter(col("text_ppm") >= 1000000L).count() === 0L)
    // link counts recompute from the generator schedule
    import spark.implicits._
    val links = out.select("doc_id", "n_links").as[(Long, Long)].collect().toMap
    for (id <- 0L until 900L)
      assert(links(id) === graft.core.Mix.bounded(0x4712L, id, 3, 5).toLong, s"id=$id")
    out.unpersist()
  }

  test("link rank: matches an exact integer recompute; mass concentrates on link targets") {
    import spark.implicits._
    val n = 700
    val docs = Html.genHtmlDocs(spark, rows = n, parts = 8).toDF()
    val got = Html.linkRank(docs, col("html"), col("doc_id"), iters = 3)
      .select("doc_id", "rank_micro", "indegree")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    // independent recompute: rebuild the edge list from the generator
    // schedule and run the same integer recurrence in plain Scala
    val edges = (0L until n).flatMap { id =>
      val nl = graft.core.Mix.bounded(0x4712L, id, 3, 5)
      (0 until nl).map(i => id -> (id + i) % 97)
    }
    val deg = edges.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    var r = (0L until n).map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val s = edges.groupBy(_._2).map { case (d, in) =>
        d -> in.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = (0L until n).map(v => v -> (150000L + 850000L * s.getOrElse(v, 0L) / 1000000L)).toMap
    }
    val indeg = edges.groupBy(_._2).map { case (d, g) => d -> g.size.toLong }
    for (v <- 0L until n) {
      assert(got(v) === ((r(v), indeg.getOrElse(v, 0L))), s"node $v")
    }
    // only /p/0../p/96 receive links: everything else sits at the base rank
    assert((97L until n).forall(v => got(v)._1 == 150000L))
    // every target with inbound links ranks above the base floor
    assert((0L until 97L).filter(v => got(v)._2 > 0)
      .forall(v => got(v)._1 > 150000L))
    assert((0L until 97L).count(v => got(v)._1 > 1000000L) > 80)
  }

  test("web pipeline: gates, scrub, and dedup hit exactly the planted lanes") {
    import spark.implicits._
    val pages = Html.genWebPages(spark, rows = 4000, parts = 8).toDF()
    val out = Html.webPipeline(pages)
      .select("doc_id", "n_pii", "clean_hash")
      .as[(Long, Long, Long)].collect()
    // replicate extract + the per-doc gates exactly (lane membership alone
    // is not enough: a "short lane" page whose title+anchor text reaches
    // the 40-char floor legitimately passes)
    def textOf(html: String): String =
      html.replaceAll("<script[^>]*>[^<]*</script>", " ")
        .replaceAll("<[^>]*>", " ").replaceAll("  +", " ").trim
    val docs = (0L until 4000L).map { id =>
      val html = Html.rowOfWeb(id).html
      val t = textOf(html)
      val passes = t.length >= 40 &&
        t.length.toLong * 1000000L / math.max(html.length, 1) >= 100000L
      (id, t, passes)
    }
    // dedup folds each surviving TEXT class to its min passing id
    val expect = docs.filter(_._3).groupBy(_._2).map { case (t, ms) =>
      ms.map(_._1).min -> t
    }
    assert(out.map(_._1).toSet == expect.keySet,
      s"survivors ${out.length} vs expected ${expect.size}")
    // PII counts: exactly one email + one phone on the planted pages
    out.foreach { case (id, nPii, _) =>
      val expected = if (expect(id).contains("@")) 2L else 0L
      assert(nPii == expected, s"doc $id pii=$nPii expected=$expected")
    }
    // one output row per distinct surviving text
    assert(out.map(_._3).distinct.length == expect.size)
    // the planted lanes do real work: gates dropped pages AND dedup folded
    assert(docs.count(!_._3) > 300, "density/length gates never fired")
    assert(docs.count(_._3) > expect.size + 1000, "dedup never folded")
  }

  test("generator is parallelism-invariant; extract is idempotent on clean text") {
    val a = Html.genHtmlDocs(spark, rows = 300, parts = 1).toDF()
    val b = Html.genHtmlDocs(spark, rows = 300, parts = 5).toDF()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // extracting the already-extracted text changes nothing (no tags left)
    val once = Html.extract(a, col("html"), col("doc_id"))
      .select(col("doc_id"), col("text"))
    val twice = Html.extract(once.withColumnRenamed("text", "html"),
      col("html"), col("doc_id")).select(col("doc_id"), col("text"))
    assert(once.exceptAll(twice).isEmpty)
  }
}
