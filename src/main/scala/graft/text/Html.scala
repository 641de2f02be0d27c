package graft.text

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Mix

/** HTML text extraction ("boilerplate strip") — the first stage of every
  * web-crawl training-data pipeline: drop script blocks, strip tags,
  * normalize whitespace, and emit the link/tag density signals used to
  * gate boilerplate-heavy pages (trafilatura/jusText-style heuristics,
  * reduced to the engine-portable regex subset — a full DOM parser is a
  * tokenizer job, not a distributed-plan job; this is the vectorized
  * first pass that handles the 10^12-page bulk).
  *
  * Cross-engine rules: the patterns live in the shared Java-regex ∩ RE2
  * dialect; script bodies are matched with `[^<]*` (the generator
  * guarantees no `<` inside scripts) so no dot-matches-newline divergence
  * exists; the replace chain applies in fixed order on both sides, and
  * density ratios are integer ppm.
  *
  * Scale shape (10^12 rows): fully NARROW — per-row regexes in
  * whole-stage codegen, no UDF, no shuffle.
  */
object Html {

  val ScriptPat = "<script[^>]*>[^<]*</script>"
  val TagPat = "<[^>]*>"
  val LinkPat = "<a [^>]*>"

  /** Extracted text + density signals. */
  def extract(df: DataFrame, html: Column, id: Column): DataFrame = {
    val noScript = regexp_replace(html, ScriptPat, " ")
    val noTags = regexp_replace(noScript, TagPat, " ")
    val clean = trim(regexp_replace(noTags, "  +", " "))
    df.select(
        id.as("doc_id"),
        size(regexp_extract_all(html, lit(TagPat), lit(0))).cast("long").as("n_tags"),
        size(regexp_extract_all(html, lit(LinkPat), lit(0))).cast("long").as("n_links"),
        length(html).cast("long").as("raw_len"),
        clean.as("text"))
      .withColumn("text_len", length(col("text")).cast("long"))
      .withColumn("text_ppm", expr("text_len * 1000000 div greatest(raw_len, 1)"))
  }

  /** In-corpus link targets of a page: the numeric ids in `/p/<n>` hrefs
    * (the generator's link namespace). Narrow regex extraction.
    */
  def linkTargets(html: Column): Column =
    transform(regexp_extract_all(html, lit("<a href=\"/p/([0-9]+)\""), lit(1)),
      s => s.cast("long"))

  /** PageRank over the in-corpus link graph, `iters` fixed iterations —
    * the classic crawl-frontier / quality-prior signal (Page et al. 1999;
    * CommonCrawl-scale pipelines rank hosts the same way).
    *
    * Cross-engine determinism: ranks are integer MICRO-units. Each
    * iteration is `r' = 150000 + (850000 · Σ (r div deg)) div 10⁶` — every
    * step integer (per-edge contribution uses integer division, losing
    * only sub-micro remainders identically in both engines), so the
    * inbound sum is order-independent and a SQL oracle chains the same
    * CTEs. Simplifications (documented, standard): no dangling-mass
    * redistribution; damping 0.85 as (1−d)=0.15 absolute.
    *
    * Scale shape (10^12 pages): edges = one narrow extract + explode;
    * outdegree and each iteration are map-side-combinable hash aggregates;
    * the per-iteration join is keyed by src — at scale you persist `edges`
    * pre-partitioned by src once and every iteration reuses the exchange
    * (iterations here unroll into one plan; a 50-iteration production run
    * would checkpoint like [[graft.dedup.Dedupe.components]]).
    */
  def linkRank(df: DataFrame, html: Column, id: Column,
               iters: Int = 3): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val pages = df.select(id.as("node"), linkTargets(html).as("targets"))
    val edges0 = pages.select(col("node").as("src"), explode(col("targets")).as("dst"))
    val outdeg = edges0.groupBy("src").agg(count(lit(1)).as("deg"))
    val edges = edges0.join(outdeg, "src")
    val nodes = pages.select(col("node"))
    var ranks = nodes.withColumn("r", lit(1000000L))
    for (_ <- 1 to iters) {
      val contrib = edges.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      ranks = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(850000 * coalesce(s, 0L)) div 1000000")).as("r"))
    }
    val indeg = edges0.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).cast("long").as("indegree"))
    ranks.join(indeg, Seq("node"), "left")
      .select(col("node").as("doc_id"), col("r").as("rank_micro"),
        coalesce(col("indegree"), lit(0L)).as("indegree"))
  }

  final case class HtmlDoc(doc_id: Long, html: String)

  private val Words = Vector("news", "story", "update", "market", "local",
    "sports", "review", "guide", "topic", "daily", "report", "extra")

  private def w(id: Long, k: Int): String =
    Words(Mix.bounded(0x4711L, id, k, Words.length))

  /** Deterministic HTML page generator: a pure function of the row id
    * (byte-identical at any parallelism). Pages carry a title, 1-3 body
    * paragraphs, 0-4 nav links, and ~1/3 get a script block — so link/tag
    * densities and extracted text are exactly recomputable.
    */
  def rowOf(id: Long): HtmlDoc = {
    val sb = new StringBuilder("<html><head><title>")
    sb.append(w(id, 1)).append(' ').append(w(id, 2)).append("</title>")
    if (id % 3 == 0)
      sb.append("<script type=\"text/javascript\">var x = 1; f(x);</script>")
    sb.append("</head><body>")
    val nLinks = Mix.bounded(0x4712L, id, 3, 5)
    var i = 0
    while (i < nLinks) {
      sb.append("<a href=\"/p/").append((id + i) % 97).append("\">")
        .append(w(id, 10 + i)).append("</a> ")
      i += 1
    }
    val nPara = 1 + Mix.bounded(0x4713L, id, 4, 3)
    var p = 0
    while (p < nPara) {
      sb.append("<p>")
      val nw = 4 + Mix.bounded(0x4714L, id, 20 + p, 6)
      var j = 0
      while (j < nw) {
        if (j > 0) sb.append(' ')
        sb.append(w(id, 30 + 10 * p + j))
        j += 1
      }
      sb.append("</p>")
      p += 1
    }
    sb.append("</body></html>")
    HtmlDoc(id, sb.toString)
  }

  def genHtmlDocs(spark: SparkSession, rows: Long, parts: Int): Dataset[HtmlDoc] = {
    import spark.implicits._
    spark.range(0, rows, 1, parts).as[Long].map(rowOf)
  }

  // ---- end-to-end web-curation pipeline ---------------------------------

  private def wg(g: Long, k: Int): String =
    Words(Mix.bounded(0x5105L, g, k, Words.length))

  /** Web-page generator for the COMPOSED pipeline: every textual element
    * is a pure function of a content GROUP `g` (so refetches of one page
    * fold to identical extracted text), while scripts, hrefs, and extra
    * whitespace are id-derived mess that [[extract]] provably removes.
    * Planted lanes: `g % 11 = 3` → tag-soup pages failing the density
    * gate; `g % 13 = 7` → near-empty pages failing the length gate;
    * `g % 5 = 0` → pages carrying an email + phone for the scrub stage.
    */
  def rowOfWeb(id: Long): HtmlDoc = {
    val g = Mix.bounded(0x5101L, id, 0, 1200).toLong
    val sb = new StringBuilder("<html><head><title>")
    sb.append(wg(g, 1)).append(' ').append(wg(g, 2)).append("</title>")
    if (id % 3 == 0) sb.append(s"<script>var t = $id; go(t);</script>")
    sb.append("</head><body>")
    if (id % 4 == 0) sb.append("  ") // folds away under whitespace collapse
    val nLinks = Mix.bounded(0x5102L, g, 1, 4)
    var i = 0
    while (i < nLinks) {
      sb.append(s"""<a href="/u/${id % 53}">${wg(g, 10 + i)}</a> """)
      i += 1
    }
    if (g % 11 == 3) {
      var d = 0
      while (d < 30) { sb.append("<div><span></span></div>"); d += 1 }
      sb.append("<p>").append(wg(g, 90)).append("</p>")
    } else if (g % 13 == 7) {
      sb.append("<p>").append(wg(g, 91)).append("</p>")
    } else {
      val nPara = 2 + Mix.bounded(0x5103L, g, 2, 3)
      var p = 0
      while (p < nPara) {
        sb.append("<p>")
        val nw = 6 + Mix.bounded(0x5104L, g, 20 + p, 7)
        var j = 0
        while (j < nw) {
          if (j > 0) sb.append(' ')
          sb.append(wg(g, 30 + 10 * p + j))
          j += 1
        }
        sb.append("</p>")
        p += 1
      }
      if (g % 5 == 0)
        sb.append(s"<p>contact user$g@ex${g % 7}mail.com or call " +
          f"555-${g % 900 + 100}%03d-${g % 9000 + 1000}%04d</p>")
    }
    sb.append("</body></html>")
    HtmlDoc(id, sb.toString)
  }

  def genWebPages(spark: SparkSession, rows: Long, parts: Int): Dataset[HtmlDoc] = {
    import spark.implicits._
    spark.range(0, rows, 1, parts).as[Long].map(rowOfWeb)
  }

  /** The composed web-curation pipeline — extract → density/length gates →
    * PII scrub → exact dedup (first id wins) — each stage the already-
    * oracled operator, chained the way a crawl ingest actually runs them.
    * Returns the survivors: `(doc_id, n_pii, clean_len, clean_hash)`.
    *
    * Scale shape: extract + gates + scrub are one fully narrow pass; the
    * only shuffles are the dedup hash aggregate and its id-keyed winner
    * join. Gates run BEFORE scrub so dropped pages never pay the regex
    * chain.
    */
  def webPipeline(pages: DataFrame,
                  minTextPpm: Int = 100000, minLen: Int = 40): DataFrame = {
    val gated = extract(pages, col("html"), col("doc_id"))
      .filter(col("text_ppm") >= minTextPpm && col("text_len") >= minLen)
    val scrubbed = Pii.scrub(gated, col("text"), col("doc_id"))
      .withColumn("ph", Hashing.h15(col("scrubbed")))
    val winners = scrubbed.groupBy(col("ph"))
      .agg(min(col("doc_id")).as("keep_id"))
      .select(col("ph").as("wph"), col("keep_id"))
    scrubbed.join(winners,
        col("ph") === col("wph") && col("doc_id") === col("keep_id"))
      .select(col("doc_id"),
        (col("n_email") + col("n_ip") + col("n_ssn") + col("n_phone"))
          .cast("long").as("n_pii"),
        length(col("scrubbed")).cast("long").as("clean_len"),
        col("ph").as("clean_hash"))
  }
}
