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
}
