package graft.text

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Mix

/** PII detection + redaction over a document corpus — the scrubbing stage
  * every published training-data pipeline runs before anything else
  * (emails/IPs/phones/SSNs; the document-level application of the VRL
  * `redact` function family, reference
  * src/transforms/remap + lib/vrl stdlib `redact`).
  *
  * Cross-engine rules: every pattern below is in the shared Java-regex ∩
  * RE2 dialect (no lookaround, no backrefs, explicit `\.` runs instead of
  * counted groups), so the DuckDB twin applies the byte-identical pattern;
  * the replace chain applies in the fixed [[Categories]] order on both
  * sides. The patterns are deliberately disjoint on this shape (an SSN's
  * `ddd-dd-dddd` can't partially match the phone's `ddd-ddd-dddd` across
  * `\b` anchors), so chain order can't create engine-divergent overlaps.
  *
  * Scale shape (10^12 rows): detection and redaction are fully NARROW —
  * per-row regexes inside whole-stage codegen, no shuffle, no UDF; output
  * partitions like the input.
  */
object Pii {

  /** (name, pattern, replacement) in fixed application order. */
  val Categories: Seq[(String, String, String)] = Seq(
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"))

  /** Per-category hit counts + the scrubbed text. Counts come from the
    * ORIGINAL text; the scrub chain applies all categories in order.
    */
  def scrub(df: DataFrame, text: Column, id: Column): DataFrame = {
    val counts = Categories.map { case (name, pat, _) =>
      size(regexp_extract_all(text, lit(pat), lit(0))).cast("long").as(s"n_$name")
    }
    val scrubbed = Categories.foldLeft(text) { case (c, (_, pat, rep)) =>
      regexp_replace(c, pat, rep)
    }
    df.select((id.as("doc_id") +: counts :+ scrubbed.as("scrubbed")): _*)
  }

  final case class PiiDoc(doc_id: Long, text: String)

  private val Filler = Vector("report", "user", "login", "session", "update",
    "record", "status", "request", "page", "account", "meeting", "note")

  /** Deterministic corpus with planted PII: a pure function of the row id
    * (same content at any parallelism — the repo generator law), so the
    * Verify-materialized parquet equals what the query consumed and the
    * expected per-category counts are exactly computable.
    */
  def rowOf(id: Long): PiiDoc = {
    val sb = new StringBuilder
    val nw = 6 + Mix.bounded(0x9117L, id, 1, 7)
    var j = 0
    while (j < nw) {
      if (j > 0) sb.append(' ')
      sb.append(Filler(Mix.bounded(0x9118L, id, 10 + j, Filler.length)))
      j += 1
    }
    if (id % 3 == 0) sb.append(s" contact user$id@ex${id % 7}mail.com now")
    if (id % 4 == 0) sb.append(s" from 10.${id % 256}.${(id / 7) % 256}.${id % 250}")
    if (id % 7 == 0) sb.append(f" ssn ${id % 900 + 100}%03d-${id % 90 + 10}%02d-${id % 9000 + 1000}%04d")
    if (id % 5 == 0) sb.append(f" call 555-${id % 900 + 100}%03d-${id % 9000 + 1000}%04d")
    PiiDoc(id, sb.toString)
  }

  def genPiiDocs(spark: SparkSession, rows: Long, parts: Int): Dataset[PiiDoc] = {
    import spark.implicits._
    spark.range(0, rows, 1, parts).as[Long].map(rowOf)
  }
}
