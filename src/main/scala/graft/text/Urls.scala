package graft.text

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Mix

/** URL canonicalization + canonical-URL dedup — the crawl-pipeline stage
  * that folds the many spellings of one web resource (scheme/host case,
  * default ports, trailing slashes, tracking params, param order,
  * fragments) into a single identity BEFORE document dedup, so refetches
  * of the same page don't survive as "different" docs (the URL-level
  * analog of the VRL `parse_url` family, reference
  * website/cue/reference/remap/functions/parse_url.cue).
  *
  * Canonical form, applied in fixed order:
  *  1. scheme and host lowercased;
  *  2. default port dropped (`http:80`, `https:443`); any other port kept;
  *  3. trailing slashes stripped from the path; empty path → `/`;
  *  4. tracking params ([[TrackingPrefixes]]) and empty params dropped,
  *     the rest sorted bytewise and re-joined;
  *  5. fragment dropped;
  *  6. no scheme or no host → NULL (malformed lane, the decoder contract).
  *
  * Cross-engine rules: every regex is in the Java ∩ RE2 dialect; the
  * DuckDB twin in SparkEntry.oracleSql is GENERATED from the same
  * [[TrackingPrefixes]] constants; sorting is bytewise-ASCII in both
  * engines (params are ASCII by construction). Hosts carry at most one
  * `:` (no IPv6 literals in scope), so Spark `substring_index(hp, ':',
  * -1)` and DuckDB `split_part(hp, ':', 2)` agree.
  *
  * Scale shape (10^12 rows): canonicalization is fully NARROW — regex +
  * array ops in whole-stage codegen, no UDF, no shuffle; the dup stats
  * are ONE map-side-combinable aggregate keyed by the canonical string.
  */
object Urls {

  /** Query params dropped by canonicalization (prefix match, fixed list —
    * the usual tracking families).
    */
  val TrackingPrefixes: Seq[String] = Seq("utm_", "fbclid=", "gclid=")

  /** Canonical URL column (NULL when scheme or host is missing). */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hp = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val host = lower(when(hp.contains(":"), substring_index(hp, ":", 1)).otherwise(hp))
    val port = when(hp.contains(":"), substring_index(hp, ":", -1)).otherwise(lit(""))
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val rawPath = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val stripped = regexp_replace(rawPath, "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = filter(split(q, "&"), p =>
      p =!= "" && !TrackingPrefixes.map(pre => p.startsWith(pre)).reduce(_ || _))
    val qs = array_join(array_sort(kept), "&")
    when(scheme =!= "" && host =!= "",
      concat(scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path,
        when(qs =!= "", concat(lit("?"), qs)).otherwise(lit(""))))
  }

  /** Canonical-URL dedup stats: variants folded per canonical form, with
    * the deterministic first (lowest-id) representative — the URL-level
    * exact-dedup survivor rule.
    */
  def canonDupStats(df: DataFrame): DataFrame =
    df.select(col("doc_id"), canonicalize(col("url")).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).cast("long").as("n_variants"),
        min(col("doc_id")).as("first_doc"))

  // ---- deterministic messy-URL generator ---------------------------------

  final case class UrlRow(doc_id: Long, url: String)

  /** One messy URL per row id — a pure function of the id (the repo
    * generator law), targeting ~2.7 variants per canonical group at 4000
    * rows. Group identity (`g`) fixes everything canonical (scheme family,
    * host, real port, path, param VALUES); the per-row mess (case, default
    * ports, trailing slash, param order, tracking junk, fragments) is
    * id-derived and folds away under [[canonicalize]]. Group residues are
    * CRT-injective for g < 1500, so distinct groups yield distinct
    * canonical URLs.
    */
  def rowOf(id: Long): UrlRow = {
    val g = Mix.bounded(0xA201L, id, 0, 1500).toLong
    val scheme0 = if (g % 5 == 0) "https" else "http"
    val scheme = Mix.bounded(0xA202L, id, 1, 3) match {
      case 0 => scheme0.toUpperCase
      case 1 => scheme0.capitalize
      case _ => scheme0
    }
    val host0 = s"www.site${g % 97}.example.com"
    val host = if (Mix.bounded(0xA203L, id, 2, 3) == 0) host0.toUpperCase else host0
    val port =
      if (g % 13 == 0) ":8080" // real port — canonical keeps it
      else if (Mix.bounded(0xA204L, id, 3, 4) == 0)
        (if (scheme0 == "https") ":443" else ":80") // default — stripped
      else ""
    val path0 = s"/p/${g % 53}/item${g % 11}"
    val path = if (Mix.bounded(0xA205L, id, 4, 3) == 0) path0 + "/" else path0
    val baseParams =
      if (g % 7 == 3) Seq.empty[String] else Seq(s"a=${g % 10}", s"b=${g % 3}")
    val ordered = if (Mix.bounded(0xA206L, id, 5, 2) == 0) baseParams else baseParams.reverse
    val params =
      (if (Mix.bounded(0xA207L, id, 6, 3) == 0) Seq(s"utm_source=feed${id % 5}") else Nil) ++
      ordered ++
      (if (Mix.bounded(0xA208L, id, 7, 5) == 0) Seq(s"fbclid=z${id % 23}") else Nil) ++
      (if (Mix.bounded(0xA209L, id, 8, 7) == 0) Seq(s"gclid=g${id % 17}") else Nil)
    val qs = if (params.isEmpty) "" else "?" + params.mkString("&")
    val frag = if (Mix.bounded(0xA20AL, id, 9, 3) == 0) s"#sec${id % 9}" else ""
    UrlRow(id, s"$scheme://$host$port$path$qs$frag")
  }

  def genUrls(spark: SparkSession, rows: Long, parts: Int): Dataset[UrlRow] = {
    import spark.implicits._
    spark.range(0, rows, 1, parts).as[Long].map(rowOf)
  }

  /** DuckDB canonicalization twin as a CTE body over a table exposing
    * (doc_id, url) — kept adjacent to [[canonicalize]] so the two dialects
    * stay in sync; the tracking filter is generated from
    * [[TrackingPrefixes]].
    */
  def duckCanonCte(fromTable: String): String = {
    val keep = TrackingPrefixes.map(p => s"NOT starts_with(p, '$p')").mkString(" AND ")
    s"""parts AS (
       |  SELECT doc_id,
       |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hp,
       |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
       |    regexp_extract(url, '\\?([^#]*)', 1) AS q
       |  FROM $fromTable),
       |comp AS (
       |  SELECT doc_id, scheme,
       |    lower(CASE WHEN contains(hp, ':') THEN split_part(hp, ':', 1) ELSE hp END) AS host,
       |    CASE WHEN contains(hp, ':') THEN split_part(hp, ':', 2) ELSE '' END AS port,
       |    CASE WHEN regexp_replace(rawpath, '/+$$', '') = '' THEN '/'
       |         ELSE regexp_replace(rawpath, '/+$$', '') END AS path,
       |    array_to_string(list_sort(list_filter(string_split(q, '&'),
       |      p -> p <> '' AND $keep)), '&') AS qs
       |  FROM parts),
       |canon AS (
       |  SELECT doc_id,
       |    CASE WHEN scheme = '' OR host = '' THEN NULL
       |         ELSE scheme || '://' || host ||
       |           (CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
       |                      AND NOT (scheme = 'https' AND port = '443')
       |                 THEN ':' || port ELSE '' END) ||
       |           path ||
       |           (CASE WHEN qs <> '' THEN '?' || qs ELSE '' END)
       |    END AS canon_url
       |  FROM comp)""".stripMargin
  }
}
