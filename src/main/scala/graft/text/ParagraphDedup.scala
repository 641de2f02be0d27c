package graft.text

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Mix

/** A paragraph-structured synthetic document (paragraphs joined by
  * [[ParagraphDedup.Sep]]). Pure function of the row id — see
  * [[ParagraphDedup.genParaDocs]].
  */
final case class ParaDoc(doc_id: Long, source: String, text: String)

/** Paragraph-level deduplication over a document corpus — the granularity
  * between whole-document exact dedup ([[graft.dedup.Dedupe.exact]]) and
  * token-run substring dedup ([[graft.tokens.Winnow]]). Web-scale curation
  * pipelines scrub repeated boilerplate PARAGRAPHS (navigation, cookie
  * banners, license footers) from documents that are otherwise unique;
  * Rae et al. (Gopher/MassiveText, arXiv:2112.11446 §A.1.2) and Wenzek et
  * al. (CCNet, arXiv:1911.00359 §3.1) both make this a first-class stage.
  *
  * Two policies, sharing the same machinery:
  *
  *  - [[dedupeFirstWins]]: a paragraph survives only at its globally FIRST
  *    occurrence (ordered by `(doc_id, idx)`). Every later copy — in other
  *    documents or later in the same one — is removed (MassiveText-style
  *    exact paragraph dedup).
  *  - [[stripCommon]]: a paragraph is removed EVERYWHERE once it occurs in
  *    at least `minDocs` distinct documents (CCNet-style boilerplate
  *    strip; the first copy dies too — frequency, not order, decides).
  *
  * Scale shape (10^12 rows): paragraph split + hash are NARROW
  * (whole-stage codegen). First-occurrence is ONE map-side-combinable
  * `min(struct(doc_id, idx))` aggregate keyed by paragraph hash — a
  * mega-duplicated paragraph (a million-site cookie banner) partially
  * aggregates to one row per map task before the shuffle, so hot keys cost
  * one reducer row, never a row explosion. The join back is hash-keyed
  * against that one-row-per-hash table and STREAMS the probe side — skew
  * on the probe side of a hash join costs no memory. Reconstruction is one
  * `doc_id`-keyed aggregate (`sort_array` over within-doc indices). No
  * window functions: `row_number() over (partition by hash)` would gather
  * every copy of a hot paragraph into one sort buffer; the agg+join form
  * is the skew-safe equivalent.
  *
  * Cross-engine determinism: paragraph identity is [[Hashing.h15]]
  * (md5-prefix, bit-identical in Spark and DuckDB) so the driver's DuckDB
  * oracle reproduces the keep/remove decisions exactly.
  *
  * Reference anchor: the reference dedupes whole EVENTS with an LRU cache
  * (src/transforms/dedupe/common.rs:32-36); sub-document granularity is
  * part of the training-data surface this library adds (builder brief).
  */
object ParagraphDedup {

  /** Paragraph separator (the conventional blank-line form). */
  val Sep = "\n\n"

  // ---------------------------------------------------------------- core

  /** `(doc_id, source, idx, para, ph)` — one row per paragraph, 0-based
    * within-doc index, 60-bit cross-engine hash. Narrow (no shuffle).
    */
  private def paragraphs(df: DataFrame, textCol: Column, sep: String): DataFrame =
    df.select(col("doc_id"), col("source"),
        posexplode(split(textCol, java.util.regex.Pattern.quote(sep))).as(Seq("idx", "para")))
      .withColumn("ph", Hashing.h15(col("para")))

  /** Reassemble per-doc output from flagged paragraphs:
    * `(doc_id, source, n_para, n_removed, clean_text)`; `clean_text` is
    * NULL when every paragraph was removed (matches SQL `string_agg` over
    * an all-NULL group). One doc-keyed shuffle.
    */
  private def reconstruct(flagged: DataFrame, sep: String): DataFrame =
    flagged.groupBy(col("doc_id"), col("source"))
      .agg(
        count(lit(1)).as("n_para"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"),
        sort_array(collect_list(when(col("keep"),
          struct(col("idx"), col("para"))))).as("ks"))
      .select(col("doc_id"), col("source"), col("n_para"), col("n_removed"),
        when(size(col("ks")) === 0, lit(null).cast("string"))
          .otherwise(array_join(transform(col("ks"), _.getField("para")), sep))
          .as("clean_text"))

  /** Global first-occurrence paragraph dedup (MassiveText-style). `idCol`
    * must be totally ordered consistently across engines (numeric, or
    * ASCII strings). Plan: narrow split/hash → ph-keyed
    * `min(struct(doc_id, idx))` agg → ph-keyed streamed join → doc-keyed
    * reconstruct. Three shuffles total, all partial-agg or probe-streamed.
    */
  def dedupeFirstWins(df: DataFrame, textCol: Column = col("text"),
                      sep: String = Sep): DataFrame = {
    val p = paragraphs(df, textCol, sep)
    val first = p.groupBy(col("ph"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("first"))
    val flagged = p.join(first, "ph")
      .withColumn("keep",
        col("doc_id") === col("first.doc_id") && col("idx") === col("first.idx"))
    reconstruct(flagged, sep)
  }

  /** Frequency-threshold boilerplate strip (CCNet-style): remove every
    * occurrence of any paragraph present in ≥ `minDocs` distinct
    * documents. Plan: ph-keyed distinct-doc count (two-phase partial
    * distinct — map-side dedup of (ph, doc_id) before the count) →
    * ph-keyed streamed join → doc-keyed reconstruct.
    */
  def stripCommon(df: DataFrame, minDocs: Int, textCol: Column = col("text"),
                  sep: String = Sep): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val p = paragraphs(df, textCol, sep)
    val counts = p.groupBy(col("ph"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
    val flagged = p.join(counts, "ph")
      .withColumn("keep", col("ndocs") < minDocs)
    reconstruct(flagged, sep)
  }

  // ----------------------------------------------------------- generator

  private val ParaVocab = 4096

  /** One deterministic word-soup paragraph from a 64-bit seed. */
  private def paraOf(seed: Long): String = {
    val n = 6 + (Mix.mix64(seed ^ 0xAA11L).toInt & 7) // 6..13 words
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append('w').append((Mix.mix64(seed + 31L * i) >>> 1) % ParaVocab)
      i += 1
    }
    sb.toString
  }

  /** Deterministic paragraph-structured corpus: each doc carries 2..9
    * paragraphs; ~40% of slots draw from a shared pool of `boilerPool`
    * boilerplate paragraphs (cross-doc AND occasional within-doc dups),
    * the rest are unique per `(doc_id, idx)`. Pure function of the row id
    * — identical at any parallelism (the [[graft.core.Gen]] contract), so
    * the Verify-materialized parquet equals what queries compute in
    * memory.
    */
  def genParaDocs(spark: SparkSession, rows: Long, parts: Int,
                  boilerPool: Int = 24, boilerPct: Int = 40): Dataset[ParaDoc] = {
    import spark.implicits._
    spark.range(0, rows, 1, parts).as[Long].map { id =>
      val source = graft.core.Gen.sourceOf(id)
      val nPara = 2 + Mix.bounded(0xA11C0L, id, 5, 8)
      val paras = (0 until nPara).map { i =>
        if (Mix.bounded(0xB01EL, id, 100 + i, 100) < boilerPct)
          paraOf(0xB01E7E27L + Mix.bounded(0xB10C5L, id, 200 + i, boilerPool))
        else paraOf(Mix.mix64(id * 1031L + i) | 1L)
      }
      ParaDoc(id, source, paras.mkString(Sep))
    }
  }
}
