package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.dedup.Dedupe
import graft.functions.TopBigramCount

/** Fused curation gates: repetition (top-bigram count) and benchmark
  * contamination (3-gram overlap) from ONE pass over the corpus. At 100 TB
  * each extra corpus scan is the dominant cost, so both gates share one
  * scan — and since round 4 the repetition signal is computed NARROW (a
  * native per-row [[TopBigramCount]] inside whole-stage codegen), the only
  * shuffle left is the doc-keyed overlap count:
  *
  *   docs → (top_bigram_n per row, distinct 3-shingles per row)   [narrow]
  *        → explode shingles → broadcast-left-join benchmark shingles
  *        → per-doc aggregate (max constant, overlap sum)   [one map-side-
  *          combinable doc-keyed shuffle — counts, not gram strings]
  *
  * The r3 formulation exploded bigrams AND shingles into a corpus-wide
  * `(doc, kind, gram)` string shuffle; at sf0.1 that cost more than the
  * saved scan (bench regression +62%). This plan keeps the single scan and
  * deletes the wide shuffle. Results are identical to running
  * [[TextOps.repetitionStats]] and [[Dedupe.contamination]] separately
  * (spec-pinned in DataOpsSpec).
  */
object Curation {

  /** Per-document gate signals `(doc_id, top_bigram_n, n_overlap)` from a
    * single corpus pass. `top_bigram_n` = occurrence count of the most
    * frequent word bigram (0 when the doc has < 2 words); `n_overlap` =
    * number of the doc's DISTINCT word `n`-gram shingles that appear in
    * `bench`. Every input document is present (explode_outer), so missing
    * rows need no downstream coalesce — though a left join with
    * coalesce(0, 0) stays correct.
    */
  def gateSignals(docs: DataFrame, text: Column, id: Column,
                  bench: DataFrame, benchText: Column, n: Int = 3): DataFrame = {
    val bsh = bench.select(explode(Dedupe.shingles(benchText, n)).as("_bg")).distinct()
      .withColumn("_hit", lit(1L))
    // Catalyst prunes projections below Generate down to the generator's
    // required columns, so a pre-explode top_bigram_n would be recomputed
    // per EXPLODED row (~50× per doc — measured 3s of the 3.5s query at
    // sf0.1). posexplode + a pos=0 guard evaluates it exactly once per doc
    // while keeping the single scan.
    val topOnFirst = when(coalesce(col("pos"), lit(0)) === 0,
      Bridge.column(TopBigramCount(Bridge.expression(TextOps.words(col("_t"))))))
      .otherwise(0L)
    docs
      .select(id.as("doc_id"), text.as("_t"),
        posexplode_outer(Dedupe.shingles(text, n)))
      .select(col("doc_id"), topOnFirst.as("top_bigram_n"), col("col").as("g"))
      .join(broadcast(bsh), col("g") === col("_bg"), "left")
      .groupBy(col("doc_id"))
      .agg(
        max(col("top_bigram_n")).as("top_bigram_n"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_overlap"))
  }
}
