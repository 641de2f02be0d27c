package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedupe

/** Fused curation gates: repetition (top-bigram fraction) and benchmark
  * contamination (3-gram overlap) computed from ONE exploded pass over the
  * corpus, instead of one full scan per gate. At 100 TB each extra corpus
  * scan is the dominant cost, and both gates consume the same shape —
  * per-document n-grams — so they share a single explode:
  *
  *   docs → explode(tagged bigrams ++ tagged distinct 3-shingles)
  *        → count per (doc, kind, gram)                [shuffle 1]
  *        → broadcast-left-join benchmark shingles
  *        → per-doc aggregate (max bigram count, overlap count) [shuffle 2]
  *
  * Both aggregates are map-side combinable; the benchmark side is a tiny
  * broadcast (benchmarks are small by construction — its scan pushes the
  * id filter down and reads a handful of rows). Results are identical to
  * running [[TextOps.repetitionStats]] and [[Dedupe.contamination]]
  * separately (spec-pinned in DataOpsSpec).
  */
object Curation {

  /** Per-document gate signals `(doc_id, top_bigram_n, n_overlap)` from a
    * single corpus pass. `top_bigram_n` = occurrence count of the most
    * frequent word bigram (0 when the doc has < 2 words); `n_overlap` =
    * number of the doc's DISTINCT word `n`-gram shingles that appear in
    * `bench`. Documents with no bigrams and no shingles are absent — treat
    * a missing row as (0, 0) via a left join.
    */
  def gateSignals(docs: DataFrame, text: Column, id: Column,
                  bench: DataFrame, benchText: Column, n: Int = 3): DataFrame = {
    val tk = TextOps.words(text)
    // Bigram structs, guarded: sequence(1, x) DESCENDS for x < 1, so the
    // index sequence is clamped to ascend and the < 2-words case slices the
    // (garbage single-element) array down to empty — keeping both branches
    // the same struct type without an untypeable empty-array literal.
    val bgAll = transform(sequence(lit(1), greatest(size(tk) - 1, lit(1))),
      j => struct(lit(0).as("k"), concat_ws(" ", slice(tk, j, lit(2))).as("g")))
    val bgStructs = when(size(tk) >= 2, bgAll).otherwise(slice(bgAll, 1, 0))
    val triStructs = transform(Dedupe.shingles(text, n),
      t => struct(lit(1).as("k"), t.as("g")))

    val grams = docs
      .select(id.as("doc_id"), explode(concat(bgStructs, triStructs)).as("kg"))
      .select(col("doc_id"), col("kg.k").as("k"), col("kg.g").as("g"))
    val counted = grams.groupBy(col("doc_id"), col("k"), col("g"))
      .agg(count(lit(1)).as("c"))

    val bsh = bench.select(explode(Dedupe.shingles(benchText, n)).as("_bg")).distinct()
      .withColumn("_hit", lit(1L))
    counted
      .join(broadcast(bsh), col("g") === col("_bg") && col("k") === 1, "left")
      .groupBy(col("doc_id"))
      .agg(
        max(when(col("k") === 0, col("c")).otherwise(0L)).as("top_bigram_n"),
        sum(when(col("k") === 1, coalesce(col("_hit"), lit(0L))).otherwise(0L))
          .as("n_overlap"))
  }
}
