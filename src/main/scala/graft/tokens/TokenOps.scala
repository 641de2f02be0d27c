package graft.tokens

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.text.Hashing

/** Operators over the pre-tokenized sequence table (BASELINE.json
  * input_hint: `(doc_id, tokens array<int32>, n_tok, source)`) — the
  * token-level stages of a training-data pipeline.
  */
object TokenOps {

  final case class PackedSeq(doc_id: String, n_tok: Int, source: String,
                             shard: Int, bin: Long)

  /** Greedy sequence packing: assign sequences to fixed token-budget bins
    * (the classic LLM pre-training batching op — concatenate sequences up
    * to `budget` tokens per training example). Greedy first-fit in
    * (source, shard, doc_id) order: a bin closes when the next sequence
    * would overflow it; an oversized sequence gets a bin of its own.
    *
    * Scale shape: repartition by the pack key + `sortWithinPartitions`
    * gives each partition contiguous, ordered key runs, and the assignment
    * is a single streaming pass with O(1) state — no per-group
    * materialization, no window over the full key. Assignment per key-run
    * is inherently sequential (the reference semantics), so keys ARE the
    * parallelism unit — which is why the pack key is PARAMETERIZED by
    * `shards`: with `shards = 1` the key is `source` alone and a hot
    * source (the generator's `web` skew case) serializes through one
    * task; with `shards = S` the key is `(source, shard)` where
    * `shard = h15(doc_id) mod S`, so a hot source packs on S tasks in
    * parallel. The shard hash is the cross-engine [[Hashing.h15]] so a
    * SQL oracle reproduces bin assignment exactly.
    *
    * Deterministic at any parallelism: output depends only on the
    * (source, shard, doc_id) order, never on partition boundaries. Bin
    * ids are per-(source, shard); per-source totals (sequences, tokens)
    * are invariant to the shard count, and bin fill degrades only by the
    * at-most-one partially-filled tail bin each shard adds.
    */
  def packSequences(df: DataFrame, budget: Int, shards: Int = 1): Dataset[PackedSeq] = {
    require(shards >= 1, "shards must be >= 1")
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("string"), col("n_tok").cast("int"),
      col("source").cast("string"),
      (if (shards == 1) lit(0)
       else pmod(Hashing.h15(col("doc_id")), lit(shards.toLong)).cast("int")).as("shard"))
      .as[(String, Int, String, Int)]
      .repartition(col("source"), col("shard"))
      .sortWithinPartitions(col("source"), col("shard"), col("doc_id"))
      .mapPartitions { it =>
        var key: (String, Int) = null
        var cum = 0L
        var bin = 0L
        it.map { case (d, n, s, sh) =>
          val k = (s, sh)
          if (k != key) { key = k; cum = 0L; bin = 0L }
          if (cum + n > budget && cum > 0) { bin += 1; cum = 0L }
          cum += n
          PackedSeq(d, n, s, sh, bin)
        }
      }
  }

  /** Default training-mixture rates (parts-per-million kept) — the usual
    * rebalance away from the crawl-heavy raw distribution (the generator's
    * `web` source holds ~50% of rows; a training mix downsamples it and
    * upsamples the curated sources). Stable `Seq` so the Spark when-chain
    * and the DuckDB CASE are generated in the same order.
    */
  val DefaultMixPpm: Seq[(String, Int)] = Seq(
    "web" -> 120000, "books" -> 600000, "code" -> 1000000,
    "wiki" -> 800000, "chat" -> 250000, "forum" -> 500000)

  /** ppm rate column for a row's source; unknown sources (the generator's
    * `ghost` lane) default to 0 — excluded from the mix.
    */
  private def mixRate(ratesPpm: Seq[(String, Int)]): Column = {
    require(ratesPpm.forall { case (_, r) => r >= 0 && r <= 1000000 },
      "mix rates are ppm in [0, 1000000]")
    ratesPpm.foldLeft(lit(0)) { case (acc, (src, ppm)) =>
      when(col("source") === src, lit(ppm)).otherwise(acc)
    }
  }

  /** Deterministic source-mixing sampler: keep a row iff
    * `h15(doc_id) mod 1e6 < ppm(source)` — the data-mixing stage of a
    * training pipeline (rebalance sources to a target mixture). Hash-keyed
    * (never `rand()`): the sample is a pure function of doc_id, so reruns,
    * retries, and different parallelism levels select the SAME rows, and a
    * SQL oracle reproduces the selection exactly. Narrow (no shuffle);
    * composes with [[packSequences]] downstream.
    */
  def mixSample(df: DataFrame, ratesPpm: Seq[(String, Int)] = DefaultMixPpm): DataFrame =
    df.filter(pmod(Hashing.h15(col("doc_id")), lit(1000000L)) < mixRate(ratesPpm))

  /** Mixture audit: per-source totals vs kept docs/tokens under
    * [[mixSample]]'s selection — the counter surface a mixing stage emits.
    */
  def mixStats(df: DataFrame, ratesPpm: Seq[(String, Int)] = DefaultMixPpm): DataFrame =
    df.withColumn("keep",
        pmod(Hashing.h15(col("doc_id")), lit(1000000L)) < mixRate(ratesPpm))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_tok").cast("long")).otherwise(0L)).as("kept_tokens"))

  /** Packing efficiency summary rolled up per source: bins across all
    * shards, mean fill fraction. Bin identity is (source, shard, bin).
    */
  def packingStats(packed: DataFrame, budget: Int): DataFrame =
    packed.groupBy(col("source"), col("shard"), col("bin"))
      .agg(sum(col("n_tok")).as("bin_tokens"), count(lit(1)).as("n_seqs"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("n_seqs")).as("n_seqs"),
        sum(col("bin_tokens")).as("total_tokens"),
        round(avg(least(col("bin_tokens"), lit(budget)) / lit(budget.toDouble)), 4)
          .as("mean_fill"))
}
