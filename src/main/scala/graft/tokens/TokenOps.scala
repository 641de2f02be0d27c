package graft.tokens

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Operators over the pre-tokenized sequence table (BASELINE.json
  * input_hint: `(doc_id, tokens array<int32>, n_tok, source)`) — the
  * token-level stages of a training-data pipeline.
  */
object TokenOps {

  final case class PackedSeq(doc_id: String, n_tok: Int, source: String, bin: Long)

  /** Greedy sequence packing: assign sequences to fixed token-budget bins
    * (the classic LLM pre-training batching op — concatenate sequences up
    * to `budget` tokens per training example). Greedy first-fit in
    * (key, doc_id) order: a bin closes when the next sequence would
    * overflow it; an oversized sequence gets a bin of its own.
    *
    * Scale shape: repartition by the pack key (`source`) +
    * `sortWithinPartitions` gives each partition contiguous, ordered key
    * runs, and the assignment is a single streaming pass with O(1) state —
    * no per-group materialization, no window over the full key. At 10^12
    * rows the pack key would include a shard (e.g. (source, day)) to bound
    * run lengths; assignment per key-run is inherently sequential (the
    * reference semantics), so keys ARE the parallelism unit.
    *
    * Deterministic at any parallelism: output depends only on the
    * (source, doc_id) order, never on partition boundaries.
    */
  def packSequences(df: DataFrame, budget: Int): Dataset[PackedSeq] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("string"), col("n_tok").cast("int"),
      col("source").cast("string"))
      .as[(String, Int, String)]
      .repartition(col("source"))
      .sortWithinPartitions(col("source"), col("doc_id"))
      .mapPartitions { it =>
        var key: String = null
        var cum = 0L
        var bin = 0L
        it.map { case (d, n, s) =>
          if (s != key) { key = s; cum = 0L; bin = 0L }
          if (cum + n > budget && cum > 0) { bin += 1; cum = 0L }
          cum += n
          PackedSeq(d, n, s, bin)
        }
      }
  }

  /** Packing efficiency summary per key: bins, mean fill fraction. */
  def packingStats(packed: DataFrame, budget: Int): DataFrame =
    packed.groupBy(col("source"), col("bin"))
      .agg(sum(col("n_tok")).as("bin_tokens"), count(lit(1)).as("n_seqs"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_bins"),
        round(avg(least(col("bin_tokens"), lit(budget)) / lit(budget.toDouble)), 4)
          .as("mean_fill"))
}
