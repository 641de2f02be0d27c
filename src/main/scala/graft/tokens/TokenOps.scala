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

  /** Largest-remainder budget allocation — split an exact global sample
    * budget across sources in proportion to a weight (here: row share),
    * with the leftover units going to the largest fractional remainders
    * (Hamilton's method). The step before any mix/sample stage that must
    * hit an EXACT token or row budget: per-source budgets sum to
    * precisely `budget`, no float drift.
    *
    * Pure integer arithmetic — `base = budget·w div Σw`, remainder ranks
    * break ties by source name — so the allocation is bit-identical across
    * engines and runs. One combinable count + windows over the
    * sources-sized table (metadata-sized at any corpus scale).
    */
  def allocateBudget(df: DataFrame, source: Column, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = df.groupBy(source.as("source")).agg(count(lit(1)).as("w"))
    val wAll = Window.partitionBy()
    val wRem = Window.orderBy(col("rem").desc, col("source"))
    w.withColumn("tot", sum(col("w")).over(wAll))
      .withColumn("base", expr(s"w * ${budget}L div tot"))
      .withColumn("rem", expr(s"(w * ${budget}L) % tot"))
      .withColumn("spare", lit(budget) - sum(col("base")).over(wAll))
      .withColumn("rk", row_number().over(wRem).cast("long"))
      .select(col("source"), col("w"),
        (col("base") + when(col("rk") <= col("spare"), 1L).otherwise(0L))
          .as("budget"))
  }

  /** Deterministic train/val/test assignment: split is a pure function of
    * `h15("split|" + doc_id)` — replay-stable, partitioning-invariant, and
    * INDEPENDENT of [[mixSample]]'s selection hash (distinct salt
    * namespace, so sampling then splitting doesn't correlate). Holdout
    * membership survives corpus regeneration, appends, and re-sharding —
    * the property row-number splits lose the moment the corpus changes.
    * Narrow (no shuffle); ppm thresholds like [[mixSample]].
    */
  def assignSplit(df: DataFrame, valPpm: Int = 10000, testPpm: Int = 10000): DataFrame = {
    require(valPpm >= 0 && testPpm >= 0 && valPpm + testPpm <= 1000000,
      "val/test ppm must be non-negative and sum to <= 1e6")
    val bucket = pmod(Hashing.h15(concat(lit("split|"), col("doc_id"))), lit(1000000L))
    df.withColumn("split",
      when(bucket < testPpm, "test")
        .when(bucket < testPpm + valPpm, "val")
        .otherwise("train"))
  }

  /** Deterministic exact-n stratified sample: per group (e.g. source),
    * keep exactly `min(perGroup, |group|)` rows — the ones with the
    * smallest salted hash — for fixed-size per-stratum eval/debug sets.
    * Unlike [[mixSample]]'s rate-based keep, the output SIZE is exact per
    * stratum; like it, selection is a pure function of the id (hash order,
    * never `rand()`), so reruns and any parallelism pick the SAME rows.
    *
    * Scale shape (10^12 rows): `row_number ≤ n` over
    * `(h15("strat|"+id), id)` — Spark inserts a map-side WindowGroupLimit,
    * so each task forwards at most n rows per group to the single
    * group-keyed shuffle; a hot group costs n·tasks rows in flight, never
    * its full population (plan-pinned in PlanSpec). The salt namespace is
    * distinct from [[mixSample]]/[[assignSplit]], so composing the three
    * stages doesn't correlate their selections.
    */
  def stratifiedSample(df: DataFrame, group: Column, id: Column,
                       perGroup: Int): DataFrame = {
    require(perGroup > 0, "perGroup must be positive")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(Hashing.h15(concat(lit("strat|"), id)), id)
    df.withColumn("sample_rank", row_number().over(win).cast("long"))
      .filter(col("sample_rank") <= perGroup)
  }

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

  /** Context-window chunking: split each token sequence into fixed-size
    * training windows of `maxLen` tokens with `overlap` tokens carried
    * between consecutive chunks (the standard LLM pre-processing step that
    * turns variable-length documents into model-context-sized examples
    * without losing cross-boundary n-grams).
    *
    * Chunk `c` (0-based) covers positions `[c*stride, c*stride + maxLen)`
    * with `stride = maxLen - overlap`; the last chunk is the first one
    * whose window reaches `n_tok` (it may be shorter than `maxLen`, never
    * empty). A sequence with `n_tok <= maxLen` yields exactly one chunk.
    *
    * Scale shape: fully NARROW — chunk starts and slices are per-row array
    * computations inside whole-stage codegen followed by one explode; no
    * shuffle, no window function. Output size is `~ n_tok/stride` rows per
    * doc, a data-proportional expansion that partitions like the input.
    */
  def chunkSequences(df: DataFrame, maxLen: Int, overlap: Int = 0): DataFrame = {
    require(maxLen > 0 && overlap >= 0 && overlap < maxLen,
      "need 0 <= overlap < maxLen")
    val stride = maxLen - overlap
    // number of chunks - 1 = ceil((n_tok - maxLen)/stride) when n_tok > maxLen
    val lastIdx = when(col("n_tok") <= maxLen, lit(0L))
      .otherwise(((col("n_tok") - maxLen + (stride - 1)) / stride).cast("long"))
    df.withColumn("chunk_idx", explode(sequence(lit(0L), lastIdx)))
      .select(col("doc_id"), col("source"), col("chunk_idx"),
        slice(col("tokens"), (col("chunk_idx") * stride + 1).cast("int"), lit(maxLen))
          .as("chunk_tokens"))
      .withColumn("chunk_len", size(col("chunk_tokens")).cast("long"))
  }

  /** Token-level benchmark decontamination: flag corpus documents whose
    * token stream shares any `n`-gram with a benchmark/eval set (the
    * membership test run before training so eval examples are not
    * memorized; 13 is the n-gram size popularized by GPT-3's and PaLM's
    * decontamination appendices). Operates directly on the pre-tokenized
    * arrays — no detokenize/re-shingle round trip.
    *
    * Scale shape (the [[graft.dedup.Dedupe.contamination]] plan, re-done
    * at token granularity): the BENCH side — small by definition — is
    * aggregated once to its distinct gram-hash set and broadcast; the
    * corpus side computes per-position gram hashes NARROW (same
    * [[Winnow.gramHashes]] codegen'd form the winnowing dedup uses),
    * explodes only distinct grams per doc, and joins against the broadcast
    * set. The only shuffle is the corpus side's own doc-keyed count
    * aggregate, map-side combinable. The corpus is scanned once and never
    * sits on the build side of anything.
    *
    * Returns the contaminated lane only: `(doc_id, source, n_grams,
    * hit_grams)` with `hit_grams >= 1` — `n_grams` is the doc's distinct
    * gram count, so callers can threshold on the overlap fraction.
    * Cross-engine exact: gram identity is [[Hashing.h15]] of the
    * comma-joined token run, reproducible in SQL.
    */
  def tokenContamination(corpus: DataFrame, bench: DataFrame, n: Int = 13): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    // distinct n-gram hashes via the native winnow expression at w=1: the
    // window-min of each 1-window IS the gram hash, so this reuses the
    // one-pass digest kernel (measured 6x over the interpreted HOF chain)
    import org.apache.spark.sql.graft.Bridge
    def distinctGrams(tokens: Column): Column =
      Bridge.column(graft.functions.WinnowFingerprints(
        Bridge.expression(tokens), n, 1))
    val benchGrams = bench.filter(col("n_tok") >= n)
      .select(explode(distinctGrams(col("tokens"))).as("g"))
      .distinct()
    corpus.filter(col("n_tok") >= n)
      .withColumn("_gs", distinctGrams(col("tokens")))
      .select(col("doc_id"), col("source"),
        size(col("_gs")).cast("long").as("n_grams"), explode(col("_gs")).as("g"))
      .join(broadcast(benchGrams), "g")
      .groupBy(col("doc_id"), col("source"), col("n_grams"))
      .agg(count(lit(1)).as("hit_grams"))
  }

  /** 60-bit content hash of a token array (h15 of the comma-joined ids) —
    * the doc identity used by the incremental-dedup ops; reproducible in
    * DuckDB so oracles compare content, not array encodings. Native
    * [[graft.functions.TokenContentHash]]: the HOF column form would drop
    * the whole projection out of codegen (PlanSpec pins this stays in).
    */
  def contentHash(tokens: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.TokenContentHash(Bridge.expression(tokens)))
  }

  /** Bloom pre-filter for incremental ingest: flag each NEW-batch row
    * `maybe_seen` iff all `k` deterministic bit positions of its token
    * content hash are set in a Bloom filter built over the existing
    * corpus's content hashes. Bloom filters have NO false negatives, so
    * `maybe_seen = false` PROVES the row is new; `maybe_seen = true` is a
    * small maybe-lane (true dups + bounded false positives) that a
    * downstream exact check resolves.
    *
    * Scale shape: the corpus side collapses to at most `k × m`-bit
    * DISTINCT positions via a map-side-combinable aggregate and
    * broadcasts; the batch side is narrow probes — the 10^12-row corpus is
    * scanned once and NEVER shuffled or joined at full width. Bit
    * positions are md5-derived ([[Hashing.h15]] of `"j|" + hash`), the
    * same deterministic scheme as
    * [[graft.ops.Transforms.tagCardinalityLimitBloom]], so every
    * accept/reject decision is replay-stable and SQL-reproducible.
    */
  private def bloomPos(j: Int, h: Column, mBits: Long): Column =
    pmod(Hashing.h15(concat(lit(s"$j|"), h.cast("string"))), lit(mBits))

  /** The set-bit table of a Bloom filter over the corpus's token content
    * hashes: `(j|hash)`-derived md5 positions in an `mBits`-wide table, one
    * row per DISTINCT set bit (≤ mBits rows total regardless of corpus
    * size). ONE corpus scan — the k positions per row explode narrowly and
    * the distinct is map-side combinable, collapsing to ≤ mBits rows per
    * partition before the only shuffle. Build this ONCE per corpus
    * commit/snapshot and persist it; every incremental batch then probes
    * via [[bloomPrefilterWithBits]] WITHOUT touching the corpus at all —
    * that amortization, not the single-shot build, is where the 10^12-row
    * win lives.
    */
  def bloomBits(corpus: DataFrame, mBits: Long = 1L << 22, k: Int = 3): DataFrame = {
    require(mBits > 0 && k >= 1, "need mBits > 0 and k >= 1")
    corpus.select(contentHash(col("tokens")).as("h"))
      .select(explode(array((0 until k).map(j =>
        bloomPos(j, col("h"), mBits)): _*)).as("_b"))
      .distinct()
  }

  /** One-row DataFrame holding the packed Bloom sketch of the corpus's
    * content hashes ([[graft.sketch.BloomSketch]]): map-side OR-merged
    * fixed-size bitsets, ONE corpus scan, shuffle volume = `mBits/8` bytes
    * per partition regardless of corpus size. Build once per corpus
    * commit, persist the single binary value, probe every batch with
    * [[bloomPrefilterWithSketch]]. Bit-identical to [[bloomBits]] (same
    * md5 scheme — pinned by `BloomSketchSpec`).
    */
  def bloomSketch(corpus: DataFrame, mBits: Long = 1L << 22, k: Int = 3,
                  hash: Column = contentHash(col("tokens"))): DataFrame =
    corpus.agg(graft.sketch.BloomSketch.agg(hash, mBits, k).as("sketch"))

  /** Materialize the sketch bytes on the driver (`mBits/8` bytes — the
    * model-sized artifact a corpus commit persists alongside its snapshot).
    */
  def bloomSketchValue(corpus: DataFrame, mBits: Long = 1L << 22, k: Int = 3,
                       hash: Column = contentHash(col("tokens"))): Array[Byte] =
    bloomSketch(corpus, mBits, k, hash).head().getAs[Array[Byte]]("sketch")

  /** Probe side of [[bloomSketch]]: the sketch ships as a BROADCAST
    * variable (fetched once per executor JVM) and each batch row pays a
    * narrow codegen'd k-bit test — no hash relations, no shuffle, and the
    * bitset never enters a row (a sketch COLUMN would be memcpy'd out of
    * every joined row).
    */
  def bloomPrefilterWithSketch(sketch: Array[Byte], batch: DataFrame,
                               k: Int = 3): DataFrame = {
    val bc = batch.sparkSession.sparkContext.broadcast(sketch)
    batch.withColumn("maybe_seen",
      graft.sketch.BloomSketch.probe(bc, contentHash(col("tokens")), k))
  }

  def bloomPrefilter(corpus: DataFrame, batch: DataFrame,
                     mBits: Long = 1L << 22, k: Int = 3): DataFrame =
    bloomPrefilterWithSketch(bloomSketchValue(corpus, mBits, k), batch, k)

  /** Probe side of [[bloomBits]]: flag batch rows whose k positions are
    * all set. Batch-only work — k broadcast joins against the bit table;
    * the corpus is not in this plan.
    */
  def bloomPrefilterWithBits(bits: DataFrame, batch: DataFrame,
                             mBits: Long = 1L << 22, k: Int = 3): DataFrame = {
    require(mBits > 0 && k >= 1, "need mBits > 0 and k >= 1")
    val probed = batch.withColumn("_h", contentHash(col("tokens")))
    val withHits = (0 until k).foldLeft(probed) { (d, j) =>
      d.join(broadcast(bits.select(col("_b").as(s"_hit$j"))),
        bloomPos(j, col("_h"), mBits) === col(s"_hit$j"), "left")
    }
    withHits.withColumn("maybe_seen",
        (0 until k).map(j => col(s"_hit$j").isNotNull).reduce(_ && _))
      .drop("_h" +: (0 until k).map(j => s"_hit$j"): _*)
  }

  /** BPE merge-candidate counting: the global top-k most frequent ADJACENT
    * token pairs across the corpus — the inner loop of byte-pair-encoding
    * vocabulary induction (Sennrich et al. 2016): each training iteration
    * counts pairs, merges the argmax, repeats. Counting is the part that
    * touches all 10^12 rows; the merge decision is k rows on the driver.
    *
    * Scale shape: pair extraction is fully NARROW (two array slices +
    * `arrays_zip` + one explode — codegen'd, no shuffle before the
    * aggregate); the count is a map-side-combinable hash aggregate keyed
    * by (a, b) — vocab² worst case but Zipf-concentrated in practice; the
    * global top-k is `TakeOrderedAndProject` (per-partition top-k, k·P
    * driver merge — never a single-partition sort of the pair table).
    * Ties break on (a, b) ascending so the cut is deterministic.
    */
  def bpePairCounts(df: DataFrame, k: Int = 64): DataFrame = {
    require(k > 0, "k must be positive")
    val m = greatest(size(col("tokens")) - 1, lit(0))
    val pairs = df
      .select(slice(col("tokens"), lit(1), m).as("hd"),
        slice(col("tokens"), lit(2), m).as("tl"))
      .select(explode(arrays_zip(col("hd"), col("tl"))).as("p"))
      .select(col("p.hd").as("a"), col("p.tl").as("b"))
    val top = pairs.groupBy("a", "b").agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("n").desc, col("a"), col("b")).limit(k)
    // rank over the k surviving rows only (constant-size window)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("a"), col("b"))).cast("long"))
  }

  /** Top-k collocations by pointwise mutual information over ADJACENT
    * token pairs — the statistical layer on top of [[bpePairCounts]]'s raw
    * counting (raw frequency surfaces `the+of`; PMI surfaces pairs that
    * co-occur far above chance — multi-word expressions, the
    * tokenizer-merge audit). `pmi = ln(p(ab)/(p(a)·p(b)))` in integer
    * MICRONATS with the repo's fixed IEEE op order (identical expression
    * shape in the DuckDB twin), `minCount` guards the rare-pair PMI bias.
    *
    * Scale shape: the pair and unigram counts are map-side-combinable hash
    * aggregates off narrow slices; both totals are scalar broadcasts; the
    * unigram side is vocab-bounded and joins a-keyed then b-keyed
    * (AQE-broadcast at real vocab sizes); top-k is
    * `TakeOrderedAndProject`, never a global sort.
    */
  def pmiTopPairs(df: DataFrame, k: Int = 40, minCount: Long = 5L): DataFrame = {
    require(k > 0 && minCount >= 1, "need k > 0 and minCount >= 1")
    val m = greatest(size(col("tokens")) - 1, lit(0))
    val pairs = df
      .select(slice(col("tokens"), lit(1), m).as("hd"),
        slice(col("tokens"), lit(2), m).as("tl"))
      .select(explode(arrays_zip(col("hd"), col("tl"))).as("p"))
      .select(col("p.hd").as("a"), col("p.tl").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val uni = df.select(explode(col("tokens")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n_t"))
    val totals = uni.agg(sum(col("n_t")).cast("double").as("tot_t"))
      .crossJoin(pairs.agg(sum(col("n_ab")).cast("double").as("tot_p")))
    val scored = pairs
      .join(uni.select(col("t").as("a"), col("n_t").as("n_a")), "a")
      .join(uni.select(col("t").as("b"), col("n_t").as("n_b")), "b")
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("n_ab"),
        round((log(col("n_ab").cast("double")) - log(col("n_a").cast("double"))
          - log(col("n_b").cast("double")) + log(col("tot_t")) + log(col("tot_t"))
          - log(col("tot_p"))) * 1e6 + lit(1e-9), 0)
          .cast("long").as("pmi_micronats"))
    val top = scored.orderBy(col("pmi_micronats").desc, col("a"), col("b")).limit(k)
    top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("pmi_micronats").desc, col("a"), col("b"))).cast("long"))
  }

  /** Apply one BPE merge to every token array: greedy left-to-right,
    * non-overlapping replacement of `(a, b)` with `newId` — the per-row
    * native [[graft.functions.BpeMerge]] expression (narrow, codegen'd,
    * O(n) per row).
    */
  def bpeMerge(tokens: Column, a: Int, b: Int, newId: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.BpeMerge(Bridge.expression(tokens), a, b, newId))
  }

  /** One full BPE training iteration: count pairs, pick the global argmax
    * (k=1 driver rows — the same model-sized collect as a centroid seed),
    * apply it everywhere. Output keeps arrays out of the result: lengths
    * before/after plus the merged content hash (SQL-reproducible).
    */
  def applyTopBpeMerge(df: DataFrame, newId: Int): DataFrame = {
    val top = bpePairCounts(df, k = 1).select("a", "b").head()
    val (a, b) = (top.getInt(0), top.getInt(1))
    val merged = bpeMerge(col("tokens"), a, b, newId)
    df.select(col("doc_id"), col("source"),
      lit(a).as("merge_a"), lit(b).as("merge_b"),
      size(col("tokens")).cast("long").as("n_before"),
      size(merged).cast("long").as("n_after"),
      contentHash(merged).as("merged_hash"))
  }

  /** Full BPE vocabulary induction (Sennrich et al., ACL 2016): `iters`
    * merge rounds, each = count adjacent pairs → global argmax → apply the
    * merge corpus-wide with the next fresh id. Returns the trained MERGE
    * TABLE — `(it, merge_a, merge_b, new_id, n_pair, total_after)` per
    * round, where `n_pair` is the winning pair's count at selection time
    * and `total_after` is the corpus token total after applying it (the
    * compression trace) — the artifact a tokenizer ships. Later rounds see
    * earlier merge ids, so learned symbols compose (the defining BPE
    * property; the spec pins it).
    *
    * Scale shape (10^12 rows): each round is ONE map-side-combinable pair
    * count + a `TakeOrderedAndProject` argmax (1 driver row — model-sized)
    * + a narrow codegen'd [[graft.functions.BpeMerge]] pass + one count
    * aggregate; nothing row-scale ever reaches the driver. Lineage grows
    * one narrow map per round, so every 8 rounds the corpus is
    * local-checkpointed (reliable `checkpoint` on a real cluster — the
    * [[graft.dedup.Dedupe.components]] contract) to keep plan depth and
    * task re-execution bounded over production merge counts (~50k rounds
    * run this same loop; the per-round cost is the two aggregates).
    */
  def trainBpe(df: DataFrame, iters: Int, baseId: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = df.sparkSession
    var cur = df.select(col("doc_id"), col("tokens"))
    val rounds = scala.collection.mutable.ArrayBuffer[(Long, Int, Int, Int, Long, Long)]()
    var exhausted = false
    for (i <- 0 until iters if !exhausted) {
      // a corpus can run out of adjacent pairs (every row merged to one
      // token) before `iters` rounds — stop and return the rounds learned,
      // never a head()-on-empty crash
      bpePairCounts(cur, k = 1).select("a", "b", "n").collect().headOption match {
        case None => exhausted = true
        case Some(top) =>
          val (a, b, n) = (top.getInt(0), top.getInt(1), top.getLong(2))
          val newId = baseId + i
          cur = cur.select(col("doc_id"), bpeMerge(col("tokens"), a, b, newId).as("tokens"))
          if ((i + 1) % 8 == 0) cur = cur.localCheckpoint(true)
          val total = cur.agg(sum(size(col("tokens"))).cast("long")).head().getLong(0)
          rounds += ((i.toLong, a, b, newId, n, total))
      }
    }
    import spark.implicits._
    rounds.toSeq.toDF("it", "merge_a", "merge_b", "new_id", "n_pair", "total_after")
  }

  /** Tokenizer INFERENCE: apply a trained merge table (the [[trainBpe]]
    * artifact, or any `(a, b, newId)` list) to every row in training
    * order — how new text is encoded with a finished BPE vocabulary.
    * Output keeps arrays out of the result: `(doc_id, source, n_before,
    * n_after, encoded_hash)`.
    *
    * Scale shape: ONE narrow pass — the merge list is a plan-time chain of
    * codegen'd [[graft.functions.BpeMerge]] expressions (model-sized, the
    * same transport class as a centroid literal), no shuffle, no join; at
    * a production merge count (~50k) the chain becomes a single loop
    * expression over a shipped merge array (the [[graft.sim.NearestCell]]
    * pattern) — the sandbox-sized chain keeps every stage individually
    * SQL-twinnable.
    */
  def applyMergeTable(df: DataFrame, merges: Seq[(Int, Int, Int)]): DataFrame = {
    require(merges.nonEmpty, "need at least one merge")
    val encoded = merges.foldLeft(col("tokens")) {
      case (acc, (a, b, nid)) => bpeMerge(acc, a, b, nid)
    }
    df.select(col("doc_id"), col("source"),
      size(col("tokens")).cast("long").as("n_before"),
      size(encoded).cast("long").as("n_after"),
      contentHash(encoded).as("encoded_hash"))
  }

  /** Vocabulary pruning / UNK remap: map every token outside the corpus
    * top-`vocabSize` vocabulary to `unkId` — the remediation step after an
    * [[graft.text.TextOps.oovRate]] audit flags a vocab budget, and the
    * standard preprocessing for fixed-vocab models. The vocabulary cut is
    * fully ordered (`count DESC, token ASC`) so the cut — and therefore
    * every remapped array — is deterministic and SQL-reproducible.
    *
    * Scale shape (10^12 rows): ONE corpus scan for the token counts
    * (map-side-combinable; vocab-bounded output), a model-sized
    * `TakeOrderedAndProject` collect (the centroid-seed class), then a
    * fully NARROW remap pass — the vocab rides into codegen as a literal
    * array. At a production vocab (~50k) the per-token membership probe
    * becomes a native hash-set expression (the [[graft.sketch.BloomSketch]]
    * / StopwordHits pattern); the sandbox-sized literal keeps the oracled
    * query exactly SQL-twinnable.
    *
    * Output keeps arrays out of the result: `(doc_id, source, n_tok,
    * n_unk, pruned_hash)` with `pruned_hash` = [[contentHash]] of the
    * remapped array.
    */
  def pruneVocab(df: DataFrame, vocabSize: Int, unkId: Int): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val vocab: Array[Int] = df.select(explode(col("tokens")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t")).limit(vocabSize)
      .select(col("t")).collect().map(_.getInt(0))
    val vlit = lit(vocab)
    df.select(col("doc_id"), col("source"),
      col("n_tok").cast("long").as("n_tok"),
      size(filter(col("tokens"), t => !array_contains(vlit, t)))
        .cast("long").as("n_unk"),
      contentHash(transform(col("tokens"), t =>
        when(array_contains(vlit, t), t).otherwise(lit(unkId))))
        .as("pruned_hash"))
  }

  /** Deterministic global training-order shuffle: assign every row an exact
    * global permutation index `order_idx ∈ [0, N)` — the order the training
    * loop will consume the corpus in. Training data must be shuffled, but
    * `rand()` breaks replay (retries/re-runs reorder) and a global
    * `row_number() OVER (ORDER BY …)` is a single-partition sort at scale.
    * Here the order key is the salted cross-engine hash
    * `(h15("shuf|" + doc_id), doc_id)` — a pure function of the id, so the
    * permutation is replay-stable, partitioning-invariant, and
    * SQL-reproducible — and the global rank is computed scalably:
    *
    *  1. bucket = `h div W` (monotone in h, so buckets are contiguous rank
    *     ranges; W sized so bucket ids span [0, B));
    *  2. per-bucket counts — ONE map-side-combinable aggregate, B rows to
    *     the driver (same model-sized collect class as centroid seeds) →
    *     exclusive prefix-sum offsets, broadcast back;
    *  3. rank = offset(bucket) + per-bucket `row_number` — the window
    *     partitions by bucket, so each task sorts ~N/B rows, never the
    *     corpus.
    *
    * `buckets <= 0` self-sizes from a cheap `count()`: B grows with the
    * corpus so expected rows-per-bucket stays ≤ `targetPerBucket` — the
    * same autoscaling contract as `Similarity.autoNlist` (a 10^12-row run
    * on a fixed sandbox-sized B would sort 10^12/B rows in one task).
    * Output indices are provably independent of B (bucket boundaries only
    * split the total order into contiguous runs) — pinned by the spec.
    */
  def shuffleOrder(df: DataFrame, buckets: Int = 0,
                   targetPerBucket: Long = 1L << 22): DataFrame = {
    val b: Int =
      if (buckets > 0) buckets
      else {
        val n = df.count()
        var p = 16L
        while (p * targetPerBucket < n && p < (1L << 20)) p *= 2
        p.toInt
      }
    val width = (1L << 60) / b + 1 // h15 < 2^60 ⇒ h div width ∈ [0, b)
    val hashed = df
      .withColumn("_sh", Hashing.h15(concat(lit("shuf|"), col("doc_id"))))
      .withColumn("_bk", expr(s"_sh DIV CAST($width AS BIGINT)"))
    val counts = hashed.groupBy(col("_bk")).agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offs = counts.map { case (bk, n) => val o = acc; acc += n; (bk, o) }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offs.toSeq.toDF("_bk", "_off")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_bk")).orderBy(col("_sh"), col("doc_id"))
    hashed.join(broadcast(offDf), "_bk")
      .withColumn("order_idx",
        col("_off") + row_number().over(win).cast("long") - 1L)
      .drop("_sh", "_bk", "_off")
  }

  /** Cross-snapshot diff: the audit every corpus commit emits — which
    * docs were ADDED, REMOVED, or CHANGED (same id, different token
    * content) between two snapshots. Content identity is
    * [[contentHash]], so a re-encode that preserves tokens is NOT a
    * change and the diff is SQL-reproducible.
    *
    * Scale shape (10^12 rows): both sides project to skinny (id, hash)
    * rows — in production the PERSISTED hash-index column of each
    * committed snapshot, so the corpus bodies are never read — and meet
    * in ONE id-keyed full-outer sort-merge join; the unchanged lane
    * (almost everything) is filtered before anything downstream sees it.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   oldHash: Column = contentHash(col("tokens")),
                   newHash: Column = contentHash(col("tokens"))): DataFrame = {
    val o = oldDf.select(col("doc_id"), oldHash.as("oh"))
    val n = newDf.select(col("doc_id"), newHash.as("nh"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("lane",
        when(col("oh").isNull, "added")
          .when(col("nh").isNull, "removed")
          .when(col("oh") =!= col("nh"), "changed")
          .otherwise("unchanged"))
      .filter(col("lane") =!= "unchanged")
      .select(col("doc_id"), col("lane"))
  }

  /** Incremental exact dedup: the NEW-batch rows whose token content does
    * not already exist in the corpus (ingest-time dedup against the
    * already-committed trillions). Exact semantics — equivalent to an
    * anti join of content hashes — but executed as [[bloomPrefilter]]
    * fast-pass + an anti join restricted to the tiny maybe-lane, so the
    * expensive corpus-vs-batch join shrinks from |batch| to
    * |dups + false positives| probe rows.
    *
    * `corpusHash` is the content-hash expression evaluated against
    * `corpus` rows: the default recomputes it from `tokens`, but a real
    * deployment passes the PERSISTED hash-index column of the committed
    * snapshot (`col("h")` over a skinny parquet projection) — then the
    * per-batch cost is one STREAMED scan of the index (broadcast semi
    * join, never shuffled) plus narrow batch work, while a plain anti
    * join re-shuffles the full index every batch (measured in BENCH.md).
    */
  def incrementalDedupe(corpus: DataFrame, batch: DataFrame,
                        mBits: Long = 1L << 22, k: Int = 3,
                        prebuiltSketch: Option[Array[Byte]] = None,
                        corpusHash: Column = contentHash(col("tokens"))): DataFrame = {
    val bc = batch.sparkSession.sparkContext.broadcast(
      prebuiltSketch.getOrElse(bloomSketchValue(corpus, mBits, k, corpusHash)))
    // hash + probe the batch ONCE and materialize (localCheckpoint — the
    // [[Winnow.dupStats]] contract): the flagged batch feeds two consumers
    // (maybe-hash build, final anti join) and re-running the md5 content
    // hash per consumer measured as the dominant per-batch cost
    val flagged = batch
      .withColumn("_bh", contentHash(col("tokens")))
      .withColumn("maybe_seen",
        graft.sketch.BloomSketch.probe(bc, col("_bh"), k))
      .localCheckpoint(true)
    // the maybe-lane hash set is tiny (true dups + bounded FPs); broadcast
    // IT and let the corpus STREAM map-side through a semi join — the
    // corpus is never shuffled. `seen` = corpus ∩ maybe-lane hashes =
    // corpus ∩ batch hashes exactly (no false negatives: every true dup is
    // flagged), so ONE anti join of the flagged batch against
    // broadcast(seen) is the exact result.
    val maybeH = flagged.filter(col("maybe_seen"))
      .select(col("_bh").as("_mh")).distinct()
    val seen = corpus
      .join(broadcast(maybeH), corpusHash === col("_mh"), "left_semi")
      .select(corpusHash.as("_ch")).distinct()
    flagged.join(broadcast(seen), col("_bh") === col("_ch"), "left_anti")
      .drop("_bh", "maybe_seen")
  }
}
