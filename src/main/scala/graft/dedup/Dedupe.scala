package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.{Hashing, TextOps}

/** Deduplication operators for training-data curation over a `documents`
  * table — the analog of the reference's `dedupe` transform
  * (src/transforms/dedupe/transform.rs:47-85) scaled from "LRU cache of
  * 5000 events" to "10^12-row corpus": exact content dedup, MinHash+LSH
  * near-dup, SimHash near-dup, and n-gram Jaccard verification.
  *
  * Scale design (the part that matters at 100 TB):
  *  - Signatures (md5 / minhash / simhash) are narrow per-row maps — no
  *    shuffle, codegen'd, linear scan.
  *  - Candidate generation is a self-join on band buckets: shuffle keyed by
  *    `(band, signature)`, so only same-bucket rows ever meet. Never an
  *    all-pairs cross join.
  *  - Verification (true Jaccard / hamming) runs only on the candidate
  *    pairs — re-joined to the signature table by id, not carried through
  *    the bucket shuffle.
  *  - Oversized buckets (degenerate content, e.g. empty docs) are capped by
  *    `maxBucket` to bound the quadratic blowup of a single hot bucket —
  *    same role as AQE skew-join splitting, but semantic: a bucket with
  *    thousands of members is a duplicate *cluster*, and pairing it fully
  *    is wasted work once a representative is chosen.
  */
object Dedupe {

  /** Exact dedup: canonical content hash, keep the smallest-id row per
    * hash (deterministic representative). ONE hash aggregate — `min_by`
    * carries the whole surviving row, so the upstream subtree is scanned
    * once and the aggregate partial-combines map-side (each map task keeps
    * one candidate row per distinct hash). The earlier agg + left-semi-join
    * formulation consumed the input twice — on an expensive upstream
    * (a curation gate chain) that doubles every scan below it.
    */
  def exact(df: DataFrame, text: Column, id: Column): DataFrame = {
    // Dedup key is the FULL 128-bit md5: at 10^12 rows, 60-bit collisions
    // are expected (birthday bound ~ 2^30 pairs per 2^60 space) and would
    // silently merge distinct documents. The 60-bit h15 is only the
    // *emitted* text_hash column (cross-engine BIGINT), derived from the
    // same md5 so it is computed once.
    val hashed = df.withColumn("_md5", md5(text.cast("string")))
      .withColumn("text_hash", conv(substring(col("_md5"), 1, 15), 16, 10).cast("long"))
      .withColumn("_id", id)
    val keep = hashed.columns.filter(c => c != "_md5" && c != "_id")
    hashed.groupBy(col("_md5"))
      .agg(min_by(struct(keep.map(col): _*), col("_id")).as("_row"))
      .select(keep.map(c => col(s"_row.`$c`").as(c)): _*)
  }

  /** Distinct word n-gram shingles of a text column (narrow map).
    * Guarded: Spark `sequence(1, x)` *descends* for x < 1, so short docs
    * explicitly yield an empty shingle set.
    */
  def shingles(text: Column, n: Int): Column = {
    // native single-pass expression (codegen'd byte-slice windows) — the
    // HOF formulation array_distinct(transform(sequence(...), slice+concat))
    // interprets its lambdas per element and was the hottest atom of the
    // minhash/curation plans; semantics identical (WordShinglesSpec pins
    // the equivalence, the DuckDB oracles re-derive shingles in SQL)
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.WordShingles(Bridge.expression(text), n))
  }

  /** MinHash signature: k permutation-minima over the 31-bit shingle
    * hashes. Pure column program — k folds over the shingle array.
    * NOTE: prefer [[minhashSigTable]] on big data — as a single column
    * expression Catalyst inlines the shingle-hash subtree into every
    * permutation, recomputing md5 k× per shingle.
    */
  def minhashSignature(shingleCol: Column, k: Int): Seq[Column] = {
    val hs = transform(shingleCol, s => Hashing.h31(s))
    (0 until k).map(i => array_min(transform(hs, h => Hashing.perm(i, h))))
  }

  /** Scalable MinHash signature table `(id, s0..s{k-1})`: explode shingles,
    * hash each ONCE, then k `min` aggregates — partial map-side combine, one
    * shuffle on id, no repeated md5 work. This is the 100 TB shape.
    * `explode_outer` keeps shingle-less docs (their signature is all-null,
    * matching `array_min([]) = null` of the columnar variant).
    */
  def minhashSigTable(df: DataFrame, text: Column, id: Column,
                      n: Int, k: Int): DataFrame =
    df.select(id.as("id"), explode_outer(shingles(text, n)).as("s"))
      .select(col("id"), Hashing.h31(col("s")).as("h"))
      .groupBy(col("id"))
      .agg(min(Hashing.perm(0, col("h"))).as("s0"),
        (1 until k).map(i => min(Hashing.perm(i, col("h"))).as(s"s$i")): _*)

  /** Band hash: combine `r` consecutive signature minima into one bucket
    * key per band (sum mod p — engine-portable, adequate mixing since the
    * minima are already uniform).
    */
  def bandHashes(sig: Seq[Column], bands: Int): Seq[Column] = {
    require(sig.length % bands == 0)
    val r = sig.length / bands
    (0 until bands).map { b =>
      val slice = sig.slice(b * r, (b + 1) * r)
      pmod(slice.zipWithIndex.map { case (c, i) => c * lit(31L * (i + 1)) }
        .reduce(_ + _), lit(Hashing.MinHashP))
    }
  }

  /** Per-doc MinHash band table: `(id, band, band_hash)` — the LSH index.
    * At cluster scale this is the thing you'd persist bucketed by
    * `(band, band_hash)` so incremental dedup joins are shuffle-free.
    */
  def minhashBands(df: DataFrame, text: Column, id: Column,
                   n: Int = 3, k: Int = 16, bands: Int = 4): DataFrame = {
    val sigTable = minhashSigTable(df, text, id, n, k)
    val bh = bandHashes((0 until k).map(i => col(s"s$i")), bands)
    val bandStructs = bh.zipWithIndex.map { case (c, b) =>
      struct(lit(b).as("band"), c.as("band_hash"))
    }
    sigTable.select(col("id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))
  }

  /** LSH candidate pairs: ids sharing at least one band bucket. The
    * self-join shuffles only on `(band, band_hash)`; `maxBucket` caps
    * degenerate buckets (see scale notes above).
    *
    * The cap is an aggregated hot-bucket table (distinct over-limit
    * buckets — tiny, map-side combined) BROADCAST anti-joined back, not a
    * `count().over(partitionBy(band, band_hash))` window: the window form
    * costs one extra full shuffle of the band table just to measure bucket
    * sizes, the broadcast form costs a partial-aggregate read and a narrow
    * anti-join.
    */
  def minhashCandidates(bandsDf: DataFrame, maxBucket: Int = 1000): DataFrame = {
    val hot = bandsDf.groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") > maxBucket)
      .select(col("band"), col("band_hash"))
    val counted = bandsDf.join(broadcast(hot), Seq("band", "band_hash"), "left_anti")
    val l = counted.select(col("band"), col("band_hash"), col("id").as("id_l"))
    val r = counted.select(col("band"), col("band_hash"), col("id").as("id_r"))
    l.join(r, Seq("band", "band_hash")).filter(col("id_l") < col("id_r"))
      .select(col("id_l"), col("id_r")).distinct()
  }

  /** Verify candidate pairs with true n-gram Jaccard ≥ threshold.
    * Shingle sets are fetched by id (two hash joins) — candidates are a
    * tiny fraction of the corpus, so this is cheap; never carried through
    * the LSH shuffle.
    */
  def jaccardVerify(candidates: DataFrame, docs: DataFrame, text: Column,
                    id: Column, n: Int, threshold: Double): DataFrame = {
    val sh = docs.select(id.as("id"), shingles(text, n).as("sh"))
    val j = candidates
      .join(sh.select(col("id").as("id_l"), col("sh").as("sh_l")), "id_l")
      .join(sh.select(col("id").as("id_r"), col("sh").as("sh_r")), "id_r")
      .withColumn("jaccard",
        round(size(array_intersect(col("sh_l"), col("sh_r"))).cast("double") /
          size(array_union(col("sh_l"), col("sh_r"))).cast("double"), 6))
    j.filter(col("jaccard") >= threshold).select(col("id_l"), col("id_r"), col("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: signature → band join → verify. */
  def minhashNearDups(df: DataFrame, text: Column, id: Column,
                      n: Int = 3, k: Int = 16, bands: Int = 4,
                      threshold: Double = 0.5): DataFrame =
    jaccardVerify(minhashCandidates(minhashBands(df, text, id, n, k, bands)),
      df, text, id, n, threshold)

  /** Benchmark-contamination check: per document, the number of its word
    * n-gram shingles that also occur in a benchmark corpus (the
    * decontamination step of a serious training-data pipeline). The
    * benchmark's distinct shingles aggregate once and BROADCAST; the corpus
    * side explodes and left-joins — no literal arrays, no driver round
    * trip, and the 100 TB side never shuffles on anything but its own
    * explode.
    */
  def contamination(df: DataFrame, text: Column, id: Column,
                    bench: DataFrame, benchText: Column, n: Int = 3): DataFrame = {
    val bsh = bench.select(explode(shingles(benchText, n)).as("sh")).distinct()
      .withColumn("_hit", lit(1L))
    df.select(id.as("doc_id"), explode_outer(shingles(text, n)).as("sh"))
      .join(broadcast(bsh), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("_hit"), lit(0L))).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  /** Connected components over an undirected near-dup pair set — turns
    * pairwise matches into DEDUP CLUSTERS (component = min member id, the
    * deterministic representative). Distributed min-label propagation with
    * pointer jumping: each superstep every node adopts the minimum label in
    * its neighborhood, then labels compress through label-of-label joins —
    * O(log diameter) supersteps, each a pair of hash joins keyed by id.
    * No driver-side graph; the per-superstep convergence check is a single
    * aggregate (the KMeans-style sanctioned driver round trip). Each
    * superstep's result is EAGERLY checkpointed — persist alone leaves the
    * logical plan growing, and Catalyst re-optimization cost explodes
    * exponentially across iterations (measured: 2s → 90s by superstep 4
    * without truncation). Ids must be numeric (labels compare with `<` and
    * sum for the fixpoint check).
    *
    * Checkpoint mode: with `checkpointDir` set, supersteps use RELIABLE
    * `checkpoint()` into that directory — executor loss mid-iteration
    * recomputes from the checkpoint, the mode a real multi-node cluster
    * needs. Unset (single-JVM tests/benches) they use `localCheckpoint`,
    * which truncates lineage without the write-to-storage cost but stores
    * blocks executor-local.
    *
    * Throws `IllegalStateException` if the fixpoint is not reached within
    * `maxIter` supersteps — returning non-converged labels would silently
    * under-merge clusters downstream (dedupeByPairs would keep extra
    * duplicates with no signal).
    */
  def components(pairs: DataFrame, maxIter: Int = 25,
                 checkpointDir: Option[String] = None,
                 checkEvery: Int = 1): DataFrame = {
    val spark = pairs.sparkSession
    val ckpt: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        // setCheckpointDir is SESSION-GLOBAL — only touch it when unset or
        // actually different, so a caller's pre-configured dir survives.
        // SparkContext stores the dir scheme-qualified WITH a random UUID
        // subdirectory appended, so exact equality never matches — test
        // that the stored path contains the requested one instead.
        val cur = spark.sparkContext.getCheckpointDir
        if (!cur.exists(_.contains(dir))) spark.sparkContext.setCheckpointDir(dir)
        df => df.checkpoint(eager = true)
      case None => df => df.localCheckpoint(true)
    }
    // materialize the skinny pair projection ONCE before the 2-way union
    // below — unioning two references to the raw candidate chain would
    // execute its band join twice (exchange reuse covers shuffles, not
    // the join operators above them; measured 2-3x slowdown). Callers may
    // stream RAW multi-band candidate pairs — see
    // [[simhashNearDupCandidates]] — multiplicity is erased by the
    // map-side combine of the seed aggregate and the hub-graph distinct
    // below; no full-size pair-distinct shuffle ever runs.
    val ends = ckpt(pairs.select(col("id_l").as("a"), col("id_r").as("b")))
    // Seed = superstep 1's neighbor-min, computed straight off the raw
    // DIRECTED pair stream: pairs arrive id_l < id_r, so only the
    // incoming (id_l) side can ever beat a node's own id — lbl(n) =
    // min(n, min{a : (a,n)}). One map-side-combinable aggregate whose
    // shuffle is ~node-count, replacing the former full-size undirected
    // edge-table distinct (2× pairs + self-loops, the widest shuffle of
    // the old plan).
    val seed = ckpt(ends.select(col("a").as("id"), col("a").as("cand"))
      .unionByName(ends.select(col("b").as("id"), col("a").as("cand")))
      .groupBy(col("id")).agg(min(col("cand")).as("lbl")))
    // CONTRACT: map both edge endpoints through the seed labels and drop
    // now-internal edges. Near-dup graphs are clique-heavy (every member
    // of a duplicate cluster pairs with most others), so one contraction
    // collapses each clique to its hub and the iterative loop below runs
    // on the tiny hub graph instead of the full pair multiset — measured
    // 6.3 s -> ~2 s on the sf0.1 1.37 M-pair graph. Correct for any
    // graph: contraction preserves connectivity.
    // Hub edges are symmetrized by an explode (2 rows per surviving
    // mapped pair, one scan of `ends`) and self-looped; the distinct runs
    // on the CONTRACTED label space — near-dup cliques have already
    // collapsed, so this shuffle is hub-graph-sized, not pair-sized.
    val la = seed.select(col("id").as("a"), col("lbl").as("la"))
    val lb = seed.select(col("id").as("b"), col("lbl").as("lb"))
    val contracted = ckpt(ends.join(la, Seq("a")).join(lb, Seq("b"))
      .filter(col("la") =!= col("lb"))
      .select(explode(array(
        struct(col("la").as("a"), col("lb").as("b")),
        struct(col("lb").as("a"), col("la").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .unionByName(seed.select(col("lbl").as("a"), col("lbl").as("b")).distinct())
      .distinct())
    // superseded checkpoints release their block-store memory NOW — every
    // consumer above is already eagerly materialized; leaving them pinned
    // until driver GC measured as multi-second eviction cliffs on
    // back-to-back clustering runs
    org.apache.spark.sql.graft.Bridge.freeLocalCheckpoint(ends)
    var labels = ckpt(contracted.groupBy(col("a").as("id")).agg(min(col("b")).as("lbl")))
    // labels only ever DECREASE, so an unchanged label sum ⇔ a fixpoint —
    // one overflow-safe decimal aggregate, no compare join
    def lblSum(df: DataFrame): java.math.BigDecimal = {
      val s = df.agg(sum(col("lbl").cast("decimal(38,0)"))).head.getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s
    }
    var prevSum = lblSum(labels)
    var converged = false
    var i = 2 // edges-seed + contraction-seed supersteps already happened
    while (!converged && i < maxIter) {
      // neighbor-min: adopt the smallest label among self + neighbors
      // (self covered by the self-loop edge)
      val nbr = contracted.join(labels.select(col("id").as("b"), col("lbl")), Seq("b"))
        .groupBy(col("a").as("id")).agg(min(col("lbl")).as("lbl"))
      // pointer jump: lbl := min(lbl, lbl(lbl)) — halves chains each superstep
      val jumped = ckpt(nbr.alias("x")
        .join(nbr.select(col("id").as("lbl"), col("lbl").as("lbl2")).alias("y"),
          Seq("lbl"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("lbl2"), col("lbl"))).as("lbl")))
      if (i > 2) org.apache.spark.sql.graft.Bridge.freeLocalCheckpoint(labels)
      labels = jumped
      i += 1
      // `checkEvery` trades driver barriers against extra supersteps:
      // skipping checks is SAFE (labels are monotone — a fixpoint stays a
      // fixpoint) but measured SLOWER here at checkEvery=2 (a missed
      // detection costs up to checkEvery extra supersteps, and one
      // superstep = 2 hash joins + a checkpoint vs one tiny label-sum
      // aggregate). Raise it only when the driver sync itself dominates
      // (very tall clusters, very small label tables).
      if (i % checkEvery == 0 || i >= maxIter) {
        val newSum = lblSum(labels)
        converged = newSum.compareTo(prevSum) == 0
        prevSum = newSum
      }
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected-components did not converge within $maxIter supersteps " +
          "(labels still changing); raise maxIter — returning partial labels " +
          "would silently under-merge dedup clusters")
    // EXPAND: a node's component is its hub's resolved label
    seed.join(labels.select(col("id").as("lbl"), col("lbl").as("_hub")),
        Seq("lbl"), "left")
      .select(col("id"), coalesce(col("_hub"), col("lbl")).as("component"))
  }

  /** Near-dup deduplication: keep one representative per cluster. Given
    * the corpus and a verified near-dup pair set, drops every document
    * whose cluster has a smaller member (the [[components]] label) — the
    * final step of candidates → verify → cluster → survivors. Anti join
    * keyed on id; the cluster table is candidate-sized, not corpus-sized.
    */
  def dedupeByPairs(df: DataFrame, id: Column, pairs: DataFrame,
                    checkpointDir: Option[String] = None): DataFrame = {
    val losers = components(pairs, checkpointDir = checkpointDir)
      .filter(col("id") =!= col("component"))
      .select(col("id").as("_loser"))
    df.join(losers, id === col("_loser"), "left_anti")
  }

  /** 32-bit SimHash over distinct word tokens: per bit, sign of the
    * sum of ±1 votes from each token hash. 32 codegen'd folds — narrow map.
    */
  def simhash32(text: Column): Column = {
    val toksD = array_distinct(TextOps.words(text))
    val hs = transform(toksD, t => Hashing.h15(t))
    (0 until 32).map { j =>
      val votes = aggregate(hs, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(votes >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Scalable SimHash table `(id, sim)`: explode distinct tokens, hash each
    * ONCE, `bits` conditional-sum aggregates (map-side combinable),
    * recombine bits. Same result at bits=32 as [[simhash32]] without the
    * k-fold md5 recompute. `bits` ≤ 60 (the h15 hash width); wider
    * signatures exist to widen the LSH bands at large corpus sizes — see
    * [[simhashNearDups]].
    */
  def simhashTable(df: DataFrame, text: Column, id: Column,
                   bits: Int = 32): DataFrame = {
    require(bits >= 1 && bits <= 60, "simhash bits must be in 1..60 (h15 width)")
    val votes = (0 until bits).map { j =>
      sum(when(col("h").isNull, 0L)
        .when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"v$j")
    }
    df.select(id.as("id"), explode_outer(array_distinct(TextOps.words(text))).as("t"))
      .select(col("id"), Hashing.h15(col("t")).as("h"))
      .groupBy(col("id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until bits).map(j => when(col(s"v$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("sim"))
  }

  /** Auto-sized LSH band width from a corpus row count: buckets stay
    * ~tens of docs when `bandBits ≈ log2(corpus) − 5`; floored at 8
    * (the sandbox-validated width for ≤ ~10^4 docs) and capped at 15
    * (4 bands must fit the 60-bit h15 hash). Measured motivation: the
    * fixed 8-bit default quadratically blew up at 50 k docs (killed at
    * 15 min) while width 15 finished in seconds — see BENCH.md.
    */
  def autoBandBits(corpusRows: Long): Int = {
    val lg = 64 - java.lang.Long.numberOfLeadingZeros(math.max(corpusRows, 1L) - 1)
    math.min(15, math.max(8, lg - 5))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxDist, found via a
    * 4-band join (pigeonhole: dist ≤ 3 ⇒ ≥ 1 of 4 bands equal — exact,
    * not probabilistic, for maxDist ≤ 3).
    *
    * SCALE LEVER — `bandBits`: band-bucket count is 2^bandBits per band,
    * and candidate pairs grow with the SQUARE of the mean bucket size
    * (≈ corpus / 2^bandBits). Default `bandBits = 0` SELF-SIZES via
    * [[autoBandBits]] from one cheap `count()` of the input (at cluster
    * scale a metadata-only parquet/Iceberg count) — the measured
    * quadratic blowup of a fixed sandbox-sized width at 50 k docs is the
    * one failure mode a 100 TB caller must not be able to hit by
    * default. Pass an explicit 1..15 to pin the width (the oracled
    * driver queries do, keeping their outputs bit-stable); at 10^12 docs
    * even 15 bits saturates — partition the corpus (by source/shard)
    * before simhash banding, documented in BENCH.md.
    */
  def simhashNearDups(df: DataFrame, text: Column, id: Column,
                      maxDist: Int = 3, bandBits: Int = 0): DataFrame =
    // the distinct is needed for a PAIR LIST (a pair can collide in >1
    // band) and runs after the hamming filter, so it shuffles only
    // surviving skinny pairs
    simhashNearDupCandidates(df, text, id, maxDist, bandBits).distinct()

  /** RAW near-dup candidate stream: [[simhashNearDups]] WITHOUT the final
    * pair-distinct shuffle — a pair colliding in k bands appears k times.
    * Feed this to [[components]]/[[dedupeByPairs]]: connectivity is
    * multiplicity-blind and components dedupes edges once internally, so
    * the extra full shuffle of the pair table disappears from the
    * clustering chain.
    */
  def simhashNearDupCandidates(df: DataFrame, text: Column, id: Column,
                               maxDist: Int = 3, bandBits: Int = 0): DataFrame = {
    require(maxDist <= 3, "4-band pigeonhole covers dist<=3")
    require(bandBits >= 0 && bandBits <= 15, "4 bands need 4*bandBits <= 60")
    val bb = if (bandBits > 0) bandBits else autoBandBits(df.count())
    val bits = 4 * bb
    val mask = (1L << bb) - 1
    val sigs = simhashTable(df, text, id, bits)
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"), shiftright(col("sim"), bb * b).bitwiseAND(lit(mask)).as("band_hash"))
    }
    val bandsDf = sigs.select(col("id"), col("sim"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("sim"), col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))
    val l = bandsDf.select(col("band"), col("band_hash"), col("id").as("id_l"), col("sim").as("sim_l"))
    val r = bandsDf.select(col("band"), col("band_hash"), col("id").as("id_r"), col("sim").as("sim_r"))
    l.join(r, Seq("band", "band_hash")).filter(col("id_l") < col("id_r"))
      .select(col("id_l"), col("id_r"),
        bit_count(col("sim_l").bitwiseXOR(col("sim_r"))).cast("long").as("hamming"))
      // hamming-filter BEFORE any downstream shuffle
      .filter(col("hamming") <= maxDist)
  }
}
