package graft.tokens

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Gen, GenConfig, Mix, TokenSeq}
import graft.text.Hashing

/** Substring-level duplicate detection over the pre-tokenized sequence
  * table via winnowing fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD '03).
  *
  * Why winnowing and not strided k-grams: duplicated token runs (web
  * boilerplate, license headers, repeated chat templates) appear at
  * ARBITRARY offsets in each document, so any fixed-stride window scheme
  * misses misaligned copies. Winnowing selects, per position window of
  * `w` consecutive k-gram hashes, the minimum hash — a content-defined
  * choice that is alignment-free and carries the guarantee that any
  * shared run of at least `w + k - 1` tokens yields at least one shared
  * fingerprint.
  *
  * Scale shape (the reason this beats stride-1 k-gram shuffling at
  * 10^12 rows): k-gram hashing and window-min selection are NARROW,
  * per-row array computations inside whole-stage codegen — only the
  * selected fingerprints (~`2/(w+1)` of positions, ×`array_distinct`)
  * ever reach the single fingerprint-keyed shuffle. A mega-shared
  * fingerprint (site-wide boilerplate) is the same hot-bucket shape as
  * MinHash band buckets; the per-fingerprint aggregate is
  * map-side-combinable so the hot key costs one reducer, not a pair
  * explosion — dup detection here is per-DOC stats, never pair
  * materialization.
  *
  * Cross-engine determinism: gram identity is [[Hashing.h15]] of the
  * comma-joined token string (md5-prefix, identical in Spark and DuckDB),
  * so the DuckDB oracle reproduces fingerprints bit-exactly; the 60-bit
  * space makes accidental collisions negligible (and the oracle computes
  * the same function either way).
  *
  * Reference anchor: the reference's dedupe transform is event-level
  * (src/transforms/dedupe/common.rs) — substring-level dedup is part of
  * the training-data-pipeline surface this library adds on top (builder
  * brief; Lee et al., "Deduplicating Training Data Makes Language Models
  * Better", ACL '22 motivates the token-run granularity).
  */
object Winnow {

  /** Default gram size (tokens per k-gram). */
  val K = 16

  /** Default winnowing window (guarantee threshold = K + W - 1 = 23). */
  val W = 8

  /** Deterministic boilerplate-injecting token generator: the base
    * [[Gen.rowOf]] stream with `sharePct`% of documents carrying one of
    * `blocks` shared `blockLen`-token runs spliced at a per-doc
    * deterministic offset. Pure function of the row id — identical at any
    * parallelism (same contract as [[Gen.tokenseq]]); the synthetic analog
    * of real-corpus boilerplate for the substring-dedup oracles.
    */
  def genWithBoilerplate(spark: SparkSession, rows: Long, parts: Int,
                         maxTok: Int = 384, blocks: Int = 24,
                         blockLen: Int = 96, sharePct: Int = 35,
                         startId: Long = 0): Dataset[TokenSeq] = {
    import spark.implicits._
    val cfg = GenConfig(rows = rows, maxTok = maxTok)
    spark.range(startId, startId + rows, 1, parts).as[Long].map { id =>
      val base = Gen.rowOf(id, cfg)
      val pick = Mix.bounded(0xB011L, id, 7, 100)
      if (pick < sharePct && base.n_tok >= blockLen + 8) {
        val blk = Mix.bounded(0xB022L, id, 8, blocks)
        val off = Mix.bounded(0xB033L, id, 9, base.n_tok - blockLen + 1)
        val t = base.tokens.clone()
        var j = 0
        while (j < blockLen) {
          t(off + j) = ((Mix.mix64(0xB10CL + blk.toLong * 131071L + j) >>> 1) % cfg.vocab).toInt
          j += 1
        }
        base.copy(tokens = t)
      } else base
    }
  }

  /** The "next commit" of the [[genWithBoilerplate]] corpus for
    * snapshot-diff oracles: the id window slides by `shift` (old head
    * removed, new tail added) and every surviving doc with
    * `h15(doc_id) mod 11 = 0` gets one token appended (the changed lane).
    * Pure per-row column program over the pure generator — identical at
    * any parallelism.
    */
  def genSnapshotNew(spark: SparkSession, rows: Long = 3000, parts: Int = 8,
                     shift: Long = 500): DataFrame = {
    val mut = pmod(Hashing.h15(col("doc_id")), lit(11L)) === 0L
    genWithBoilerplate(spark, rows = rows, parts = parts, startId = shift).toDF()
      .withColumn("tokens",
        when(mut, concat(col("tokens"), array(lit(7)))).otherwise(col("tokens")))
      .withColumn("n_tok", when(mut, col("n_tok") + 1).otherwise(col("n_tok")))
  }

  /** Deterministic corpus+batch generator with planted EXACT duplicates:
    * ids `[0, corpusRows)` are the existing corpus; ids `[corpusRows,
    * corpusRows + batchRows)` are the new-ingest batch, of which
    * `dupPct`% carry the token payload of a deterministically chosen
    * corpus row (content-identical, own doc_id — the re-crawl/re-ingest
    * shape incremental dedup exists for). Pure function of the row id;
    * identical at any parallelism.
    */
  def genWithDups(spark: SparkSession, corpusRows: Long, batchRows: Long,
                  parts: Int, dupPct: Int = 30,
                  maxTok: Int = 256): Dataset[(String, Array[Int], Int, String, String)] = {
    import spark.implicits._
    val cfg = GenConfig(rows = corpusRows + batchRows, maxTok = maxTok)
    spark.range(0, corpusRows + batchRows, 1, parts).as[Long].map { id =>
      val base = Gen.rowOf(id, cfg)
      if (id < corpusRows) (base.doc_id, base.tokens, base.n_tok, base.source, "corpus")
      else if (Mix.bounded(0xD0BAL, id, 6, 100) < dupPct) {
        val src = Mix.bounded(0xD0BBL, id, 7, corpusRows.toInt).toLong
        val donor = Gen.rowOf(src, cfg)
        (base.doc_id, donor.tokens, donor.n_tok, base.source, "batch")
      } else (base.doc_id, base.tokens, base.n_tok, base.source, "batch")
    }.toDF("doc_id", "tokens", "n_tok", "source", "lane")
      .as[(String, Array[Int], Int, String, String)]
  }

  /** 60-bit hash per k-gram position: `gh[i] = h15(tokens[i..i+k-1])`
    * (1-based, `size - k + 1` entries). Narrow, codegen'd. TOTAL: arrays
    * shorter than `k` yield `[]` — callers filter `n_tok >= k` for
    * semantics, but the expression must stay safe on ALL rows because
    * `InferFiltersFromGenerate` derives a `size(...) > 0` predicate from a
    * downstream explode and predicate pushdown can evaluate it BELOW the
    * length filter (a bare `sequence(1, size-k+1)` turns descending on
    * short rows and feeds `slice` a 0 start).
    */
  private[tokens] def gramHashes(tokens: Column, k: Int): Column =
    when(size(tokens) >= k,
      transform(sequence(lit(1), size(tokens) - (k - 1)),
        i => Hashing.h15(array_join(
          transform(slice(tokens, i, lit(k)), t => t.cast("string")), ","))))
      .otherwise(array().cast("array<bigint>"))

  /** Winnowing fingerprints, exploded to `(doc_id, source, fp)`. Documents
    * shorter than `k + w - 1` tokens carry no fingerprint (dropped — below
    * the detection guarantee on BOTH engines). Fingerprints are distinct
    * per doc. Computed by the native
    * [[graft.functions.WinnowFingerprints]] expression (one pass, no
    * interpreted HOF lambdas — 45 s → seconds at 100 k docs);
    * [[fingerprintsColumns]] is the value-identical column formulation the
    * spec pins it against.
    */
  def fingerprints(df: DataFrame, k: Int = K, w: Int = W): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    df.filter(col("n_tok") >= k + w - 1)
      .select(col("doc_id"), col("source"),
        explode(Bridge.column(graft.functions.WinnowFingerprints(
          Bridge.expression(col("tokens")), k, w))).as("fp"))
  }

  /** Pure-builtin twin of [[fingerprints]] (interpreted HOF lambdas — the
    * mechanism oracle for the native expression, and the direct analog of
    * the DuckDB oracle SQL).
    */
  def fingerprintsColumns(df: DataFrame, k: Int = K, w: Int = W): DataFrame =
    df.filter(col("n_tok") >= k + w - 1)
      .withColumn("gh", gramHashes(col("tokens"), k))
      .select(col("doc_id"), col("source"),
        explode(array_distinct(
          when(size(col("gh")) >= w,
            transform(sequence(lit(1), size(col("gh")) - (w - 1)),
              j => array_min(slice(col("gh"), j, lit(w)))))
            .otherwise(array().cast("array<bigint>")))).as("fp"))

  /** Exact duplicate-run REMOVAL (the application [[dupStats]] only
    * flags): delete every corpus-wide duplicated token run of at least `k`
    * tokens, keeping exactly one occurrence — the "ExactSubstr" dedup of
    * Lee et al. (ACL '22), re-expressed at k-gram granularity so it
    * distributes (their suffix array is a single-machine structure).
    *
    * Semantics: a position-`p` k-gram of a doc is a DUPLICATE SITE iff
    * the same token content occurs at ≥ 2 (doc, pos) sites corpus-wide
    * and `(doc_id, pos)` is not the lexicographic minimum site (the
    * deterministic winner — first occurrence wins, the exact-dedup
    * survivor rule). Every token covered by a losing gram window is
    * removed; a shared run of length m ≥ k is fully covered by its
    * interior grams in every losing doc, so whole runs vanish and
    * `k` IS the minimum-match-length knob (Lee et al. use 50).
    *
    * Plan: per-position gram hashes are NARROW ([[gramHashes]], codegen);
    * sites materialize once for their two consumers; winner/count is ONE
    * map-side-combinable hash aggregate keyed by gram (only duplicated
    * grams — boilerplate-sized — survive the filter); losers come from a
    * gram-keyed join (hot boilerplate gram = one build row, streaming
    * probe); covered positions aggregate doc-keyed. Per-doc state is
    * bounded by doc length, never corpus-shaped. The k× position blowup
    * of the covered-explode is bounded by k·(losing sites) — duplicated
    * text only, not the corpus.
    *
    * Returns the REMOVAL LANE only: `(doc_id, source, n_before,
    * n_removed, clean_hash)` — clean_hash is [[TokenOps.contentHash]] of
    * the surviving tokens (SQL-reproducible; arrays stay out of the
    * result).
    */
  def removeDuplicateRuns(df: DataFrame, k: Int = K,
                          checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 2, "k must be >= 2")
    // 9-digit pad: Spark lpad TRUNCATES strings longer than the pad width,
    // so a 6-digit pad would silently corrupt winner keys on documents
    // with >= 10^6 gram positions; 10^9 positions/doc is out of scope.
    val skey = concat(col("doc_id"), lit("|"),
      lpad(col("pos").cast("string"), 9, "0"))
    val raw = df.filter(col("n_tok") >= k)
      .select(col("doc_id"),
        posexplode(gramHashes(col("tokens"), k)).as(Seq("p0", "gh")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("gh"))
    val sites = checkpointDir match {
      case Some(dir) =>
        val spark = df.sparkSession
        val cur = spark.sparkContext.getCheckpointDir
        if (!cur.exists(_.contains(dir))) spark.sparkContext.setCheckpointDir(dir)
        raw.checkpoint(eager = true)
      case None => raw.localCheckpoint(true)
    }
    val winners = sites.groupBy(col("gh"))
      .agg(min(skey).as("wkey"), count(lit(1)).as("n"))
      .filter(col("n") >= 2).select("gh", "wkey")
    val covered = sites.join(winners, "gh")
      .filter(skey =!= col("wkey"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("cp"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("cp")).as("cov"))
    df.join(covered, "doc_id")
      .select(col("doc_id"), col("source"),
        col("n_tok").cast("long").as("n_before"),
        size(col("cov")).cast("long").as("n_removed"),
        TokenOps.contentHash(
          expr("filter(tokens, (t, i) -> NOT array_contains(cov, i + 1))"))
          .as("clean_hash"))
  }

  /** Per-document substring-duplication stats: of the doc's `n_fp`
    * winnowing fingerprints, `dup_fp` also occur in at least one OTHER
    * document. Docs with `dup_fp = 0` are filtered (the interesting lane —
    * a curation pipeline drops or trims the high-`dup_fp/n_fp` tail).
    *
    * Plan: narrow fingerprint selection → one fp-keyed aggregate
    * (map-side combinable `countDistinct` seeded by doc) → fp-keyed join
    * back → doc-keyed aggregate. Both shuffles are on the winnowed
    * (~2/(w+1)-selected) fingerprint stream, never on raw positions. The
    * fp stream is materialized ONCE before its two consumers (the
    * aggregate's partial-agg plan differs from the join side's, so
    * exchange reuse cannot cover it; measured ~1.9× at 100 k docs) —
    * `localCheckpoint` single-JVM, reliable `checkpoint(dir)` on clusters
    * via `checkpointDir` (the [[graft.dedup.Dedupe.components]] contract).
    */
  def dupStats(df: DataFrame, k: Int = K, w: Int = W,
               checkpointDir: Option[String] = None): DataFrame = {
    val raw = fingerprints(df, k, w)
    val fp = checkpointDir match {
      case Some(dir) =>
        val spark = df.sparkSession
        val cur = spark.sparkContext.getCheckpointDir
        if (!cur.exists(_.contains(dir))) spark.sparkContext.setCheckpointDir(dir)
        raw.checkpoint(eager = true)
      case None => raw.localCheckpoint(true)
    }
    val shared = fp.groupBy(col("fp")).agg(countDistinct(col("doc_id")).as("ndocs"))
    fp.join(shared, "fp")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_fp"),
        sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("dup_fp"))
      .filter(col("dup_fp") > 0)
  }
}
