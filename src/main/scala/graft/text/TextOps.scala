package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation over a `documents`
  * table `(doc_id, text, lang, source, n_chars)` — the large-scale pipeline
  * ops a Vector-class engine needs when its payload is LLM training text
  * rather than log lines (analog of the VRL string/parse stdlib, SURVEY.md
  * §2.5: `parse_tokens`, `strlen`, `sieve`, plus quality/classify helpers).
  *
  * Everything here is a pure Catalyst column program: narrow maps, no
  * shuffles, whole-stage-codegen-able. Each op has a DuckDB-expressible
  * twin (SparkEntry.oracleSql) built on the shared cross-engine hash
  * [[Hashing.h15]] so results are bit-identical across engines.
  */
object TextOps {

  /** Whitespace tokens. `split` keeps trailing empties (limit = -1), which
    * matches DuckDB `string_split`; the testdata corpus is single-spaced.
    */
  def words(text: Column): Column = split(text, " ", -1)

  /** Whitespace token count (VRL `parse_tokens` / `strlen` family). */
  def wordCount(text: Column): Column = size(words(text))

  /** BPE-ish subword count: a GPT-2-style pre-tokenizer regex reduced to the
    * engine-portable subset — runs of letters, runs of digits, single other
    * non-space chars. A real BPE merge table would run in a codegen'd
    * Expression; the regex pre-tokenization is the scalable first stage.
    */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Real lists (top function words); matching is exact-token.
    */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "los", "y", "es", "no", "un", "por", "que"),
    "fr" -> Seq("le", "la", "et", "est", "pas", "un", "pour", "dans"),
    "zh" -> Seq("de0", "shi4", "bu4", "le0", "zai4", "you3", "he2", "ren2"))

  /** Count of tokens present in `profile` (duplicates counted — ratio
    * semantics of a real stopword scorer).
    */
  def stopwordHits(toks: Column, profile: Seq[String]): Column = {
    // native hash-set membership count — the filter-HOF formulation
    // (size(filter(toks, 8..40-way OR))) interprets its lambda per token
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.StopwordHits(Bridge.expression(toks), profile))
  }

  /** Language-ID: argmax of per-language stopword hit counts; ties broken
    * by language code ascending; all-zero → "und" (undetermined, BCP-47).
    */
  def langId(text: Column): Column = {
    // native one-pass argmax (word → language bitmask, first-max
    // tie-break in alphabetical profile order, all-zero → "und"): the
    // when-chain + greatest() column formulation re-embedded every
    // per-language interpreted filter in EVERY branch — ~30 interpreted
    // HOFs per row after Catalyst expansion, the hot atom of the curation
    // plans at sf0.1
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.LangIdExpr(
      Bridge.expression(words(text)), StopwordProfiles))
  }

  /** Quality-score components + composite, mirroring common training-data
    * quality filters (length, mean word length, stopword density,
    * symbol density). All-arithmetic → identical across engines.
    */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = words(text)
    val nW = size(toks).cast("double")
    // algebraic identity, no per-token fold: split-by-one-space means
    // sum(length(token)) == length(text) - (n_tokens - 1) exactly
    val sumLen = (length(text) - (size(toks) - 1)).cast("double")
    val stop = stopwordHits(toks, StopwordProfiles.flatMap(_._2)).cast("double")
    val nonAlnum = size(regexp_extract_all(text, lit("[^a-z0-9 ]"), lit(0))).cast("double")
    Seq(
      "n_words" -> nW.cast("long"),
      "mean_word_len" -> round(sumLen / nW, 4),
      "stopword_ratio" -> round(stop / nW, 4),
      "symbol_ratio" -> round(nonAlnum / greatest(length(text), lit(1)).cast("double"), 4))
  }

  /** Composite keep/drop decision (Gopher-rule-style thresholds). */
  def qualityKeep(text: Column): Column = {
    val cols = qualityColumns(text).toMap
    (cols("n_words") >= 10) && (cols("n_words") <= 100000) &&
      (cols("mean_word_len") >= 2) && (cols("mean_word_len") <= 12) &&
      (cols("symbol_ratio") <= 0.2)
  }

  /** Deterministic soft quality sampling (the GPT-3 appendix rule — keep
    * probability rises with the classifier score — made replay-stable):
    * keep a doc iff `h15("qs|"+id) mod 10⁶ < keep_ppm`, with
    * `keep_ppm = clamp(500000 + logodds_micronats/1000, 10⁴, 10⁶)` from
    * [[nbQualityClassifier]]'s integer log-odds. Hash-decided (never
    * `rand()`): reruns, retries, and any parallelism keep the SAME docs,
    * and a SQL twin reproduces the selection exactly. The division uses a
    * large positive offset so Spark's truncating `DIV` equals DuckDB's
    * flooring `//` on negative scores. The salt namespace is distinct
    * from mix/split/strat, so composing stages doesn't correlate.
    *
    * Scale shape: the classifier's two corpus scans + vocab-sized model
    * join, then a fully narrow rate/keep projection.
    */
  def qualitySample(df: DataFrame, text: Column, id: Column): DataFrame =
    nbQualityClassifier(df, text, id)
      .select(col("doc_id"),
        greatest(least(
          lit(500000L) +
            expr("(logodds_micronats + 4000000000000000) DIV 1000 - 4000000000000"),
          lit(1000000L)), lit(10000L)).as("keep_ppm"))
      .withColumn("kept",
        pmod(Hashing.h15(concat(lit("qs|"), col("doc_id"))), lit(1000000L))
          < col("keep_ppm"))

  /** Corpus "datasheet" card: the one-row audit a dataset release ships —
    * doc/word totals, exact-dup rate, quality-gate pass rate, dominant
    * language — all integer/ppm so the row is engine-exact.
    *
    * Scale shape (10^12 rows): two map-side-combinable aggregates (the
    * exact `countDistinct(md5)` shuffles one row per DISTINCT text; at
    * extreme cardinality swap in `approx_count_distinct` — same plan,
    * HLL-sketch-sized partials) plus a language top-1
    * (`TakeOrderedAndProject`) broadcast onto the single card row.
    */
  def corpusCard(df: DataFrame, text: Column, lang: Column): DataFrame = {
    val agg1 = df.agg(
      count(lit(1)).as("n_docs"),
      sum(wordCount(text).cast("long")).as("n_words"),
      countDistinct(md5(text)).as("n_distinct"),
      sum(when(qualityKeep(text), 1L).otherwise(0L)).as("n_keep"))
      .withColumn("dup_ppm", expr("(n_docs - n_distinct) * 1000000 DIV n_docs"))
      .withColumn("keep_ppm", expr("n_keep * 1000000 DIV n_docs"))
    val top = df.groupBy(lang.as("top_lang")).agg(count(lit(1)).as("_n"))
      .orderBy(col("_n").desc, col("top_lang")).limit(1).select("top_lang")
    agg1.crossJoin(broadcast(top))
  }

  /** Positional document fingerprint: fold of the cross-engine token hash
    * with a 31-multiplier rolling accumulator (Rabin-Karp-style), mod
    * 2^31-1. Collision-resistant enough for dedup bucketing, cheap enough
    * to run on 10^12 rows as a narrow map.
    */
  def fingerprint(text: Column): Column = {
    val g = (t: Column) => pmod(Hashing.h15(t), lit(1000003L))
    aggregate(words(text), lit(0L),
      (acc, t) => pmod(acc * 31L + g(t), lit(2147483647L)))
  }

  /** CCNet-style unigram LM perplexity filter: train a word-frequency LM on
    * the corpus itself (CCNet trains on Wikipedia; same mechanics, zero
    * external data), score each document by its per-token cross-entropy
    * under that LM, and keep the low-perplexity (fluent) tail.
    *
    * Cross-engine determinism: the per-token cost is quantized to integer
    * micro-nats — `round((ln N − ln c(w)) · 10^6)` as BIGINT — so the
    * per-document reduction is an order-independent integer sum (float sums
    * of doubles are association-sensitive; integer sums are not), and the
    * per-token cross-entropy is integer division. Only `ln` of exact-integer
    * doubles crosses the float boundary, nudged per the repo rounding rule.
    *
    * Scale shape (10^12 rows): two corpus scans (one to build the LM, one to
    * score), both map-side-combinable hash aggregates; the LM table is
    * vocabulary-sized (≪ corpus, Heaps' law) and joins word-keyed — AQE
    * broadcasts it when it fits, shuffles it when it doesn't; the 1-row
    * total is an explicit broadcast. No windows, no driver-side data.
    *
    * @param keepUnderMicroNats keep threshold on the per-token cross-entropy
    *        (9.5 nats/token ≈ perplexity 13k under the corpus LM)
    */
  def lmPerplexity(df: DataFrame, text: Column, id: Column,
                   keepUnderMicroNats: Long = 9500000L): DataFrame = {
    val tok = df.select(id.as("doc_id"), explode(words(text)).as("w"))
    val vocab = tok.groupBy("w").agg(count(lit(1)).cast("long").as("c"))
    val total = vocab.agg(sum("c").cast("double").as("n"))
    val costs = vocab.crossJoin(broadcast(total)).select(
      col("w"),
      round((log(col("n")) - log(col("c").cast("double"))) * 1e6 + lit(1e-9), 0)
        .cast("long").as("cost"))
    tok.join(costs, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum("cost").as("sum_cost"))
      .withColumn("ce_micronats", expr("sum_cost div n_words"))
      .withColumn("keep", col("ce_micronats") < keepUnderMicroNats)
  }

  /** TF-IDF top-k keyword extraction per document (corpus-trained IDF,
    * smoothed `ln((D+1)/(df+1))`), the standard content-signature /
    * domain-audit op over a curation corpus.
    *
    * Cross-engine determinism: IDF is quantized to integer micro-nats
    * (repo rounding rule), the score is the integer product `tf · idf`,
    * and the per-doc top-k tie-breaks on the token text — fully ordered,
    * no float comparisons.
    *
    * Scale shape (10^12 rows): tf and df are map-side-combinable hash
    * aggregates; the IDF model is vocabulary-sized and word-key-joined
    * (AQE-broadcast when it fits); the per-doc top-k is `row_number ≤ k`,
    * which Spark rewrites with a map-side WindowGroupLimit — each task
    * forwards at most k rows per document to the window sort, so hot
    * documents never buffer their full vocabulary in one task
    * (plan-pinned in PlanSpec).
    */
  def tfidfTopK(df: DataFrame, text: Column, id: Column, k: Int = 3): DataFrame = {
    require(k > 0, "k must be positive")
    val tok = df.select(id.as("doc_id"), explode(words(text)).as("w"))
    val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).cast("long").as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).cast("long").as("df"))
    val total = df.agg(count(lit(1)).cast("double").as("n_docs"))
    val idf = dfreq.crossJoin(broadcast(total)).select(
      col("w"),
      round((log(col("n_docs") + 1.0) - log(col("df").cast("double") + 1.0)) * 1e6
        + lit(1e-9), 0).cast("long").as("idf"))
    val win = Window.partitionBy("doc_id").orderBy(col("score").desc, col("w").asc)
    tf.join(idf, "w")
      .withColumn("score", col("tf") * col("idf"))
      .withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "w", "tf", "score", "rank")
  }

  /** BM25 retrieval top-k (Robertson/Spärck Jones; the Okapi weighting):
    * for each query, the `k` highest-scoring corpus documents under
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))` — the
    * classic lexical ranker (and the retrieval side of a contamination /
    * near-source audit: "which corpus docs answer this benchmark
    * question"). Query term frequency is 1 (terms deduped) — the standard
    * short-query simplification.
    *
    * Cross-engine determinism: the per-(term, doc) score is ONE fixed-order
    * double expression (the same `ln`/divide/multiply text in both
    * engines) quantized to integer micro-units with the repo's `+1e-9`
    * half-way nudge, so the per-(query, doc) reduction is an
    * order-independent integer sum. `k1`/`b` must be given as exact
    * literals on both sides (no k1+1 re-derivation — 1.2+1.0 and the
    * literal 2.2 are different doubles).
    *
    * Scale shape (10^12 rows): the corpus tf aggregate is map-side
    * combinable; the distinct query-term set broadcasts and prunes the tf
    * table BEFORE df is counted (df aggregates only query terms, never the
    * corpus vocabulary); totals are an explicit 1-row broadcast; per-query
    * top-k is a `row_number ≤ k` that plants a map-side WindowGroupLimit.
    */
  def bm25TopK(docs: DataFrame, text: Column, id: Column,
               queries: DataFrame, qid: Column, qtext: Column,
               k: Int = 10, k1: Double = 1.2, k1p1: Double = 2.2,
               b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    val d = docs.select(id.as("doc_id"), text.as("t"))
      .withColumn("dl", wordCount(col("t")).cast("long"))
    val tok = d.select(col("doc_id"), col("dl"), explode(words(col("t"))).as("w"))
    val tf = tok.groupBy("doc_id", "w")
      .agg(count(lit(1)).cast("long").as("tf"), max("dl").as("dl"))
    val qterms = queries
      .select(qid.as("query_id"), explode(words(qtext)).as("w")).distinct()
    // prune to query terms FIRST: df then counts docs-per-term over the
    // full corpus but aggregates only the query vocabulary
    val tfq = tf.join(broadcast(qterms.select("w").distinct()), Seq("w"))
    val dfx = tfq.groupBy("w").agg(count(lit(1)).cast("long").as("df"))
    val totals = d.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum("dl").cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val micro = round(
      (log(col("n_docs") + 1.0) - log(col("df").cast("double") + 1.0)) *
        ((col("tf").cast("double") * lit(k1p1)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))) *
        1e6 + 1e-9, 0).cast("long")
    val scored = tfq.join(dfx, "w").crossJoin(broadcast(totals))
      .join(broadcast(qterms), Seq("w"))
      .withColumn("s_micro", micro)
      .groupBy("query_id", "doc_id")
      .agg(sum("s_micro").as("score"))
    val win = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "score", "rank")
  }

  /** GPT-3/CCNet-style naive-Bayes quality classifier, self-trained: the
    * Gopher-rule gates ([[qualityKeep]]) label a seed split (positive =
    * passes the gates), an add-1-smoothed unigram NB model is trained on
    * those labels, and every document is re-scored by summed log-odds —
    * the generalizing statistical filter the hard rules bootstrap (GPT-3
    * trains its quality classifier the same way: a cheap heuristic label
    * source, then a linear model over unigrams).
    *
    * Cross-engine determinism: per-word log-odds are quantized to integer
    * micro-nats with the fixed evaluation order
    * `(ln(c_pos+1) − ln(N_pos+V)) − (ln(c_neg+1) − ln(N_neg+V))` (IEEE
    * doubles are deterministic given a fixed op order), so the per-document
    * reduction is an order-independent integer sum; the prior is the doc-
    * count log-ratio with the same +1 smoothing.
    *
    * Scale shape (10^12 rows): two corpus scans (train, score), both
    * map-side-combinable hash aggregates; the model is vocabulary-sized and
    * word-key-joined (AQE broadcasts it when it fits); the totals/prior are
    * explicit 1-row broadcasts. No windows, no driver-side data.
    */
  def nbQualityClassifier(df: DataFrame, text: Column, id: Column): DataFrame = {
    val labeled = df.select(id.as("doc_id"), text.as("t"),
      qualityKeep(text).as("pos"))
    val tok = labeled.select(col("doc_id"), col("pos"), explode(words(col("t"))).as("w"))
    val vocab = tok.groupBy("w").agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("c_pos"),
      sum(when(!col("pos"), 1L).otherwise(0L)).as("c_neg"))
    val totals = vocab.agg(
      sum("c_pos").cast("double").as("n_pos"),
      sum("c_neg").cast("double").as("n_neg"),
      count(lit(1)).cast("double").as("v"))
    val prior = labeled.agg(
      round((log(sum(when(col("pos"), 1L).otherwise(0L)).cast("double") + 1.0) -
             log(sum(when(!col("pos"), 1L).otherwise(0L)).cast("double") + 1.0)) * 1e6
        + lit(1e-9), 0).cast("long").as("prior"))
    val model = vocab.crossJoin(broadcast(totals)).select(
      col("w"),
      round(((log(col("c_pos").cast("double") + 1.0) - log(col("n_pos") + col("v"))) -
             (log(col("c_neg").cast("double") + 1.0) - log(col("n_neg") + col("v")))) * 1e6
        + lit(1e-9), 0).cast("long").as("lo"))
    tok.join(model, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum("lo").as("sum_lo"),
        max(when(col("pos"), 1L).otherwise(0L)).as("seed_pos"))
      .crossJoin(broadcast(prior))
      .select(col("doc_id"), col("n_words"),
        (col("prior") + col("sum_lo")).as("logodds_micronats"),
        (col("prior") + col("sum_lo") > 0L).as("pred_quality"),
        (col("seed_pos") === 1L).as("seed_label"))
  }

  /** OOV-rate / vocabulary-coverage audit: the fraction of each document's
    * tokens that fall outside the corpus top-`vocabSize` vocabulary — the
    * standard check that a tokenizer/vocab budget actually covers the
    * corpus it will train on (high OOV → fertility blowup or UNK floods).
    *
    * Cross-engine determinism: the vocabulary cut is fully ordered
    * (`count DESC, word ASC`) and the rate is integer ppm
    * (`n_oov·10⁶ div n_words`) — no float division.
    *
    * Scale shape (10^12 rows): two corpus scans, both map-side-combinable
    * hash aggregates; the vocab is model-sized (`TakeOrderedAndProject`,
    * like a centroid seed) and joins word-keyed as an explicit broadcast.
    */
  def oovRate(df: DataFrame, text: Column, id: Column,
              vocabSize: Int = 20): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val tok = df.select(id.as("doc_id"), explode(words(text)).as("w"))
    val vocab = tok.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(1).as("_inv"))
    tok.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(when(col("_inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("n_oov * 1000000 div n_words"))
  }

  /** Source-distribution drift audit: per-source divergence of token
    * distributions between two deterministic corpus halves — the
    * data-quality drift monitor an ingest pipeline runs per batch/snapshot
    * (did `web`'s content shift between crawls? did a source's extractor
    * regress?). Halves are salted-hash parity of the id (`h15("drift|"+id)
    * mod 2`), so membership is replay-stable and a SQL twin reproduces the
    * split exactly; in production the two sides are two snapshot commits.
    *
    * Score: over the GLOBAL top-`topV` vocabulary, per-source integer-ppm
    * frequency vectors for each half, drift = Σ_w (ppm_a − ppm_b)² — an
    * L2² distance in ppm space. All-integer (ppm = `n·10⁶ div total`):
    * order-independent sums, exact across engines. ppm ≤ 10⁶ and
    * topV ≤ 10⁴ keep the sum far inside BIGINT.
    *
    * Scale shape (10^12 rows): ONE corpus scan feeds a (source, half,
    * word)-keyed map-side-combinable count, materialized once
    * (localCheckpoint) for its three consumers; the vocabulary cut is
    * model-sized (`TakeOrderedAndProject`) and broadcasts; per-source
    * totals are sources×2 rows. Nothing corpus-sized shuffles twice.
    */
  def sourceDrift(df: DataFrame, text: Column, id: Column,
                  topV: Int = 64): DataFrame = {
    require(topV > 0, "topV must be positive")
    val half = pmod(Hashing.h15(concat(lit("drift|"), id)), lit(2L))
    val wc = df
      .select(col("source"), half.as("half"), explode(words(text)).as("w"))
      .groupBy(col("source"), col("half"), col("w"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val vocab = wc.groupBy(col("w")).agg(sum(col("n")).as("nw"))
      .orderBy(col("nw").desc, col("w")).limit(topV).select("w")
    val totals = wc.groupBy(col("source")).agg(
      sum(when(col("half") === 0L, col("n")).otherwise(0L)).as("tot_a"),
      sum(when(col("half") === 1L, col("n")).otherwise(0L)).as("tot_b"))
    val perWord = wc.join(broadcast(vocab), "w")
      .groupBy(col("source"), col("w"))
      .agg(sum(when(col("half") === 0L, col("n")).otherwise(0L)).as("na"),
        sum(when(col("half") === 1L, col("n")).otherwise(0L)).as("nb"))
    perWord.join(broadcast(totals), "source")
      .withColumn("pa", expr("na * 1000000 DIV greatest(tot_a, 1)"))
      .withColumn("pb", expr("nb * 1000000 DIV greatest(tot_b, 1)"))
      .groupBy(col("source"))
      .agg(max(col("tot_a")).as("tok_a"), max(col("tot_b")).as("tok_b"),
        sum((col("pa") - col("pb")) * (col("pa") - col("pb"))).as("drift_l2"),
        count(lit(1)).cast("long").as("n_words"))
  }

  /** Gopher-style repetition signals per document: duplicate-word fraction
    * and the fraction of the text covered by its most frequent word bigram
    * (high values flag boilerplate/spam). FULLY NARROW: the top-bigram
    * count is a native single-pass expression
    * ([[graft.functions.TopBigramCount]]) inside whole-stage codegen — no
    * explode, no bigram shuffle; the r3 explode→two-hash-aggregate plan
    * shuffled every bigram string corpus-wide and regressed the fused
    * curation query 62% at sf0.1.
    */
  def repetitionStats(df: org.apache.spark.sql.DataFrame, text: Column,
                      id: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    df.select(id.as("doc_id"), words(text).as("tk"))
      .withColumn("n_words", size(col("tk")).cast("long"))
      .withColumn("n_uniq", size(array_distinct(col("tk"))).cast("long"))
      .withColumn("top_bigram_n",
        Bridge.column(graft.functions.TopBigramCount(Bridge.expression(col("tk")))))
      .select(col("doc_id"),
        round((col("n_words") - col("n_uniq")).cast("double") / col("n_words"), 6)
          .as("dup_word_frac"),
        col("top_bigram_n").cast("long").as("top_bigram_n"),
        round(when(col("n_words") >= 2,
          lit(2.0) * col("top_bigram_n") / col("n_words")).otherwise(0.0), 6)
          .as("top_bigram_frac"))
  }

  /** Per-source score calibration — exact percent-rank and curriculum
    * bucket for every document WITHOUT a corpus-wide window (a window
    * partitioned by `source` serializes each source's billions of rows
    * through one task at 100 TB).
    *
    * Two-pass exact rank instead: (1) one map-side-combinable count per
    * (source, score) — output is the SCORE TABLE, rows = distinct scores
    * per source, tiny when scores are discretized (lengths, ppm-scaled
    * classifier outputs); (2) exclusive cumsum over that table per
    * source; (3) broadcast join back — every row learns how many of its
    * source's rows score strictly below it. `pct_rank` follows SQL
    * percent_rank tie semantics (ties take the min rank);
    * `bucket = below·buckets div total` puts equal scores in equal
    * buckets (the curriculum-correct tie policy, unlike ntile's arbitrary
    * tie split).
    */
  def scoreCalibrate(df: DataFrame, id: Column, source: Column, score: Column,
                     buckets: Int = 10): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val base = df.select(id.as("doc_id"), source.as("source"), score.as("score"))
    val wBelow = Window.partitionBy(col("source")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col("source"))
    val cum = base.groupBy(col("source"), col("score"))
      .agg(count(lit(1)).as("n"))
      .withColumn("below", coalesce(sum(col("n")).over(wBelow), lit(0L)))
      .withColumn("tot", sum(col("n")).over(wTot))
      .select(col("source"), col("score"), col("below"), col("tot"))
    base.join(broadcast(cum), Seq("source", "score"))
      .select(col("doc_id"), col("source"), col("score"),
        round(when(col("tot") > 1,
          col("below").cast("double") / (col("tot") - 1)).otherwise(0.0), 6)
          .as("pct_rank"),
        expr(s"below * $buckets div tot").as("bucket"))
  }

  /** Inverted index build — token → capped, sorted posting list + document
    * frequency: the artifact behind log search (and the exact shape BM25's
    * df table extends). One explode to distinct (token, doc) pairs → one
    * shuffle on token → per-token sort + cap.
    *
    * Scale levers, both explicit because posting lists are the classic
    * reducer hot spot: `minDf` drops hapax noise and `maxPostings` caps
    * each list at the `maxPostings` SMALLEST doc ids — and the cap is
    * enforced BEFORE `collect_list`, via a rank filter on the shuffled
    * pairs, so no aggregation buffer ever holds a stop-word's
    * corpus-sized postings (a post-collect `slice` would). The rank pass
    * and the collect share the token partitioning — one shuffle, the
    * second exchange is reused. `df` reports the TRUE document frequency
    * (counted pre-cap); the capped list is deterministic at any
    * parallelism because the cut is by doc-id order, not arrival.
    */
  def invertedIndex(df: DataFrame, text: Column, id: Column,
                    minDf: Long = 2, maxPostings: Int = 1000): DataFrame = {
    val pairs = df.select(id.as("doc_id"),
      explode(array_distinct(words(text))).as("token"))
    val wTok = Window.partitionBy(col("token"))
    val wRank = Window.partitionBy(col("token")).orderBy(col("doc_id"))
    pairs
      .withColumn("df", count(lit(1)).over(wTok))
      .withColumn("_rn", row_number().over(wRank))
      .filter(col("_rn") <= maxPostings && col("df") >= minDf)
      .groupBy(col("token"))
      .agg(first(col("df")).as("df"),
        sort_array(collect_list(col("doc_id"))).as("postings"))
  }

  /** Log-template mining — the "Log Patterns" view every log platform
    * ships (Drain's fixed-depth clustering, He et al. 2017, reduced to its
    * deterministic masking core): variable fields (IPs, long hex ids,
    * numbers) are masked to typed placeholders and identical skeletons
    * group into one template with a count and an example line.
    *
    * Scale shape: a narrow codegen'd regexp chain (no UDF, masking order
    * IP → hex → number so sub-patterns never re-match inside earlier
    * placeholders) → ONE map-side-combinable hash aggregate on the
    * template (cardinality = distinct templates, tiny vs the corpus) →
    * `TakeOrderedAndProject` top-k. The corpus never shuffles — only
    * template rows do.
    */
  def logTemplates(df: DataFrame, message: Column, topK: Int = 20): DataFrame = {
    val masked = regexp_replace(
      regexp_replace(
        regexp_replace(message, "\\d+\\.\\d+\\.\\d+\\.\\d+", "<IP>"),
        "[0-9a-f]{12,}", "<HEX>"),
      "\\d+", "<N>")
    df.select(masked.as("template"), message.as("_msg"))
      .groupBy(col("template"))
      .agg(count(lit(1)).as("n"), min(col("_msg")).as("example"))
      .orderBy(desc("n"), col("template"))
      .limit(topK)
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): re-weight a raw corpus toward a target
    * distribution using hashed bag-of-ngram language models, then draw a
    * fixed budget with the Gumbel top-k trick (deterministic here: the
    * Gumbel noise is a pure hash of doc_id, so the sample is
    * replay-stable and SQL-twinnable).
    *
    * Per doc: weight = Σ_tokens [ln p̂_target(bucket) − ln p̂_raw(bucket)]
    * with add-one smoothing over `buckets` hashed feature buckets, in
    * integer micro-nats (per-bucket rounding → order-independent BIGINT
    * sums, exact across engines). kept = Gumbel-perturbed score ranks in
    * the top `k`.
    *
    * Scale shape (10^12 docs): one tokenize feeds two map-side-combinable
    * bucket counts; both LMs collapse to `buckets` rows → the
    * log-ratio table BROADCASTS and the per-doc weight is one narrow
    * broadcast-join + partial agg — the corpus never shuffles wide. The
    * top-k cut is `TakeOrderedAndProject` (sample budget k is
    * driver-sized by contract — it's the training-data budget, not a
    * corpus fraction; for budgets beyond driver memory swap the exact cut
    * for an approx-quantile threshold).
    */
  def dsirSample(df: DataFrame, text: Column, id: Column, targetPred: Column,
                 buckets: Int = 4096, k: Int = 100): DataFrame = {
    require(buckets > 0 && k > 0, "buckets and k must be positive")
    val bk = df.select(id.as("doc_id"), targetPred.as("_tgt"),
        explode(words(text)).as("w"))
      .select(col("doc_id"), col("_tgt"),
        pmod(Hashing.h15(concat(lit("dsir|"), col("w"))), lit(buckets.toLong))
          .as("bk"))
    val raw = bk.groupBy("bk").agg(count(lit(1)).as("c_r"))
    val tgt = bk.filter(col("_tgt")).groupBy("bk").agg(count(lit(1)).as("c_t"))
    val lm = raw.join(tgt, Seq("bk"), "left").na.fill(0L, Seq("c_t"))
    val tots = lm.agg(sum("c_r").cast("double").as("n_r"),
      sum("c_t").cast("double").as("n_t"))
    val lr = lm.crossJoin(broadcast(tots)).select(col("bk"),
      round((log((col("c_t") + lit(1.0)) / (col("n_t") + lit(buckets.toDouble))) -
             log((col("c_r") + lit(1.0)) / (col("n_r") + lit(buckets.toDouble))))
        * lit(1e6) + lit(1e-9), 0).cast("long").as("lr_mn"))
    val weights = bk.join(broadcast(lr), Seq("bk"))
      .groupBy("doc_id").agg(sum("lr_mn").as("weight_mn"))
    val u = (pmod(Hashing.h15(concat(lit("dg|"), col("doc_id"))), lit(1000000L))
      .cast("double") + lit(0.5)) / lit(1e6)
    val scored = weights.withColumn("score_mn",
      col("weight_mn") +
        round(-log(-log(u)) * lit(1e6) + lit(1e-9), 0).cast("long"))
    val topk = scored.orderBy(col("score_mn").desc, col("doc_id"))
      .limit(k).select(col("doc_id"), lit(true).as("_in"))
    scored.join(broadcast(topk), Seq("doc_id"), "left")
      .select(col("doc_id"), col("weight_mn"), col("score_mn"),
        coalesce(col("_in"), lit(false)).as("kept"))
  }
}
