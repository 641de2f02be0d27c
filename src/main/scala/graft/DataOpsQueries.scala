package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.dedup.Dedupe
import graft.sim.Similarity
import graft.text.{Hashing, TextOps}

/** Training-data curation queries (dedup / similarity / text analysis) with
  * DuckDB twin SQL. The DuckDB side is *generated from the same Scala
  * constants* (hash coefficients, stopword lists, hyperplane signs) as the
  * Spark side, so the two dialects cannot drift apart.
  *
  * Cross-engine determinism rules used throughout:
  *  - all hashes go through [[Hashing.h15]] (md5-prefix — identical in both
  *    engines); never `xxhash64` in anything the oracle sees;
  *  - float reductions are element-order left folds in double precision on
  *    both sides (`aggregate` ↔ `list_reduce`), so sums are bit-identical;
  *  - integer counts are cast to BIGINT on the Spark side to match DuckDB.
  */
object DataOpsQueries {

  // ---------- DuckDB dialect fragments (kept beside their Spark twins) ----------

  private def dH15(e: String) = s"CAST(concat('0x', substr(md5($e),1,15)) AS BIGINT)"

  /** The NB quality-classifier twin — shared verbatim between
    * `t_quality_classifier` and the soft-sampling query built on it.
    */
  private val QualityClassifierSql: String =
    """WITH d AS (SELECT doc_id, text, string_split(text,' ') AS tk FROM documents),
      |lab AS (SELECT doc_id, tk,
      |  (len(tk) BETWEEN 10 AND 100000)
      |   AND (round(list_sum(list_transform(tk, t -> len(t)))::DOUBLE / len(tk)::DOUBLE, 4) BETWEEN 2 AND 12)
      |   AND (round(len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / greatest(len(text),1)::DOUBLE, 4) <= 0.2) AS pos
      |  FROM d),
      |tok AS (SELECT doc_id, pos, unnest(tk) AS w FROM lab),
      |vocab AS (SELECT w, sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS c_pos,
      |                 sum(CASE WHEN NOT pos THEN 1 ELSE 0 END)::BIGINT AS c_neg
      |          FROM tok GROUP BY w),
      |tot AS (SELECT CAST(sum(c_pos) AS DOUBLE) AS n_pos, CAST(sum(c_neg) AS DOUBLE) AS n_neg,
      |               CAST(count(*) AS DOUBLE) AS v FROM vocab),
      |pri AS (SELECT CAST(round((ln(CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE) + 1.0)
      |                         - ln(CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS DOUBLE) + 1.0)) * 1000000 + 1e-9, 0) AS BIGINT) AS prior FROM lab),
      |model AS (SELECT w, CAST(round(((ln(CAST(c_pos AS DOUBLE) + 1.0) - ln(n_pos + v))
      |                              - (ln(CAST(c_neg AS DOUBLE) + 1.0) - ln(n_neg + v))) * 1000000 + 1e-9, 0) AS BIGINT) AS lo
      |          FROM vocab, tot),
      |doc AS (SELECT t.doc_id, count(*)::BIGINT AS n_words, CAST(sum(lo) AS BIGINT) AS sum_lo,
      |               max(CASE WHEN pos THEN 1 ELSE 0 END) AS seed_pos
      |        FROM tok t JOIN model USING (w) GROUP BY t.doc_id)
      |SELECT doc_id, n_words, prior + sum_lo AS logodds_micronats,
      |       (prior + sum_lo) > 0 AS pred_quality, seed_pos = 1 AS seed_label
      |FROM doc, pri""".stripMargin
  private def dH31(e: String) = s"(${dH15(e)} % 2147483647)"

  /** Left-fold double sum — DuckDB's guaranteed-sequential reduction, the
    * twin of Spark `aggregate(_, 0.0, _ + _)`.
    */
  private def dFoldSum(listExpr: String) =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), $listExpr), (acc, x) -> acc + x)"

  // ---------- BPE training chain (twin of TokenOps.trainBpe) ----------

  private val BpeIters = 3
  private val BpeBase = 50257

  /** CTE chain `c0,t0,d1,s1, … c{n-1},t{n-1},dn,sn` re-deriving each BPE
    * round over the previous round's merged corpus (expects a `d0` CTE
    * with `(doc_id, tokens)`). Shared by the `p_bpe_train` and
    * `p_bpe_encode` oracles.
    */
  private def bpeChainCtes(iters: Int, base: Int): String =
    (0 until iters).map { i =>
      s"""c$i AS (SELECT a, b, count(*)::BIGINT AS n FROM (
         |  SELECT tokens[i] AS a, tokens[i+1] AS b
         |  FROM d$i, unnest(generate_series(1, len(tokens)-1)) AS g(i)) GROUP BY a, b),
         |t$i AS (SELECT a, b, n FROM c$i ORDER BY n DESC, a, b LIMIT 1),
         |d${i + 1} AS (SELECT doc_id,
         |  list_reduce(list_prepend(CAST([] AS INT[]), list_transform(tokens, t -> [t])),
         |    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = t$i.a AND x[1] = t$i.b
         |                THEN list_concat(acc[1:len(acc)-1], [CAST(${base + i} AS INT)])
         |                ELSE list_concat(acc, x) END) AS tokens
         |  FROM d$i, t$i),
         |s${i + 1} AS (SELECT CAST(sum(len(tokens)) AS BIGINT) AS total FROM d${i + 1})"""
        .stripMargin
    }.mkString(",\n")

  private val ShingleN = 3
  private val MinHashK = 16
  private val MinHashBands = 4

  /** Shared CTE prefix: tokens → distinct 3-gram shingles → 31-bit shingle
    * hashes → 16 minhash minima (s0..s15).
    */
  private def duckShingleCtes: String = {
    val sigs = (0 until MinHashK).map { i =>
      val a = Hashing.minHashA(i); val b = Hashing.minHashB(i)
      s"list_min(list_transform(hs, h -> ($a * h + $b) % ${Hashing.MinHashP})) AS s$i"
    }.mkString(", ")
    s"""WITH tk AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
       |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(tk) >= $ShingleN
       |  THEN list_transform(generate_series(1, len(tk)-${ShingleN - 1}),
       |       j -> tk[j]||' '||tk[j+1]||' '||tk[j+2])
       |  ELSE CAST([] AS VARCHAR[]) END) AS sh FROM tk),
       |hs AS (SELECT doc_id, list_transform(sh, s -> ${dH31("s")}) AS hs FROM sh),
       |sig AS (SELECT doc_id, $sigs FROM hs)""".stripMargin
  }

  /** Band-hash SQL for band b over sig columns s{4b}..s{4b+3} — twin of
    * [[Dedupe.bandHashes]].
    */
  private def duckBand(b: Int): String = {
    val r = MinHashK / MinHashBands
    val terms = (0 until r).map(i => s"s${b * r + i}*${31L * (i + 1)}").mkString(" + ")
    s"(($terms) % ${Hashing.MinHashP})"
  }

  // ---------- hyperplane signs for embedding LSH (shared source of truth) ----------

  /** Hyperplane signs — same source of truth as the Spark side. */
  def planeSignJvm(j: Int, i: Int): Double = Similarity.planeSignJvm(j, i)

  private val EmbedDim = 64
  private val EmbedBits = 4

  private def duckSignList(j: Int): String =
    (0 until EmbedDim).map(i => planeSignJvm(j, i).toString).mkString("[", ",", "]")

  private def duckBucketExpr(vec: String, bits: Int = EmbedBits): String =
    (0 until bits).map { j =>
      val proj = dFoldSum(
        s"list_transform(generate_series(1,$EmbedDim), i -> $vec[i]::DOUBLE * (${duckSignList(j)})[i])")
      s"(CASE WHEN $proj >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def duckDot(a: String, b: String, dim: Int = EmbedDim): String =
    dFoldSum(s"list_transform(generate_series(1,$dim), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)")

  private def duckCos(a: String, b: String, dim: Int = EmbedDim): String =
    s"round(${duckDot(a, b, dim)} / (sqrt(${duckDot(a, a, dim)}) * sqrt(${duckDot(b, b, dim)})), 6)"

  /** Unrounded cosine — for oracle stages whose *ordering* must match Spark
    * exactly (cell assignment / probe selection), where both engines compute
    * bit-identical doubles via the same fold.
    */
  private def duckCosRaw(a: String, b: String, dim: Int = EmbedDim): String =
    s"(${duckDot(a, b, dim)} / (sqrt(${duckDot(a, a, dim)}) * sqrt(${duckDot(b, b, dim)})))"

  // ---------- stopwords ----------

  private def duckIn(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ",", ")")

  // ---------- greedy sequence-packing fold (twin of TokenOps.packSequences) ----------

  private def duckPackSql(budget: Int, shards: Int): String = {
    val shardExpr =
      if (shards == 1) "CAST(0 AS INTEGER)"
      else s"CAST(${dH15("doc_id")} % $shards AS INTEGER)"
    s"""WITH raw AS (SELECT doc_id, source, n_tok, $shardExpr AS shard
       |  FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen10k/*.parquet')),
       |g AS (SELECT source, shard, list(struct_pack(d := doc_id, n := n_tok) ORDER BY doc_id) AS xs
       |      FROM raw GROUP BY source, shard),
       |f AS (SELECT source, shard,
       |  list_reduce(
       |    list_prepend([struct_pack(d := '', n := 0, cum := CAST(0 AS BIGINT), bin := CAST(0 AS BIGINT))],
       |      list_transform(xs, x -> [struct_pack(d := x.d, n := x.n, cum := CAST(0 AS BIGINT), bin := CAST(0 AS BIGINT))])),
       |    (acc, x) -> acc ||
       |      [struct_pack(d := x[1].d, n := x[1].n,
       |        cum := CASE WHEN acc[len(acc)].cum + x[1].n > $budget AND acc[len(acc)].cum > 0
       |                    THEN CAST(x[1].n AS BIGINT) ELSE acc[len(acc)].cum + x[1].n END,
       |        bin := CASE WHEN acc[len(acc)].cum + x[1].n > $budget AND acc[len(acc)].cum > 0
       |                    THEN acc[len(acc)].bin + 1 ELSE acc[len(acc)].bin END)]) AS packed
       |  FROM g)
       |SELECT source, shard, u.d AS doc_id, u.n AS n_tok, u.bin AS bin
       |FROM f, unnest(packed) AS t(u) WHERE u.d <> ''""".stripMargin
  }

  // ======================= queries =======================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- token counting: whitespace + BPE-ish regex (TextOps) ----
    "t_text_tokens" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.wordCount(col("text")).cast("long").as("n_words"),
        TextOps.bpeCount(col("text")).cast("long").as("n_bpe"))
    }),

    // ---- quality scoring (Gopher-style component metrics + keep flag) ----
    "t_text_quality" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val qc = TextOps.qualityColumns(col("text"))
      d.select(col("doc_id") +: qc.map { case (n, c) => c.as(n) } :+
        TextOps.qualityKeep(col("text")).as("keep"): _*)
    }),

    // ---- language-ID (stopword-profile argmax heuristic) ----
    "t_text_langid" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        TextOps.langId(col("text")).as("pred_lang"))
    }),

    // ---- document fingerprint (rolling hash over token hashes) ----
    "t_text_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
    }),

    // ---- repetition signals (Gopher dup-word / top-bigram fractions) ----
    "t_text_repetition" -> ((s, dir) => {
      TextOps.repetitionStats(Tables.documents(s, dir), col("text"), col("doc_id"))
    }),

    // ---- CCNet-style unigram LM perplexity filter (corpus-trained LM,
    //      integer micro-nat costs → order-independent cross-entropy) ----
    "t_lm_perplexity" -> ((s, dir) => {
      TextOps.lmPerplexity(Tables.documents(s, dir), col("text"), col("doc_id"))
    }),

    // ---- self-trained naive-Bayes quality classifier (Gopher-gate seed
    //      labels -> add-1 unigram NB -> integer micro-nat log-odds) ----
    "t_quality_classifier" -> ((s, dir) => {
      TextOps.nbQualityClassifier(Tables.documents(s, dir), col("text"), col("doc_id"))
    }),

    // ---- OOV-rate / vocab-coverage audit (top-V corpus vocab broadcast;
    //      integer-ppm rate — the tokenizer-budget check) ----
    "t_oov_rate" -> ((s, dir) => {
      TextOps.oovRate(Tables.documents(s, dir), col("text"), col("doc_id"),
        vocabSize = 20)
    }),

    // ---- language-ID confusion matrix (predicted vs labeled counts —
    //      the accuracy audit a lang-gated pipeline publishes) ----
    "t_lang_confusion" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"), TextOps.langId(col("text")).as("pred_lang"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
    }),

    // ---- soft quality sampling (classifier-score-weighted keep rate,
    //      hash-decided — the GPT-3 appendix rule, replay-stable) ----
    "t_quality_sample" -> ((s, dir) => {
      TextOps.qualitySample(Tables.documents(s, dir), col("text"), col("doc_id"))
    }),

    // ---- DSIR importance resampling (Xie et al. 2023): hashed-ngram LM
    //      log-ratio weights toward the lang='en' target slice, Gumbel
    //      top-k draw — all integer micro-nats, replay-stable ----
    "t_dsir_sample" -> ((s, dir) => {
      TextOps.dsirSample(Tables.documents(s, dir), col("text"), col("doc_id"),
        col("lang") === "en")
    }),

    // ---- log-template mining (Drain masking core over synthesized log
    //      lines: event_type + ids + an IP + a hex request id) ----
    "t_log_templates" -> ((s, dir) => {
      val msg = concat(col("event_type"), lit(" user="), col("user_id"),
        lit(" from 10."), pmod(col("user_id"), lit(5)),
        lit("."), pmod(col("event_id"), lit(256)), lit(".9 req="),
        substring(md5(col("event_id").cast("string")), 1, 12))
      TextOps.logTemplates(Tables.events(s, dir), msg, topK = 10)
    }),

    // ---- per-source score calibration: exact percent-rank + curriculum
    //      bucket via the score-table cumsum (never a corpus-wide window) ----
    "t_score_calibrate" -> ((s, dir) => {
      TextOps.scoreCalibrate(Tables.documents(s, dir), col("doc_id"),
        col("source"), length(col("text")), buckets = 10)
    }),

    // ---- inverted index: token → df + capped sorted posting list ----
    "t_inverted_index" -> ((s, dir) => {
      TextOps.invertedIndex(Tables.documents(s, dir), col("text"),
        col("doc_id"), minDf = 2, maxPostings = 20)
        .select(col("token"), col("df"),
          array_join(col("postings").cast("array<string>"), ",").as("postings"))
    }),

    // ---- largest-remainder budget allocation (Hamilton's method):
    //      per-source budgets that sum EXACTLY to the global budget ----
    "p_budget_alloc" -> ((s, dir) => {
      graft.tokens.TokenOps.allocateBudget(
        Tables.documents(s, dir), col("source"), budget = 1000L)
    }),

    // ---- corpus datasheet card (one-row release audit: totals, dup rate,
    //      quality pass rate, dominant language — all integer/ppm) ----
    "t_corpus_card" -> ((s, dir) => {
      TextOps.corpusCard(Tables.documents(s, dir), col("text"), col("lang"))
    }),

    // ---- source-distribution drift audit (per-source integer-ppm L2
    //      between deterministic snapshot halves over the top-V vocab) ----
    "t_source_drift" -> ((s, dir) => {
      TextOps.sourceDrift(Tables.documents(s, dir), col("text"), col("doc_id"),
        topV = 64)
    }),

    // ---- URL canonicalization + canonical-url dedup (crawl identity
    //      folding: case/ports/slashes/tracking/param order/fragments) ----
    "t_url_canon" -> ((s, _) => {
      graft.text.Urls.canonDupStats(
        graft.text.Urls.genUrls(s, rows = 4000, parts = 8).toDF())
    }),

    // ---- TF-IDF top-k keywords (corpus IDF, integer scores, group-limit
    //      top-k) ----
    "t_tfidf_topk" -> ((s, dir) => {
      TextOps.tfidfTopK(Tables.documents(s, dir), col("text"), col("doc_id"), k = 3)
    }),

    // ---- BM25 retrieval top-k (Okapi lexical ranker; query terms prune
    //      the tf table BEFORE df aggregates — query-vocab-sized model) ----
    "t_bm25_topk" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextOps.bm25TopK(docs, col("text"), col("doc_id"),
        docs.filter(col("doc_id") < 5), col("doc_id"), col("text"), k = 10)
    }),

    // ---- deterministic exact-n per-source sample (hash-order top-n,
    //      map-side WindowGroupLimit) ----
    "p_stratified_sample" -> ((s, dir) => {
      graft.tokens.TokenOps.stratifiedSample(
          Tables.documents(s, dir).select("doc_id", "source"),
          col("source"), col("doc_id"), perGroup = 50)
        .select("doc_id", "source", "sample_rank")
    }),

    // ---- HTML text extraction (boilerplate strip + link/tag density;
    //      the web-crawl pipeline's first stage — fully narrow) ----
    "t_html_extract" -> ((s, _) => {
      graft.text.Html.extract(
        graft.text.Html.genHtmlDocs(s, rows = 4000, parts = 8).toDF(),
        col("html"), col("doc_id"))
    }),

    // ---- link-graph PageRank (3 iterations, integer micro-ranks — the
    //      crawl-frontier / quality-prior signal) ----
    "t_link_rank" -> ((s, _) => {
      graft.text.Html.linkRank(
        graft.text.Html.genHtmlDocs(s, rows = 4000, parts = 8).toDF(),
        col("html"), col("doc_id"), iters = 3)
    }),

    // ---- PII detection + redaction (email/IP/SSN/phone; fully narrow
    //      regex scrub — the curation stage before anything else) ----
    "t_pii_scrub" -> ((s, _) => {
      graft.text.Pii.scrub(
        graft.text.Pii.genPiiDocs(s, rows = 4000, parts = 8).toDF(),
        col("text"), col("doc_id"))
    }),

    // ---- BPE merge-candidate counting: global top-k adjacent token pairs
    //      (the map-side-combinable inner loop of BPE vocab training) ----
    "p_bpe_pairs" -> ((s, _) => {
      graft.tokens.TokenOps.bpePairCounts(
        graft.tokens.Winnow.genWithBoilerplate(s, rows = 3000, parts = 8).toDF(),
        k = 64)
    }),

    // ---- one full BPE training iteration: count pairs → global argmax
    //      (k=1 driver rows) → apply everywhere (native BpeMerge, narrow) ----
    "p_bpe_merge" -> ((s, _) => {
      graft.tokens.TokenOps.applyTopBpeMerge(
        graft.tokens.Winnow.genWithBoilerplate(s, rows = 3000, parts = 8).toDF(),
        newId = 50257)
    }),

    // ---- full BPE vocab induction: 3 merge rounds — count → argmax →
    //      apply, later rounds composing earlier merge ids; output is the
    //      trained merge table + per-round compression trace ----
    "p_bpe_train" -> ((s, _) => {
      graft.tokens.TokenOps.trainBpe(
        graft.tokens.Winnow.genWithBoilerplate(s, rows = 3000, parts = 8).toDF(),
        iters = 3, baseId = 50257)
    }),

    // ---- tokenizer inference: apply the trained 3-merge table in
    //      training order — one narrow chain of native BpeMerge passes ----
    "p_bpe_encode" -> ((s, _) => {
      val d = graft.tokens.Winnow.genWithBoilerplate(s, rows = 3000, parts = 8).toDF()
      val mt = graft.tokens.TokenOps.trainBpe(d, iters = 3, baseId = 50257)
        .select("it", "merge_a", "merge_b", "new_id").collect()
        .sortBy(_.getLong(0))
        .map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
      graft.tokens.TokenOps.applyMergeTable(d, mt)
    }),

    // ---- SemDeDup: embedding-cluster-bounded semantic dedup (deterministic
    //      seeded cells; in-cell pairs only — never corpus-wide) ----
    "d_semdedup" -> ((s, dir) => {
      Similarity.semDedup(Tables.embeddings(s, dir), col("vec_id"),
        col("embedding"), tau = 0.3, nlist = 16)
    }),

    // ---- cluster-balanced diversity sampling (exact-n per embedding cell;
    //      hash-order selection, map-side group limit) ----
    "d_diversity_sample" -> ((s, dir) => {
      Similarity.diversitySample(Tables.embeddings(s, dir), col("vec_id"),
        col("embedding"), perCell = 5, nlist = 16)
    }),

    // ---- benchmark decontamination (3-gram overlap vs a benchmark set) ----
    "d_contamination" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedupe.contamination(docs, col("text"), col("doc_id"),
        bench = docs.filter(col("doc_id") < 5), benchText = col("text"), n = ShingleN)
    }),

    // ---- greedy sequence packing into fixed token budgets (LLM batching) ----
    "p_pack_sequences" -> ((s, _) => {
      import graft.core.{Gen, GenConfig}
      graft.tokens.TokenOps.packSequences(
        Gen.tokenseq(s, GenConfig(rows = 10000, parts = 8)).toDF()
          .select(col("doc_id"), col("n_tok"), col("source")),
        budget = 8192).toDF()
    }),

    // ---- sharded packing: pack key (source, h15(doc_id) % 4) — the skew
    //      fix that keeps a hot source from serializing through one task ----
    "p_pack_sharded" -> ((s, _) => {
      import graft.core.{Gen, GenConfig}
      graft.tokens.TokenOps.packSequences(
        Gen.tokenseq(s, GenConfig(rows = 10000, parts = 8)).toDF()
          .select(col("doc_id"), col("n_tok"), col("source")),
        budget = 8192, shards = 4).toDF()
    }),

    // ---- deterministic source-mixing sampler (training mixture rebalance;
    //      hash-keyed so the sample is replay-stable and oracle-exact) ----
    "p_mix_sample" -> ((s, _) => {
      import graft.core.{Gen, GenConfig}
      graft.tokens.TokenOps.mixStats(
        Gen.tokenseq(s, GenConfig(rows = 10000, parts = 8)).toDF()
          .select(col("doc_id"), col("n_tok"), col("source")))
    }),

    // ---- deterministic train/val/test split: hash-bucketed holdout that
    //      survives appends/resharding (narrow; salt-isolated from mix) ----
    "p_split_assign" -> ((s, _) => {
      import graft.core.{Gen, GenConfig}
      graft.tokens.TokenOps.assignSplit(
          Gen.tokenseq(s, GenConfig(rows = 10000, parts = 8)).toDF()
            .select(col("doc_id"), col("n_tok"), col("source")),
          valPpm = 20000, testPpm = 10000)
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok").cast("long")).as("n_toks"))
    }),

    // ---- cross-snapshot diff (added/removed/changed between two corpus
    //      commits; skinny hash projections, one full-outer join) ----
    "d_snapshot_diff" -> ((s, _) => {
      graft.tokens.TokenOps.snapshotDiff(
        graft.tokens.Winnow.genWithBoilerplate(s, rows = 3000, parts = 8).toDF(),
        graft.tokens.Winnow.genSnapshotNew(s, rows = 3000, parts = 8))
    }),

    // ---- Count-Min sketch heavy hitters (mergeable counter table,
    //      constant shuffle; estimates exactly SQL-reproducible) ----
    "v_countmin" -> ((s, _) => {
      val toks = graft.tokens.Winnow.genWithBoilerplate(s, rows = 3000, parts = 8)
        .toDF().select(explode(col("tokens")).as("ti"))
        .select(col("ti").cast("long").as("t"))
      val sk = toks.agg(
        graft.sketch.CountMin.agg(col("t"), depth = 4, width = 1024).as("sk"))
      val top = toks.groupBy(col("t")).agg(count(lit(1)).as("true_n"))
        .orderBy(col("true_n").desc, col("t")).limit(32)
      top.crossJoin(broadcast(sk))
        .select(col("t"), col("true_n"),
          graft.sketch.CountMin.estimate(col("sk"), col("t"), 4).as("est_n"))
    }),

    // ---- Z-order (Morton) layout value: bit-interleave two key columns
    //      so range-partitioned writes bound BOTH columns per file — the
    //      two-column data-skipping layout (Delta OPTIMIZE ZORDER) ----
    "p_zorder" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val x = pmod(col("user_id"), lit(65536L))
      val y = pmod(col("event_id"), lit(65536L))
      val zv = graft.ops.Layout.zValue(x, y, 16)
      ev.select(col("event_id"), zv.as("zv"),
        shiftright(zv, 24).as("cell"))
    }),

    // ---- small-file compaction planner (Iceberg rewrite_data_files /
    //      Delta OPTIMIZE bin packing) over a derived file inventory ----
    "p_compaction_plan" -> ((s, dir) => {
      val inv = Tables.events(s, dir)
        .groupBy(col("event_type").as("p"),
          concat(lit("f"), lpad(pmod(col("event_id"), lit(200)).cast("string"),
            3, "0")).as("f"))
        .agg((count(lit(1)) * 517L).as("b"))
      graft.ops.Layout.compactionGroups(inv, col("p"), col("f"), col("b"),
        targetBytes = 15000L)
    }),

    // ---- HyperLogLog distinct-count sketch (mergeable max-register
    //      aggregate; constant shuffle vs count(distinct)'s key-keyed
    //      shuffle; exact count alongside = the accuracy audit) ----
    "v_hll" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.groupBy(col("event_type")).agg(
          graft.sketch.Hll.agg(col("user_id"), p = 8).as("sk"),
          countDistinct(col("user_id")).cast("long").as("exact_n"))
        .select(col("event_type"), col("exact_n"),
          round(graft.sketch.Hll.estimate(col("sk"), p = 8) + lit(1e-9), 4)
            .as("est_n"))
    }),

    // ---- sliding-window cardinality from PERSISTED hourly sketches:
    //      trailing-3h distinct users per type by merging 256-byte hourly
    //      HLL sketches — raw rows are scanned exactly once; every window
    //      after that is sketch-byte arithmetic (the rollup path) ----
    "v_hll_sliding" -> ((s, dir) => {
      import graft.sketch.Hll
      val hourly = Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(Hll.agg(col("user_id"), p = 8).as("sk"))
      val targets = hourly.select(col("event_type"), col("h").as("window_h"))
      val contrib = hourly.withColumn("window_h", explode(array(
        col("h"),
        col("h") + expr("INTERVAL 1 HOUR"),
        col("h") + expr("INTERVAL 2 HOUR"))))
      contrib.join(targets, Seq("event_type", "window_h"))
        .groupBy(col("event_type"), col("window_h"))
        .agg(Hll.mergeAgg(col("sk"), p = 8).as("sk3"))
        .select(col("event_type"), col("window_h"),
          round(Hll.estimate(col("sk3"), p = 8) + lit(1e-9), 4).as("est_n"))
    }),

    // ---- PMI top collocations (adjacent-pair mutual information in
    //      integer micronats — the tokenizer-merge / MWE audit) ----
    "p_pmi_pairs" -> ((s, _) => {
      graft.tokens.TokenOps.pmiTopPairs(
        graft.tokens.Winnow.genWithBoilerplate(s, rows = 3000, parts = 8).toDF(),
        k = 40, minCount = 5L)
    }),

    // ---- vocabulary pruning / UNK remap (fully-ordered top-V cut; narrow
    //      remap with the vocab as a plan-time literal) ----
    "p_vocab_prune" -> ((s, _) => {
      graft.tokens.TokenOps.pruneVocab(
        graft.tokens.Winnow.genWithBoilerplate(s, rows = 3000, parts = 8).toDF(),
        vocabSize = 32, unkId = 50257)
    }),

    // ---- deterministic global training-order shuffle: exact permutation
    //      index via bucketed rank (per-bucket window + prefix-sum offsets;
    //      never a single-partition global sort) ----
    "p_global_shuffle" -> ((s, _) => {
      import graft.core.{Gen, GenConfig}
      graft.tokens.TokenOps.shuffleOrder(
        Gen.tokenseq(s, GenConfig(rows = 10000, parts = 8)).toDF()
          .select(col("doc_id"), col("n_tok"), col("source")),
        buckets = 16)
        .select(col("doc_id"), col("source"), col("order_idx"))
    }),

    // ---- context-window chunking: doc → maxLen-token training windows
    //      with overlap (fully narrow: sequence + slice + one explode) ----
    "p_chunk_sequences" -> ((s, _) => {
      graft.tokens.TokenOps.chunkSequences(
        graft.tokens.Winnow.genWithBoilerplate(s, rows = 3000, parts = 8).toDF(),
        maxLen = 128, overlap = 32)
        .select(col("doc_id"), col("source"), col("chunk_idx"), col("chunk_len"),
          graft.tokens.TokenOps.contentHash(col("chunk_tokens")).as("chunk_hash"))
    }),

    // ---- token-level benchmark decontamination: corpus docs sharing any
    //      13-gram with the bench set (bench grams broadcast; corpus scans
    //      once, narrow gram hashing before its only shuffle) ----
    "d_token_decontam" -> ((s, _) => {
      val corpus = graft.tokens.Winnow.genWithBoilerplate(s, rows = 3000, parts = 8).toDF()
      val bench = graft.tokens.Winnow.genWithBoilerplate(s, rows = 200, parts = 4,
        startId = 5000000L).toDF()
      graft.tokens.TokenOps.tokenContamination(corpus, bench, n = 13)
    }),

    // ---- incremental ingest dedup: bloom fast-pass (no false negatives)
    //      + exact anti join on the tiny maybe-lane; mBits deliberately
    //      small here so false positives actually exercise the resolver ----
    "d_incr_dedupe" -> ((s, _) => {
      val all = graft.tokens.Winnow.genWithDups(s, corpusRows = 4000,
        batchRows = 1500, parts = 8).toDF()
      graft.tokens.TokenOps.incrementalDedupe(
          all.filter(col("lane") === "corpus"), all.filter(col("lane") === "batch"),
          mBits = 1L << 14, k = 3)
        .select(col("doc_id"), col("source"),
          graft.tokens.TokenOps.contentHash(col("tokens")).as("content_hash"))
    }),

    // ---- substring-level dedup: winnowing fingerprints over token runs
    //      (alignment-free; selection happens BEFORE the only shuffle) ----
    "d_substring_dup" -> ((s, _) => {
      graft.tokens.Winnow.dupStats(
        graft.tokens.Winnow.genWithBoilerplate(s, rows = 3000, parts = 8).toDF())
    }),

    // ---- COMPOSED web-curation pipeline: HTML extract → density/length
    //      gates → PII scrub → exact dedup, each stage already oracled ----
    "d_web_pipeline" -> ((s, _) => {
      graft.text.Html.webPipeline(
        graft.text.Html.genWebPages(s, rows = 4000, parts = 8).toDF())
    }),

    // ---- exact duplicate-run REMOVAL (Lee et al. ExactSubstr at k-gram
    //      granularity: first occurrence wins, losing runs deleted) ----
    "d_substring_strip" -> ((s, _) => {
      graft.tokens.Winnow.removeDuplicateRuns(
        graft.tokens.Winnow.genWithBoilerplate(s, rows = 3000, parts = 8).toDF())
    }),

    // ---- paragraph-level dedup, first occurrence wins (MassiveText-style;
    //      skew-safe min-struct agg + streamed join, no window) ----
    "d_para_dedupe" -> ((s, _) => {
      graft.text.ParagraphDedup.dedupeFirstWins(
        graft.text.ParagraphDedup.genParaDocs(s, rows = 4000, parts = 8).toDF())
    }),

    // ---- paragraph boilerplate strip: every copy of any paragraph seen in
    //      >= 3 distinct docs is removed (CCNet-style frequency policy) ----
    "d_para_common" -> ((s, _) => {
      graft.text.ParagraphDedup.stripCommon(
        graft.text.ParagraphDedup.genParaDocs(s, rows = 4000, parts = 8).toDF(),
        minDocs = 3)
    }),

    // ---- corpus unigram top-k (vocab coverage / boilerplate audit):
    //      explode → map-side-combined count → deterministic total order ----
    "t_token_unigrams" -> ((s, _) => {
      graft.tokens.Winnow.genWithBoilerplate(s, rows = 3000, parts = 8).toDF()
        .select(explode(col("tokens")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(50)
    }),

    // ---- exact dedup (hash-groupBy, smallest-id representative) ----
    "d_dedupe_exact" -> ((s, dir) => {
      Dedupe.exact(Tables.documents(s, dir), col("text"), col("doc_id"))
        .select(col("doc_id"), col("text_hash"))
    }),

    // ---- MinHash signatures: per-doc LSH band hashes ----
    "d_minhash_bands" -> ((s, dir) => {
      val sigT = Dedupe.minhashSigTable(Tables.documents(s, dir),
        col("text"), col("doc_id"), ShingleN, MinHashK)
      val bands = Dedupe.bandHashes((0 until MinHashK).map(i => col(s"s$i")), MinHashBands)
      sigT.select(col("id").as("doc_id") +:
        bands.zipWithIndex.map { case (c, b) => c.as(s"b$b") }: _*)
    }),

    // ---- MinHash+LSH near-dup pairs, Jaccard-verified ----
    "d_minhash_pairs" -> ((s, dir) => {
      Dedupe.minhashNearDups(Tables.documents(s, dir), col("text"), col("doc_id"),
        n = ShingleN, k = MinHashK, bands = MinHashBands, threshold = 0.2)
    }),

    // ---- SimHash signature ----
    "d_simhash" -> ((s, dir) => {
      Dedupe.simhashTable(Tables.documents(s, dir), col("text"), col("doc_id"))
        .select(col("id").as("doc_id"), col("sim"))
    }),

    // ---- SimHash near-dup pairs (hamming <= 3 via 4-band pigeonhole) ----
    "d_simhash_pairs" -> ((s, dir) => {
      // width pinned (= autoBandBits at this corpus size) so the DuckDB
      // oracle's re-derivation stays bit-identical
      Dedupe.simhashNearDups(Tables.documents(s, dir), col("text"), col("doc_id"),
        maxDist = 3, bandBits = 8)
    }),

    // ---- near-dup clusters: pairs → connected components (the dedup
    //      GROUPING step — component id = deterministic representative) ----
    "d_neardup_components" -> ((s, dir) => {
      // RAW candidate stream (no pair-distinct shuffle) — components
      // dedupes edges once internally
      val pairs = Dedupe.simhashNearDupCandidates(Tables.documents(s, dir),
        col("text"), col("doc_id"), maxDist = 3, bandBits = 8)
      Dedupe.components(pairs).select(col("id").as("doc_id"), col("component"))
    }),

    // ---- near-dup dedup: keep one survivor per cluster ----
    "d_neardup_dedupe" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedupe.simhashNearDupCandidates(docs, col("text"), col("doc_id"),
        maxDist = 3, bandBits = 8)
      Dedupe.dedupeByPairs(docs, col("doc_id"), pairs).select(col("doc_id"))
    }),

    // ---- unicode normalization (pre-dedup canonicalization) ----
    "t_text_normalize" -> ((s, dir) => {
      // decomposed "e"+U+0301 must compose to U+00E9 under NFC
      val decomposed = concat(col("text"), lit(" cafe\u0301"))
      Tables.documents(s, dir).select(col("doc_id"),
        graft.functions.Vrl.normalizeUnicode(decomposed).as("nfc"),
        (length(graft.functions.Vrl.normalizeUnicode(decomposed)) <
          length(decomposed)).as("composed"))
    }),

    // ---- embedding cosine near-dups within LSH sign buckets ----
    "d_embed_neardup" -> ((s, dir) => {
      Similarity.cosineNearDups(Tables.embeddings(s, dir), col("vec_id"),
        col("embedding"), threshold = 0.3, nBits = EmbedBits)
    }),

    // ---- banded (OR-amplified) cosine LSH — the recall-preserving width
    //      lever for 100-TB corpora (see cosineNearDupsBanded scaladoc) ----
    "d_embed_banded" -> ((s, dir) => {
      Similarity.cosineNearDupsBanded(Tables.embeddings(s, dir), col("vec_id"),
        col("embedding"), threshold = 0.3, bands = 2, rowBits = EmbedBits)
    }),

    // ---- brute-force cosine top-k ANN (exact baseline) ----
    "d_ann_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10),
        col("vec_id"), col("embedding"), k = 5)
    }),

    // ---- LSH-bucketed ANN (scale path; hyperplanes are deterministic, so
    //      the DuckDB twin reproduces buckets + multiprobe exactly) ----
    "d_ann_lsh" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 10),
        col("vec_id"), col("embedding"), k = 5, nBits = 8)
    }),

    // ---- PQ ANN (compressed-domain scale path: corpus becomes m codeword
    //      ids per vector — the embedding matrix is dropped after encode;
    //      codebooks are deterministic hash-seeded, so the DuckDB twin
    //      reproduces codes and ADC distances bit-for-bit) ----
    "d_ann_pq" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.pqTopK(e, e.filter(col("vec_id") < 10),
        col("vec_id"), col("embedding"), k = 5, m = 4, ksub = 16)
    }),

    // ---- IVF-PQ ANN (the composed Faiss-style scale architecture:
    //      cell-pruned probe join + compressed-domain ADC; nlist = ksub =
    //      16 pins both stages to the same deterministic seed set) ----
    "d_ann_ivfpq" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 10),
        col("vec_id"), col("embedding"), k = 5, nlist = 16, nprobe = 4,
        m = 4, ksub = 16)
    }),

    // ---- end-to-end curation pipeline: quality filter → lang-ID →
    //      exact dedup → per-(pred_lang, source) corpus stats ----
    "d_curation_pipeline" -> ((s, dir) => {
      val kept = Tables.documents(s, dir)
        .filter(TextOps.qualityKeep(col("text")))
        .withColumn("pred_lang", TextOps.langId(col("text")))
      Dedupe.exact(kept, col("text"), col("doc_id"))
        .groupBy(col("pred_lang"), col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(TextOps.wordCount(col("text")).cast("long")).as("total_words"))
    }),

    // ---- full curation: quality + repetition + decontamination gates →
    //      lang-ID → exact dedup → per-(pred_lang, source) corpus stats.
    //      The one-call "curate my corpus" composition of every gate.
    //      Repetition + contamination signals come from ONE fused corpus
    //      pass (Curation.gateSignals) — 2 unfiltered scans of `documents`
    //      total instead of 4 (the r2 plan), plan-pinned in PlanSpec. ----
    "d_curation_full" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val gates = graft.text.Curation.gateSignals(docs, col("text"), col("doc_id"),
        bench = docs.filter(col("doc_id") < 5), benchText = col("text"), n = ShingleN)
      val curated = docs.filter(TextOps.qualityKeep(col("text")))
        .join(gates, Seq("doc_id"), "left")
        // same rounded gate formula as repetitionStats / the oracle; the
        // quality gate guarantees n_words >= 10, so the frac denominator is
        // live and the left join only misses gram-free docs (keep: 0, 0)
        .filter(
          coalesce(col("n_overlap"), lit(0L)) === 0 &&
          round(lit(2.0) * coalesce(col("top_bigram_n"), lit(0L)) /
            TextOps.wordCount(col("text")).cast("double"), 6) <= 0.2)
        .drop("top_bigram_n", "n_overlap")
        .withColumn("pred_lang", TextOps.langId(col("text")))
      Dedupe.exact(curated, col("text"), col("doc_id"))
        .groupBy(col("pred_lang"), col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          round(avg(TextOps.wordCount(col("text")).cast("double")) + lit(1e-9), 4)
            .as("avg_words"))
    }),

    // ---- IVF ANN (hash-seeded deterministic centroids + nprobe search;
    //      the ML-KMeans variant stays in DataOpsSpec for recall testing) ----
    "d_ann_ivf" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.ivfTopKSeeded(e, e.filter(col("vec_id") < 10),
        col("vec_id"), col("embedding"), k = 5, nlist = 16, nprobe = 4)
    }),

    // ---- multimodal: synthesized binary media → per-kind stats ----
    // (generator is deterministic; Verify materializes the same rows to
    //  parquet, so the DuckDB oracle reads the identical input)
    // rounding + the +1e-9 decimal-lattice nudge on the averages is applied
    // HERE, at the oracle-comparison surface — the library emits raw doubles
    "m_media_stats" -> ((s, _) => {
      graft.multimodal.Multimodal.mediaStats(
        graft.multimodal.Multimodal.genMedia(s, rows = 2000, parts = 8))
        .select(col("kind"), col("n"), col("total_bytes"),
          round(col("avg_w") + lit(1e-9), 4).as("avg_w"),
          round(col("avg_h") + lit(1e-9), 4).as("avg_h"),
          col("total_frames"))
    }),

    // ---- multimodal: REAL WAV decode → audio curation features ----
    "m_audio_features" -> ((s, _) => {
      graft.multimodal.Multimodal.decodeAudio(
          graft.multimodal.Multimodal.genMedia(s, rows = 2000, parts = 8))
        .toDF()
        .select(col("media_id"), col("sample_rate"), col("n_samples"),
          round(col("rms") + lit(1e-9), 4).as("rms"),
          round(col("zcr") + lit(1e-9), 4).as("zcr"))
    }),

    // ---- multimodal: decode → feature-extract → ANN over media features ----
    // ---- perceptual image dedup fingerprint (aHash): original images ∪
    //      their 16×16 resized copies — resize-invariant by construction,
    //      so each original groups with its copy under exact hash-groupBy ----
    "m_image_ahash" -> ((s, _) => {
      import s.implicits._
      val imgs = graft.multimodal.Multimodal.genMedia(s, rows = 2000, parts = 8)
        .filter(_.kind == "image")
      val resized = graft.multimodal.Multimodal.resizeImages(imgs, 16, 16)
        .map(r => r.copy(media_id = r.media_id + 100000))
      graft.multimodal.Multimodal.imageAHash(imgs.union(resized)).toDF()
    }),

    "m_media_knn" -> ((s, _) => {
      val feats = graft.multimodal.Multimodal.decodeImages(
        graft.multimodal.Multimodal.genMedia(s, rows = 2000, parts = 8))
        .select(col("media_id").as("vec_id"), col("histogram").as("embedding"))
      Similarity.bruteForceTopK(feats, feats.filter(col("vec_id") < 30),
        col("vec_id"), col("embedding"), k = 3)
    })
  )

  def oracleSql: Map[String, String] = Map(

    "t_text_tokens" ->
      s"""SELECT doc_id, len(string_split(text,' ')) AS n_words,
         | len(regexp_extract_all(text, '${TextOps.BpePattern}')) AS n_bpe
         |FROM documents""".stripMargin,

    "t_text_quality" -> {
      val allStops = duckIn(TextOps.StopwordProfiles.flatMap(_._2))
      s"""SELECT doc_id, len(tk) AS n_words,
         | round(list_sum(list_transform(tk, t -> len(t)))::DOUBLE / len(tk)::DOUBLE, 4) AS mean_word_len,
         | round(len(list_filter(tk, t -> t IN $allStops))::DOUBLE / len(tk)::DOUBLE, 4) AS stopword_ratio,
         | round(len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / greatest(len(text),1)::DOUBLE, 4) AS symbol_ratio,
         | (len(tk) BETWEEN 10 AND 100000)
         |   AND (round(list_sum(list_transform(tk, t -> len(t)))::DOUBLE / len(tk)::DOUBLE, 4) BETWEEN 2 AND 12)
         |   AND (round(len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / greatest(len(text),1)::DOUBLE, 4) <= 0.2) AS keep
         |FROM (SELECT doc_id, text, string_split(text,' ') AS tk FROM documents)""".stripMargin
    },

    "t_text_langid" -> {
      val hits = TextOps.StopwordProfiles.map { case (lang, prof) =>
        s"len(list_filter(tk, t -> t IN ${duckIn(prof)})) AS h_$lang"
      }.mkString(", ")
      val langs = TextOps.StopwordProfiles.map(_._1)
      val best = s"greatest(${langs.map("h_" + _).mkString(",")})"
      val pick = langs.map(l => s"WHEN h_$l = $best AND $best > 0 THEN '$l'").mkString(" ")
      s"""SELECT doc_id, lang, (CASE $pick ELSE 'und' END) AS pred_lang
         |FROM (SELECT doc_id, lang, $hits
         |      FROM (SELECT doc_id, lang, string_split(text,' ') AS tk FROM documents))""".stripMargin
    },

    // confusion twin: the langid CTE re-aggregated per (label, prediction).
    "t_lang_confusion" -> {
      val hits = TextOps.StopwordProfiles.map { case (lang, prof) =>
        s"len(list_filter(tk, t -> t IN ${duckIn(prof)})) AS h_$lang"
      }.mkString(", ")
      val langs = TextOps.StopwordProfiles.map(_._1)
      val best = s"greatest(${langs.map("h_" + _).mkString(",")})"
      val pick = langs.map(l => s"WHEN h_$l = $best AND $best > 0 THEN '$l'").mkString(" ")
      s"""SELECT lang, pred_lang, count(*)::BIGINT AS n FROM (
         |  SELECT lang, (CASE $pick ELSE 'und' END) AS pred_lang
         |  FROM (SELECT lang, $hits
         |        FROM (SELECT lang, string_split(text,' ') AS tk FROM documents)))
         |GROUP BY lang, pred_lang""".stripMargin
    },

    "t_text_fingerprint" ->
      s"""SELECT doc_id,
         | list_reduce(list_prepend(CAST(0 AS BIGINT),
         |   list_transform(string_split(text,' '), t -> ${dH15("t")} % 1000003)),
         |   (acc, x) -> (acc*31 + x) % 2147483647) AS fp
         |FROM documents""".stripMargin,

    "d_dedupe_exact" ->
      s"""SELECT doc_id, ${dH15("text")} AS text_hash FROM documents
         |QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1""".stripMargin,

    "t_lm_perplexity" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |vocab AS (SELECT w, count(*)::BIGINT AS c FROM tok GROUP BY w),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM vocab),
        |cost AS (SELECT w, CAST(round((ln(n) - ln(CAST(c AS DOUBLE))) * 1000000 + 1e-9, 0) AS BIGINT) AS cost
        |         FROM vocab, tot),
        |doc AS (SELECT t.doc_id, count(*)::BIGINT AS n_words, CAST(sum(cost) AS BIGINT) AS sum_cost
        |        FROM tok t JOIN cost USING (w) GROUP BY t.doc_id)
        |SELECT doc_id, n_words, sum_cost, sum_cost // n_words AS ce_micronats,
        |       (sum_cost // n_words) < 9500000 AS keep
        |FROM doc""".stripMargin,

    "t_quality_classifier" -> QualityClassifierSql,

    // soft quality sampling twin: the classifier CTE + the identical
    // offset-division rate map and salted keep hash.
    "t_quality_sample" ->
      s"""WITH qc AS ($QualityClassifierSql)
         |SELECT doc_id, keep_ppm,
         |  (${dH15("concat('qs|', doc_id)")} % 1000000) < keep_ppm AS kept
         |FROM (SELECT doc_id,
         |        greatest(least(500000 +
         |          ((logodds_micronats + 4000000000000000) // 1000 - 4000000000000),
         |          1000000), 10000) AS keep_ppm
         |      FROM qc)""".stripMargin,

    // DSIR twin: identical hashed buckets, add-one LMs in integer
    // micro-nats, hash-Gumbel perturbation, rank-based top-k cut.
    "t_dsir_sample" ->
      s"""WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
         |b AS (SELECT doc_id, lang,
         |        ${dH15("concat('dsir|', w)")} % 4096 AS bk FROM tok),
         |raw AS (SELECT bk, count(*)::BIGINT AS c_r FROM b GROUP BY bk),
         |tgt AS (SELECT bk, count(*)::BIGINT AS c_t FROM b WHERE lang = 'en' GROUP BY bk),
         |lm AS (SELECT r.bk, r.c_r, coalesce(t.c_t, 0)::BIGINT AS c_t
         |       FROM raw r LEFT JOIN tgt t USING (bk)),
         |tots AS (SELECT CAST(sum(c_r) AS DOUBLE) AS n_r, CAST(sum(c_t) AS DOUBLE) AS n_t FROM lm),
         |lr AS (SELECT bk, CAST(round((ln((c_t + 1.0) / (n_t + 4096.0))
         |                            - ln((c_r + 1.0) / (n_r + 4096.0))) * 1000000 + 1e-9, 0) AS BIGINT) AS lr_mn
         |       FROM lm, tots),
         |dw AS (SELECT b.doc_id, CAST(sum(lr.lr_mn) AS BIGINT) AS weight_mn
         |       FROM b JOIN lr USING (bk) GROUP BY b.doc_id),
         |sc AS (SELECT doc_id, weight_mn, weight_mn +
         |         CAST(round(-ln(-ln(((${dH15("concat('dg|', doc_id)")} % 1000000) + 0.5) / 1000000.0))
         |                    * 1000000 + 1e-9, 0) AS BIGINT) AS score_mn
         |       FROM dw)
         |SELECT doc_id, weight_mn, score_mn,
         |       row_number() OVER (ORDER BY score_mn DESC, doc_id) <= 100 AS kept
         |FROM sc""".stripMargin,

    "t_tfidf_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |tf AS (SELECT doc_id, w, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, w),
        |dfx AS (SELECT w, count(*)::BIGINT AS df FROM tf GROUP BY w),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |idf AS (SELECT w, CAST(round((ln(n_docs + 1.0) - ln(CAST(df AS DOUBLE) + 1.0)) * 1000000 + 1e-9, 0) AS BIGINT) AS idf
        |        FROM dfx, tot),
        |scored AS (SELECT doc_id, tf.w AS w, tf.tf AS tf, tf.tf * idf.idf AS score
        |           FROM tf JOIN idf USING (w))
        |SELECT doc_id, w, tf, score, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rank
        |  FROM scored) WHERE rank <= 3""".stripMargin,

    // BM25 twin: the identical fixed-order score expression (same ln /
    // divide / multiply text; k1=1.2, k1+1 as the literal 2.2, 1-b as the
    // exact 0.25), micro-quantized then integer-summed per (query, doc).
    "t_bm25_topk" ->
      """WITH d AS (SELECT doc_id, text,
        |            CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
        |tok AS (SELECT doc_id, dl, unnest(string_split(text, ' ')) AS w FROM d),
        |tf AS (SELECT doc_id, w, count(*)::BIGINT AS tf, max(dl) AS dl
        |       FROM tok GROUP BY doc_id, w),
        |qt AS (SELECT DISTINCT query_id, w FROM (
        |         SELECT doc_id AS query_id, unnest(string_split(text, ' ')) AS w
        |         FROM documents WHERE doc_id < 5)),
        |tfq AS (SELECT * FROM tf WHERE w IN (SELECT w FROM qt)),
        |dfx AS (SELECT w, count(*)::BIGINT AS df FROM tfq GROUP BY w),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |          CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM d),
        |scored AS (SELECT q.query_id, tfq.doc_id,
        |  CAST(round((ln(n_docs + 1.0) - ln(CAST(df AS DOUBLE) + 1.0)) *
        |    ((CAST(tf AS DOUBLE) * 2.2) /
        |      (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(tfq.dl AS DOUBLE) / avgdl))) *
        |    1000000.0 + 1e-9, 0) AS BIGINT) AS s_micro
        |  FROM tfq JOIN dfx USING (w) JOIN qt q USING (w), tot),
        |agg AS (SELECT query_id, doc_id, CAST(sum(s_micro) AS BIGINT) AS score
        |        FROM scored GROUP BY query_id, doc_id)
        |SELECT query_id, doc_id, score, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |            ORDER BY score DESC, doc_id) AS BIGINT) AS rank FROM agg)
        |WHERE rank <= 10""".stripMargin,

    "p_stratified_sample" ->
      s"""SELECT doc_id, source, sample_rank FROM (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY ${dH15("concat('strat|', doc_id)")}, doc_id) AS sample_rank
         |  FROM documents) WHERE sample_rank <= 50""".stripMargin,

    "t_oov_rate" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |v AS (SELECT w FROM (SELECT w, count(*) AS n FROM tok GROUP BY w)
        |      QUALIFY row_number() OVER (ORDER BY n DESC, w) <= 20),
        |j AS (SELECT t.doc_id, CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
        |      FROM tok t LEFT JOIN v ON t.w = v.w)
        |SELECT doc_id, count(*)::BIGINT AS n_words, CAST(sum(oov) AS BIGINT) AS n_oov,
        |  (CAST(sum(oov) AS BIGINT) * 1000000) // count(*) AS oov_ppm
        |FROM j GROUP BY doc_id""".stripMargin,

    "p_budget_alloc" ->
      """WITH w AS (SELECT source, count(*) AS w FROM documents GROUP BY 1),
        |s AS (SELECT source, w, sum(w) OVER () AS tot FROM w),
        |b AS (SELECT source, w,
        |        (w * 1000) // tot AS base, (w * 1000) % tot AS rem,
        |        1000 - sum((w * 1000) // tot) OVER () AS spare
        |      FROM s),
        |r AS (SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, source)
        |                AS BIGINT) AS rk FROM b)
        |SELECT source, w,
        |       CAST(base + CASE WHEN rk <= spare THEN 1 ELSE 0 END AS BIGINT)
        |         AS budget
        |FROM r""".stripMargin,

    "t_inverted_index" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |pairs AS (SELECT DISTINCT doc_id, token FROM tok),
        |agg AS (
        |  SELECT token, count(*) AS df,
        |         list_slice(list_sort(list(doc_id)), 1, 20) AS plist
        |  FROM pairs GROUP BY token)
        |SELECT token, df, array_to_string(plist, ',') AS postings
        |FROM agg WHERE df >= 2""".stripMargin,

    "t_score_calibrate" ->
      """WITH base AS (
        |  SELECT doc_id, source, CAST(length(text) AS INT) AS score
        |  FROM documents),
        |c AS (SELECT source, score, count(*) AS n FROM base GROUP BY 1, 2),
        |cum AS (
        |  SELECT source, score,
        |         coalesce(sum(n) OVER (PARTITION BY source ORDER BY score
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
        |         sum(n) OVER (PARTITION BY source) AS tot
        |  FROM c)
        |SELECT b.doc_id, b.source, b.score,
        |       round(CASE WHEN cum.tot > 1
        |             THEN CAST(cum.below AS DOUBLE) / (cum.tot - 1)
        |             ELSE 0.0 END, 6) AS pct_rank,
        |       CAST(cum.below * 10 // cum.tot AS BIGINT) AS bucket
        |FROM base b JOIN cum ON b.source = cum.source AND b.score = cum.score""".stripMargin,

    "t_log_templates" ->
      """WITH m AS (
        |  SELECT event_type || ' user=' || user_id || ' from 10.' ||
        |         (user_id % 5) || '.' || (event_id % 256) || '.9 req=' ||
        |         substr(md5(CAST(event_id AS VARCHAR)), 1, 12) AS msg
        |  FROM events),
        |t AS (
        |  SELECT regexp_replace(regexp_replace(regexp_replace(msg,
        |           '\d+\.\d+\.\d+\.\d+', '<IP>', 'g'),
        |           '[0-9a-f]{12,}', '<HEX>', 'g'),
        |           '\d+', '<N>', 'g') AS template, msg
        |  FROM m)
        |SELECT template, count(*) AS n, min(msg) AS example
        |FROM t GROUP BY template ORDER BY n DESC, template LIMIT 10""".stripMargin,

    // corpus-card twin: same totals, md5 distinct, the t_text_quality keep
    // expression, and a QUALIFY top-1 language cross-joined on.
    "t_corpus_card" ->
      """WITH base AS (SELECT text, lang, string_split(text, ' ') AS tk FROM documents),
        |agg AS (SELECT count(*) AS n_docs,
        |          CAST(sum(len(tk)) AS BIGINT) AS n_words,
        |          count(DISTINCT md5(text)) AS n_distinct,
        |          CAST(sum(CASE WHEN
        |            (len(tk) BETWEEN 10 AND 100000)
        |            AND (round(list_sum(list_transform(tk, t -> len(t)))::DOUBLE / len(tk)::DOUBLE, 4) BETWEEN 2 AND 12)
        |            AND (round(len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / greatest(len(text),1)::DOUBLE, 4) <= 0.2)
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
        |        FROM base),
        |top AS (SELECT lang AS top_lang FROM base GROUP BY lang
        |        QUALIFY row_number() OVER (ORDER BY count(*) DESC, lang) = 1)
        |SELECT CAST(n_docs AS BIGINT) AS n_docs, n_words,
        |  CAST(n_distinct AS BIGINT) AS n_distinct, n_keep,
        |  (n_docs - n_distinct) * 1000000 // n_docs AS dup_ppm,
        |  n_keep * 1000000 // n_docs AS keep_ppm, top_lang
        |FROM agg, top""".stripMargin,

    // source-drift twin: identical salted parity split, top-64 vocab cut
    // (count DESC, word ASC), integer-ppm vectors, L2² sum. `//` (floor)
    // == Spark DIV (truncate) — all operands non-negative.
    "t_source_drift" ->
      s"""WITH tok AS (SELECT source,
         |               (${dH15("concat('drift|', doc_id)")} % 2) AS half,
         |               unnest(string_split(text, ' ')) AS w
         |             FROM documents),
         |wc AS (SELECT source, half, w, count(*) AS n
         |       FROM tok GROUP BY source, half, w),
         |v AS (SELECT w FROM (SELECT w, sum(n) AS nw FROM wc GROUP BY w)
         |      QUALIFY row_number() OVER (ORDER BY nw DESC, w) <= 64),
         |tots AS (SELECT source,
         |           sum(CASE WHEN half = 0 THEN n ELSE 0 END) AS tot_a,
         |           sum(CASE WHEN half = 1 THEN n ELSE 0 END) AS tot_b
         |         FROM wc GROUP BY source),
         |pw AS (SELECT wc.source, wc.w,
         |         sum(CASE WHEN half = 0 THEN n ELSE 0 END) AS na,
         |         sum(CASE WHEN half = 1 THEN n ELSE 0 END) AS nb
         |       FROM wc JOIN v ON wc.w = v.w GROUP BY wc.source, wc.w),
         |pp AS (SELECT p.source,
         |         na * 1000000 // greatest(t.tot_a, 1) AS pa,
         |         nb * 1000000 // greatest(t.tot_b, 1) AS pb,
         |         t.tot_a, t.tot_b
         |       FROM pw p JOIN tots t ON p.source = t.source)
         |SELECT source, CAST(max(tot_a) AS BIGINT) AS tok_a,
         |  CAST(max(tot_b) AS BIGINT) AS tok_b,
         |  CAST(sum((pa - pb) * (pa - pb)) AS BIGINT) AS drift_l2,
         |  count(*)::BIGINT AS n_words
         |FROM pp GROUP BY source""".stripMargin,

    // URL-canon twin: the same parse/normalize/sort chain, CTEs GENERATED
    // from Urls.TrackingPrefixes (one source of truth for both dialects).
    "t_url_canon" ->
      s"""WITH u AS (SELECT * FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_urls/*.parquet')),
         |${graft.text.Urls.duckCanonCte("u")}
         |SELECT canon_url, count(*)::BIGINT AS n_variants,
         |  CAST(min(doc_id) AS BIGINT) AS first_doc
         |FROM canon GROUP BY canon_url""".stripMargin,

    // PageRank twin: the same integer micro-rank recurrence, CTE chain
    // GENERATED for the same iteration count as the Spark loop.
    "t_link_rank" -> {
      val iters = 3
      val rounds = (1 to iters).map { k =>
        s"""c$k AS (SELECT dst, sum(r // deg) AS s
           |      FROM e JOIN r${k - 1} ON e.src = r${k - 1}.node GROUP BY dst),
           |r$k AS (SELECT node, 150000 + (850000 * coalesce(s, 0)) // 1000000 AS r
           |      FROM r${k - 1} LEFT JOIN c$k ON node = dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH pg AS (SELECT doc_id, list_transform(
         |    regexp_extract_all(html, '<a href="/p/([0-9]+)"', 1),
         |    x -> CAST(x AS BIGINT)) AS ts
         |  FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_html/*.parquet')),
         |e0 AS (SELECT doc_id AS src, unnest(ts) AS dst FROM pg),
         |od AS (SELECT src, count(*) AS deg FROM e0 GROUP BY src),
         |e AS (SELECT e0.src, e0.dst, od.deg FROM e0 JOIN od USING (src)),
         |r0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS r FROM pg),
         |$rounds,
         |ind AS (SELECT dst AS node, count(*)::BIGINT AS indegree FROM e0 GROUP BY dst)
         |SELECT r$iters.node AS doc_id, CAST(r$iters.r AS BIGINT) AS rank_micro,
         |  coalesce(ind.indegree, 0) AS indegree
         |FROM r$iters LEFT JOIN ind USING (node)""".stripMargin
    },

    // HTML-extraction twin: patterns GENERATED from the same Html constants
    // (shared Java-regex ∩ RE2 dialect), same fixed replace order.
    "t_html_extract" -> {
      import graft.text.Html
      s"""SELECT doc_id,
         |  len(regexp_extract_all(html, '${Html.TagPat}')) AS n_tags,
         |  len(regexp_extract_all(html, '${Html.LinkPat}')) AS n_links,
         |  len(html) AS raw_len,
         |  trim(regexp_replace(regexp_replace(regexp_replace(html,
         |    '${Html.ScriptPat}', ' ', 'g'), '${Html.TagPat}', ' ', 'g'),
         |    '  +', ' ', 'g')) AS text,
         |  len(trim(regexp_replace(regexp_replace(regexp_replace(html,
         |    '${Html.ScriptPat}', ' ', 'g'), '${Html.TagPat}', ' ', 'g'),
         |    '  +', ' ', 'g'))) AS text_len,
         |  (len(trim(regexp_replace(regexp_replace(regexp_replace(html,
         |    '${Html.ScriptPat}', ' ', 'g'), '${Html.TagPat}', ' ', 'g'),
         |    '  +', ' ', 'g'))) * 1000000) // greatest(len(html), 1) AS text_ppm
         |FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_html/*.parquet')""".stripMargin
    },

    // PII twin: count + replace chain GENERATED from the same Pii.Categories
    // constants as the Spark side (shared Java-regex ∩ RE2 dialect).
    "t_pii_scrub" -> {
      import graft.text.Pii
      val counts = Pii.Categories.map { case (name, pat, _) =>
        s"len(regexp_extract_all(text, '$pat')) AS n_$name"
      }.mkString(", ")
      val scrub = Pii.Categories.foldLeft("text") { case (e, (_, pat, rep)) =>
        s"regexp_replace($e, '$pat', '$rep', 'g')"
      }
      s"""SELECT doc_id, $counts, $scrub AS scrubbed
         |FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_pii/*.parquet')""".stripMargin
    },

    "p_bpe_pairs" ->
      s"""WITH d AS (SELECT * FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_boiler/*.parquet')),
         |p AS (SELECT tokens[i] AS a, tokens[i+1] AS b
         |      FROM d, unnest(generate_series(1, len(tokens)-1)) AS t(i)),
         |c AS (SELECT a, b, count(*)::BIGINT AS n FROM p GROUP BY a, b)
         |SELECT a, b, n, CAST(row_number() OVER (ORDER BY n DESC, a, b) AS BIGINT) AS rank
         |FROM c QUALIFY rank <= 64""".stripMargin,

    // BPE-iteration twin: the oracle re-derives the argmax pick (same
    // (n DESC, a, b) tie-break) and re-applies the greedy merge as a
    // sequential list fold — after a merge the written newId is the new
    // "previous" element, the reference BPE greedy semantics.
    "p_bpe_merge" ->
      s"""WITH d AS (SELECT * FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_boiler/*.parquet')),
         |p AS (SELECT tokens[i] AS a, tokens[i+1] AS b
         |      FROM d, unnest(generate_series(1, len(tokens)-1)) AS t(i)),
         |c AS (SELECT a, b, count(*)::BIGINT AS n FROM p GROUP BY a, b),
         |top AS (SELECT a, b FROM c ORDER BY n DESC, a, b LIMIT 1),
         |m AS (SELECT doc_id, source, len(tokens) AS n_before,
         |  list_reduce(list_prepend(CAST([] AS INT[]), list_transform(tokens, t -> [t])),
         |    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = top.a AND x[1] = top.b
         |                THEN list_concat(acc[1:len(acc)-1], [CAST(50257 AS INT)])
         |                ELSE list_concat(acc, x) END) AS merged
         |  FROM d, top)
         |SELECT doc_id, source, top.a AS merge_a, top.b AS merge_b,
         |  CAST(n_before AS BIGINT) AS n_before, CAST(len(merged) AS BIGINT) AS n_after,
         |  ${dH15("array_to_string(merged, ',')")} AS merged_hash
         |FROM m, top""".stripMargin,

    // BPE training twin: the single-merge fold chained for 3 rounds — each
    // round re-derives the argmax over the PREVIOUS round's merged corpus
    // (so learned ids compose) and re-counts the corpus total after it.
    "p_bpe_train" -> {
      val rows = (0 until BpeIters).map { i =>
        s"""SELECT CAST($i AS BIGINT) AS it, t$i.a AS merge_a, t$i.b AS merge_b,
           |  CAST(${BpeBase + i} AS INT) AS new_id, t$i.n AS n_pair,
           |  s${i + 1}.total AS total_after FROM t$i, s${i + 1}""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH d0 AS (SELECT doc_id, tokens
         |  FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_boiler/*.parquet')),
         |${bpeChainCtes(BpeIters, BpeBase)}
         |$rows""".stripMargin
    },

    // BPE encode twin: the SAME training chain re-derived, final corpus
    // d3 joined back to the raw rows for lengths + content hash — any
    // divergence in any round's argmax or greedy fold breaks the match.
    "p_bpe_encode" ->
      s"""WITH d0 AS (SELECT doc_id, tokens
         |  FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_boiler/*.parquet')),
         |${bpeChainCtes(BpeIters, BpeBase)}
         |SELECT o.doc_id, o.source,
         |  CAST(len(o.tokens) AS BIGINT) AS n_before,
         |  CAST(len(d$BpeIters.tokens) AS BIGINT) AS n_after,
         |  ${dH15(s"array_to_string(d$BpeIters.tokens, ',')")} AS encoded_hash
         |FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_boiler/*.parquet') o
         |JOIN d$BpeIters ON d$BpeIters.doc_id = o.doc_id""".stripMargin,

    "d_semdedup" ->
      s"""WITH seeds AS (
         |  SELECT embedding AS cent, CAST(row_number() OVER (
         |    ORDER BY ${dH15("CAST(vec_id AS VARCHAR)")}, vec_id) - 1 AS INT) AS cell
         |  FROM embeddings QUALIFY cell < 16),
         |ac AS (SELECT e.vec_id, e.embedding AS v, s.cell,
         |         ${duckCosRaw("e.embedding", "s.cent")} AS cos_c
         |       FROM embeddings e CROSS JOIN seeds s),
         |assigned AS (SELECT vec_id, v, cell FROM ac
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cell) = 1),
         |d AS (SELECT y.vec_id AS vec_id, round(max(${duckCosRaw("x.v", "y.v")}), 6) AS max_cos
         |      FROM assigned x JOIN assigned y USING (cell)
         |      WHERE x.vec_id < y.vec_id AND ${duckCosRaw("x.v", "y.v")} >= 0.3
         |      GROUP BY y.vec_id)
         |SELECT a.vec_id, a.cell, d.max_cos, d.max_cos IS NOT NULL AS is_dup
         |FROM assigned a LEFT JOIN d USING (vec_id)""".stripMargin,

    // diversity-sample twin: the d_semdedup seeds/assignment CTEs + a
    // per-cell QUALIFY over the same salted hash order.
    "d_diversity_sample" ->
      s"""WITH seeds AS (
         |  SELECT embedding AS cent, CAST(row_number() OVER (
         |    ORDER BY ${dH15("CAST(vec_id AS VARCHAR)")}, vec_id) - 1 AS INT) AS cell
         |  FROM embeddings QUALIFY cell < 16),
         |ac AS (SELECT e.vec_id, s.cell,
         |         ${duckCosRaw("e.embedding", "s.cent")} AS cos_c
         |       FROM embeddings e CROSS JOIN seeds s),
         |assigned AS (SELECT vec_id, cell FROM ac
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cell) = 1)
         |SELECT vec_id, cell,
         |  CAST(row_number() OVER (PARTITION BY cell
         |    ORDER BY ${dH15("concat('divers|', vec_id)")}, vec_id) AS BIGINT) AS cell_rank
         |FROM assigned
         |QUALIFY cell_rank <= 5""".stripMargin,

    "t_text_repetition" ->
      """SELECT doc_id,
        | round(CAST(len(tk) - len(list_distinct(tk)) AS DOUBLE) / len(tk), 6) AS dup_word_frac,
        | CAST(top AS BIGINT) AS top_bigram_n,
        | round(CASE WHEN len(tk) >= 2 THEN 2.0 * top / len(tk) ELSE 0.0 END, 6) AS top_bigram_frac
        |FROM (
        |  SELECT doc_id, tk,
        |    CASE WHEN len(tk) >= 2 THEN list_max(list_transform(list_distinct(bgs),
        |         b -> len(list_filter(bgs, x -> x = b)))) ELSE 0 END AS top
        |  FROM (SELECT doc_id, tk,
        |          CASE WHEN len(tk) >= 2 THEN list_transform(generate_series(1, len(tk)-1),
        |               j -> tk[j] || ' ' || tk[j+1]) ELSE CAST([] AS VARCHAR[]) END AS bgs
        |        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)))""".stripMargin,

    "d_contamination" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(tk) >= $ShingleN
         |  THEN list_transform(generate_series(1, len(tk)-${ShingleN - 1}),
         |       j -> tk[j]||' '||tk[j+1]||' '||tk[j+2])
         |  ELSE CAST([] AS VARCHAR[]) END) AS sh FROM tk),
         |bsh AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id < 5),
         |dsh AS (SELECT doc_id, unnest(sh) AS s FROM sh),
         |hits AS (SELECT d.doc_id, count(b.s) AS n
         |         FROM dsh d LEFT JOIN bsh b ON d.s = b.s GROUP BY d.doc_id)
         |SELECT t.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_overlap,
         |       coalesce(h.n, 0) > 0 AS contaminated
         |FROM tk t LEFT JOIN hits h ON t.doc_id = h.doc_id""".stripMargin,

    // greedy packing fold: per (source, shard), doc_id order; a bin closes
    // when the next sequence would overflow the budget (oversized seqs pack
    // alone). shard = h15(doc_id) % shards — the same cross-engine hash the
    // Spark side uses, so bin assignment matches bit-for-bit.
    "p_pack_sequences" -> duckPackSql(budget = 8192, shards = 1),
    "p_pack_sharded" -> duckPackSql(budget = 8192, shards = 4),

    // mixing sampler twin: same h15-threshold keep rule, CASE generated
    // from the same DefaultMixPpm Seq the Spark when-chain folds over.
    "p_mix_sample" -> {
      val cases = graft.tokens.TokenOps.DefaultMixPpm
        .map { case (src, ppm) => s"WHEN '$src' THEN $ppm" }.mkString(" ")
      s"""WITH g AS (SELECT * FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen10k/*.parquet')),
         |k AS (SELECT source, n_tok,
         |        (${dH15("doc_id")} % 1000000) <
         |        CASE source $cases ELSE 0 END AS keep
         |      FROM g)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM k GROUP BY source""".stripMargin
    },

    // split-assignment twin: identical salted hash buckets and thresholds.
    "p_split_assign" ->
      s"""WITH g AS (SELECT *, (${dH15("concat('split|', doc_id)")} % 1000000) AS b
         |           FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen10k/*.parquet'))
         |SELECT source,
         |  CASE WHEN b < 10000 THEN 'test'
         |       WHEN b < 30000 THEN 'val' ELSE 'train' END AS split,
         |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_toks
         |FROM g GROUP BY source, split""".stripMargin,

    // snapshot-diff twin: h15 content hashes + one FULL OUTER join, same
    // three lanes, unchanged filtered.
    "d_snapshot_diff" ->
      s"""WITH o AS (SELECT doc_id, ${dH15("array_to_string(tokens, ',')")} AS oh
         |           FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_boiler/*.parquet')),
         |n AS (SELECT doc_id, ${dH15("array_to_string(tokens, ',')")} AS nh
         |      FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_snap2/*.parquet')),
         |j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, oh, nh
         |      FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
         |SELECT doc_id,
         |  CASE WHEN oh IS NULL THEN 'added'
         |       WHEN nh IS NULL THEN 'removed'
         |       ELSE 'changed' END AS lane
         |FROM j WHERE oh IS NULL OR nh IS NULL OR oh <> nh""".stripMargin,

    // count-min twin: rebuild the exact integer counter table from raw
    // counts (cell = h15('cm'||j||'|'||key) % width — same decimal-ASCII
    // scheme as the JVM sketch), then min over depth rows per candidate.
    "v_countmin" ->
      s"""WITH d AS (SELECT * FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_boiler/*.parquet')),
         |tc AS (SELECT t, count(*) AS n
         |       FROM (SELECT unnest(tokens) AS t FROM d) GROUP BY t),
         |js AS (SELECT unnest(generate_series(0, 3)) AS j),
         |cells AS (SELECT j, pos, sum(n) AS c
         |          FROM (SELECT n, j,
         |                  (${dH15("concat('cm', j, '|', t)")} % 1024) AS pos
         |                FROM tc CROSS JOIN js)
         |          GROUP BY j, pos),
         |top AS (SELECT t, n FROM tc
         |        QUALIFY row_number() OVER (ORDER BY n DESC, t) <= 32),
         |cand AS (SELECT top.t, top.n, js.j,
         |           (${dH15("concat('cm', js.j, '|', top.t)")} % 1024) AS pos
         |         FROM top CROSS JOIN js)
         |SELECT CAST(cand.t AS BIGINT) AS t, CAST(cand.n AS BIGINT) AS true_n,
         |  CAST(min(cells.c) AS BIGINT) AS est_n
         |FROM cand JOIN cells USING (j, pos)
         |GROUP BY cand.t, cand.n""".stripMargin,

    "p_compaction_plan" ->
      """WITH inv AS (
        |  SELECT event_type AS part,
        |         'f' || lpad(CAST(event_id % 200 AS VARCHAR), 3, '0') AS file,
        |         count(*) * 517 AS bytes
        |  FROM events GROUP BY 1, 2)
        |SELECT part, file, CAST(bytes AS BIGINT) AS bytes,
        |  CAST(coalesce(sum(bytes) OVER (PARTITION BY part
        |         ORDER BY bytes DESC, file
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |       // 15000 AS BIGINT) AS grp
        |FROM inv""".stripMargin,

    // Z-order twin: the same bit interleave as integer arithmetic —
    // bit i of x at position 2i, bit i of y at 2i+1.
    "p_zorder" -> {
      val terms = (0 until 16).map { i =>
        s"(((user_id % 65536) // ${1L << i}) % 2) * ${1L << (2 * i)}"
      } ++ (0 until 16).map { i =>
        s"(((event_id % 65536) // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
      }
      s"""SELECT event_id, zv, zv // ${1L << 24} AS cell FROM (
         |  SELECT event_id, ${terms.mkString(" + ")} AS zv FROM events)""".stripMargin
    },

    // HLL twin: rebuild the EXACT register array from raw data (same
    // md5-derived bucket/rho scheme), fold Σ2^-M in register-index order
    // (bit-identical double sum), apply the same estimator text with the
    // linear-counting small-range branch.
    // sliding twin: an event contributes to windows h, h+1, h+2 (only
    // those that are real hours of its type); then the IDENTICAL register
    // rebuild + estimator as v_hll, grouped by (type, window).
    "v_hll_sliding" -> {
      val hexpr = dH15("concat('hll|', user_id)")
      s"""WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS h, user_id
         |            FROM events),
         |hours AS (SELECT DISTINCT event_type, h FROM ev),
         |w AS (
         |  SELECT c.event_type, c.window_h, c.user_id
         |  FROM (SELECT e.event_type, e.h + to_hours(o.o) AS window_h, e.user_id
         |        FROM ev e, (SELECT unnest([0, 1, 2]) AS o) o) c
         |  JOIN hours t ON t.event_type = c.event_type AND t.h = c.window_h),
         |hpairs AS (
         |  SELECT event_type, window_h, $hexpr AS h
         |  FROM (SELECT DISTINCT event_type, window_h, user_id FROM w)),
         |r AS (SELECT event_type, window_h, CAST(h % 256 AS INT) AS bucket,
         |        max(53 - (CASE WHEN h // 256 = 0 THEN 0
         |                  ELSE len(printf('%b', h // 256)) END)) AS rho
         |      FROM hpairs GROUP BY event_type, window_h, bucket),
         |regs AS (SELECT g.event_type, g.window_h, gs.b, coalesce(r.rho, 0) AS rho
         |         FROM (SELECT event_type, h AS window_h FROM hours) g
         |         CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS b) gs
         |         LEFT JOIN r ON r.event_type = g.event_type
         |                    AND r.window_h = g.window_h AND r.bucket = gs.b),
         |l AS (SELECT event_type, window_h, list(rho ORDER BY b) AS rs FROM regs
         |      GROUP BY event_type, window_h),
         |est AS (SELECT event_type, window_h,
         |          list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |            list_transform(rs, x -> 1.0 / CAST(1::BIGINT << x AS DOUBLE))),
         |            (acc, x) -> acc + x) AS sum_inv,
         |          len(list_filter(rs, x -> x = 0)) AS zeros FROM l),
         |e AS (SELECT event_type, window_h, zeros,
         |        (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 / sum_inv AS raw
         |      FROM est)
         |SELECT event_type, window_h,
         |  round((CASE WHEN raw <= 2.5 * 256.0 AND zeros > 0
         |         THEN 256.0 * ln(256.0 / zeros) ELSE raw END) + 1e-9, 4) AS est_n
         |FROM e""".stripMargin
    },

    "v_hll" -> {
      val hexpr = dH15("concat('hll|', user_id)")
      s"""WITH hpairs AS (
         |  SELECT event_type, $hexpr AS h
         |  FROM (SELECT DISTINCT event_type, user_id FROM events)),
         |r AS (SELECT event_type, CAST(h % 256 AS INT) AS bucket,
         |        max(53 - (CASE WHEN h // 256 = 0 THEN 0
         |                  ELSE len(printf('%b', h // 256)) END)) AS rho
         |      FROM hpairs GROUP BY event_type, bucket),
         |regs AS (SELECT g.event_type, gs.b, coalesce(r.rho, 0) AS rho
         |         FROM (SELECT DISTINCT event_type FROM events) g
         |         CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS b) gs
         |         LEFT JOIN r ON r.event_type = g.event_type AND r.bucket = gs.b),
         |l AS (SELECT event_type, list(rho ORDER BY b) AS rs FROM regs
         |      GROUP BY event_type),
         |est AS (SELECT event_type,
         |          list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |            list_transform(rs, x -> 1.0 / CAST(1::BIGINT << x AS DOUBLE))),
         |            (acc, x) -> acc + x) AS sum_inv,
         |          len(list_filter(rs, x -> x = 0)) AS zeros FROM l),
         |e AS (SELECT event_type, zeros,
         |        (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 / sum_inv AS raw
         |      FROM est),
         |ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_n
         |       FROM events GROUP BY event_type)
         |SELECT e.event_type, ex.exact_n,
         |  round((CASE WHEN raw <= 2.5 * 256.0 AND zeros > 0
         |         THEN 256.0 * ln(256.0 / zeros) ELSE raw END) + 1e-9, 4) AS est_n
         |FROM e JOIN ex ON ex.event_type = e.event_type""".stripMargin
    },

    // PMI twin: same counts, same fixed-order double expression, same
    // +1e-9 micronat rounding as the LM/NB oracles.
    "p_pmi_pairs" ->
      s"""WITH d AS (SELECT * FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_boiler/*.parquet')),
         |p AS (SELECT tokens[i] AS a, tokens[i+1] AS b
         |      FROM d, unnest(generate_series(1, len(tokens)-1)) AS t(i)),
         |pc AS (SELECT a, b, count(*)::BIGINT AS n_ab FROM p GROUP BY a, b
         |       HAVING count(*) >= 5),
         |u AS (SELECT t, count(*)::BIGINT AS n_t
         |      FROM (SELECT unnest(tokens) AS t FROM d) GROUP BY t),
         |tots AS (SELECT (SELECT CAST(sum(n_t) AS DOUBLE) FROM u) AS tot_t,
         |                (SELECT CAST(sum(n_ab) AS DOUBLE) FROM pc) AS tot_p),
         |s AS (SELECT pc.a, pc.b, pc.n_ab,
         |        CAST(round((ln(CAST(pc.n_ab AS DOUBLE)) - ln(CAST(ua.n_t AS DOUBLE))
         |          - ln(CAST(ub.n_t AS DOUBLE)) + ln(tot_t) + ln(tot_t)
         |          - ln(tot_p)) * 1000000 + 1e-9, 0) AS BIGINT) AS pmi_micronats
         |      FROM pc JOIN u ua ON pc.a = ua.t JOIN u ub ON pc.b = ub.t, tots)
         |SELECT a, b, n_ab, pmi_micronats,
         |  CAST(row_number() OVER (ORDER BY pmi_micronats DESC, a, b) AS BIGINT) AS rank
         |FROM s QUALIFY rank <= 40""".stripMargin,

    // vocab-prune twin: identical fully-ordered top-V cut; remap + count
    // via list ops against the derived vocab list (unk = 50257, V = 32).
    "p_vocab_prune" ->
      s"""WITH d AS (SELECT * FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_boiler/*.parquet')),
         |tok AS (SELECT unnest(tokens) AS t FROM d),
         |v AS (SELECT t FROM (SELECT t, count(*) AS n FROM tok GROUP BY t)
         |      QUALIFY row_number() OVER (ORDER BY n DESC, t) <= 32),
         |vls AS (SELECT list(t) AS vl FROM v)
         |SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
         |  CAST(len(list_filter(tokens, t -> NOT list_contains(vl, t))) AS BIGINT) AS n_unk,
         |  ${dH15("array_to_string(list_transform(tokens, t -> CASE WHEN list_contains(vl, t) THEN t ELSE 50257 END), ',')")} AS pruned_hash
         |FROM d, vls""".stripMargin,

    // global-shuffle twin: the bucketed rank must equal the plain global
    // ROW_NUMBER over the same (salted hash, id) order — the bucket
    // machinery is a pure execution strategy, invisible in the result.
    "p_global_shuffle" ->
      s"""WITH g AS (SELECT doc_id, source,
         |             ${dH15("concat('shuf|', doc_id)")} AS hh
         |           FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen10k/*.parquet'))
         |SELECT doc_id, source,
         |  CAST(row_number() OVER (ORDER BY hh, doc_id) - 1 AS BIGINT) AS order_idx
         |FROM g""".stripMargin,

    // context-window chunking twin: identical chunk-count formula, 1-based
    // inclusive slices, h15 content hash per chunk (maxLen=128, overlap=32).
    "p_chunk_sequences" -> {
      val ml = 128; val st = 96
      val sliceE = s"list_slice(tokens, chunk_idx*$st + 1, chunk_idx*$st + $ml)"
      s"""WITH d AS (SELECT * FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_boiler/*.parquet')),
         |c AS (SELECT doc_id, source, tokens,
         |        unnest(generate_series(0, CASE WHEN n_tok <= $ml THEN 0
         |          ELSE (n_tok - $ml + ${st - 1}) // $st END)) AS chunk_idx
         |      FROM d)
         |SELECT doc_id, source, chunk_idx,
         |  CAST(len($sliceE) AS BIGINT) AS chunk_len,
         |  ${dH15(s"array_to_string($sliceE, ',')")} AS chunk_hash
         |FROM c""".stripMargin
    },

    // token-level decontamination twin: distinct 13-gram h15 sets both
    // sides, bench-side global distinct, per-doc hit counts.
    "d_token_decontam" -> {
      val n = 13
      val gramsE = s"list_distinct(list_transform(generate_series(1, n_tok - ${n - 1}), " +
        s"i -> ${dH15(s"array_to_string(list_slice(tokens, i, i+${n - 1}), ',')")}))"
      s"""WITH b AS (SELECT DISTINCT g FROM (
         |        SELECT unnest($gramsE) AS g
         |        FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_bench/*.parquet')
         |        WHERE n_tok >= $n)),
         |g AS (SELECT doc_id, source, $gramsE AS gs
         |      FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_boiler/*.parquet')
         |      WHERE n_tok >= $n),
         |e AS (SELECT doc_id, source, CAST(len(gs) AS BIGINT) AS n_grams,
         |        unnest(gs) AS g FROM g)
         |SELECT doc_id, source, n_grams, count(*) AS hit_grams
         |FROM e JOIN b USING (g)
         |GROUP BY doc_id, source, n_grams""".stripMargin
    },

    // incremental-dedup twin: the bloom pre-filter has no false negatives,
    // so exact output semantics are a pure content-hash anti join.
    "d_incr_dedupe" ->
      s"""WITH d AS (SELECT *, ${dH15("array_to_string(tokens, ',')")} AS ch
         |           FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_incr/*.parquet'))
         |SELECT doc_id, source, ch AS content_hash
         |FROM d WHERE lane = 'batch'
         |  AND ch NOT IN (SELECT ch FROM d WHERE lane = 'corpus')""".stripMargin,

    // winnowing substring-dup twin: identical k-gram h15 hashes, identical
    // window-min selection (k=16, w=8 — the Winnow.K/Winnow.W defaults).
    "d_substring_dup" -> {
      val k = graft.tokens.Winnow.K; val w = graft.tokens.Winnow.W
      s"""WITH d AS (SELECT * FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_boiler/*.parquet')
         |           WHERE n_tok >= ${k + w - 1}),
         |g AS (SELECT doc_id, source,
         |        list_transform(generate_series(1, n_tok - ${k - 1}),
         |          i -> ${dH15(s"array_to_string(list_slice(tokens, i, i+${k - 1}),',')")}) AS gh
         |      FROM d),
         |f AS (SELECT doc_id, source,
         |        list_distinct(list_transform(generate_series(1, len(gh) - ${w - 1}),
         |          j -> list_min(list_slice(gh, j, j+${w - 1})))) AS fps
         |      FROM g),
         |e AS (SELECT doc_id, source, unnest(fps) AS fp FROM f),
         |s AS (SELECT fp, count(DISTINCT doc_id) AS ndocs FROM e GROUP BY fp)
         |SELECT e.doc_id, e.source, count(*) AS n_fp,
         |       CAST(sum(CASE WHEN s.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_fp
         |FROM e JOIN s USING (fp)
         |GROUP BY e.doc_id, e.source
         |HAVING CAST(sum(CASE WHEN s.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) > 0""".stripMargin
    },

    // web-pipeline twin: the extract, gate, scrub, and dedup CTEs chained —
    // extract/scrub fragments GENERATED from the same Html/Pii constants.
    "d_web_pipeline" -> {
      import graft.text.{Html, Pii}
      val clean = "trim(regexp_replace(regexp_replace(regexp_replace(html, " +
        s"'${Html.ScriptPat}', ' ', 'g'), '${Html.TagPat}', ' ', 'g'), '  +', ' ', 'g'))"
      val counts = Pii.Categories.map { case (name, pat, _) =>
        s"len(regexp_extract_all(text, '$pat')) AS n_$name"
      }.mkString(", ")
      val scrub = Pii.Categories.foldLeft("text") { case (e, (_, pat, rep)) =>
        s"regexp_replace($e, '$pat', '$rep', 'g')"
      }
      val piiSum = Pii.Categories.map { case (n, _, _) => s"n_$n" }.mkString(" + ")
      s"""WITH h AS (SELECT doc_id, html FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_web/*.parquet')),
         |e AS (SELECT doc_id, $clean AS text, len(html) AS raw_len FROM h),
         |g AS (SELECT doc_id, text FROM e
         |      WHERE (len(text) * 1000000) // greatest(raw_len, 1) >= 100000
         |        AND len(text) >= 40),
         |s AS (SELECT doc_id, $counts, $scrub AS scrubbed FROM g),
         |d AS (SELECT doc_id, CAST($piiSum AS BIGINT) AS n_pii, scrubbed,
         |        ${dH15("scrubbed")} AS ph FROM s),
         |w AS (SELECT ph, min(doc_id) AS keep_id FROM d GROUP BY ph)
         |SELECT d.doc_id, d.n_pii, CAST(len(d.scrubbed) AS BIGINT) AS clean_len,
         |  d.ph AS clean_hash
         |FROM d JOIN w ON d.ph = w.ph AND d.doc_id = w.keep_id""".stripMargin
    },

    // duplicate-run removal twin: identical per-position gram hashes,
    // string-key winner selection, covered-position union, and a list
    // comprehension rebuilding the cleaned array for the content hash.
    "d_substring_strip" -> {
      val k = graft.tokens.Winnow.K
      s"""WITH d AS (SELECT * FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_boiler/*.parquet')),
         |g AS (SELECT doc_id, source, tokens, n_tok,
         |        list_transform(generate_series(1, n_tok - ${k - 1}),
         |          i -> ${dH15(s"array_to_string(list_slice(tokens, i, i+${k - 1}),',')")}) AS gh
         |      FROM d WHERE n_tok >= $k),
         |sites AS (SELECT doc_id, pos, gh[pos] AS ghash
         |          FROM (SELECT doc_id, gh,
         |                  unnest(generate_series(1, len(gh))) AS pos
         |                FROM g)),
         |w AS (SELECT ghash,
         |        min(doc_id || '|' || lpad(pos::VARCHAR, 9, '0')) AS wkey,
         |        count(*) AS n
         |      FROM sites GROUP BY ghash),
         |cov AS (SELECT doc_id, list_distinct(list(cp)) AS cps
         |        FROM (SELECT s.doc_id,
         |                unnest(generate_series(s.pos, s.pos + ${k - 1})) AS cp
         |              FROM sites s JOIN w ON s.ghash = w.ghash
         |              WHERE w.n >= 2
         |                AND s.doc_id || '|' || lpad(s.pos::VARCHAR, 9, '0') <> w.wkey)
         |        GROUP BY doc_id)
         |SELECT d.doc_id, d.source, CAST(d.n_tok AS BIGINT) AS n_before,
         |  CAST(len(cps) AS BIGINT) AS n_removed,
         |  ${dH15(s"array_to_string([d.tokens[i] FOR i IN generate_series(1, len(d.tokens)) IF NOT list_contains(cps, i)], ',')")} AS clean_hash
         |FROM d JOIN cov ON d.doc_id = cov.doc_id""".stripMargin
    },

    // paragraph-dedup twins: identical h15 paragraph hashes; first-wins via
    // min(ROW(doc_id, idx)), frequency policy via distinct-doc counts.
    "d_para_dedupe" ->
      s"""WITH d AS (SELECT * FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_para/*.parquet')),
         |g AS (SELECT doc_id, source, string_split(text, chr(10)||chr(10)) AS ps FROM d),
         |p AS (SELECT doc_id, source,
         |        unnest(generate_series(1, len(ps))) - 1 AS idx,
         |        unnest(ps) AS para
         |      FROM g),
         |h AS (SELECT *, ${dH15("para")} AS ph FROM p),
         |f AS (SELECT ph, min(ROW(doc_id, idx)) AS frst FROM h GROUP BY ph),
         |k AS (SELECT h.*, h.doc_id = f.frst[1] AND h.idx = f.frst[2] AS keep
         |      FROM h JOIN f USING (ph))
         |SELECT doc_id, source, count(*) AS n_para,
         |       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
         |       string_agg(CASE WHEN keep THEN para END, chr(10)||chr(10) ORDER BY idx) AS clean_text
         |FROM k GROUP BY doc_id, source""".stripMargin,

    "d_para_common" ->
      s"""WITH d AS (SELECT * FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_para/*.parquet')),
         |g AS (SELECT doc_id, source, string_split(text, chr(10)||chr(10)) AS ps FROM d),
         |p AS (SELECT doc_id, source,
         |        unnest(generate_series(1, len(ps))) - 1 AS idx,
         |        unnest(ps) AS para
         |      FROM g),
         |h AS (SELECT *, ${dH15("para")} AS ph FROM p),
         |f AS (SELECT ph, count(DISTINCT doc_id) AS ndocs FROM h GROUP BY ph),
         |k AS (SELECT h.*, f.ndocs < 3 AS keep FROM h JOIN f USING (ph))
         |SELECT doc_id, source, count(*) AS n_para,
         |       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
         |       string_agg(CASE WHEN keep THEN para END, chr(10)||chr(10) ORDER BY idx) AS clean_text
         |FROM k GROUP BY doc_id, source""".stripMargin,

    "t_token_unigrams" ->
      s"""SELECT token, count(*) AS n
         |FROM (SELECT unnest(tokens) AS token
         |      FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_boiler/*.parquet'))
         |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,

    "d_curation_pipeline" -> {
      val hits = TextOps.StopwordProfiles.map { case (lang, prof) =>
        s"len(list_filter(tkk, t -> t IN ${duckIn(prof)})) AS h_$lang"
      }.mkString(", ")
      val langs = TextOps.StopwordProfiles.map(_._1)
      val best = s"greatest(${langs.map("h_" + _).mkString(",")})"
      val pick = langs.map(l => s"WHEN h_$l = $best AND $best > 0 THEN '$l'").mkString(" ")
      s"""WITH tk AS (SELECT *, string_split(text,' ') AS tkk FROM documents),
         |kept AS (SELECT * FROM tk
         |  WHERE (len(tkk) BETWEEN 10 AND 100000)
         |   AND (round(list_sum(list_transform(tkk, t -> len(t)))::DOUBLE / len(tkk)::DOUBLE, 4) BETWEEN 2 AND 12)
         |   AND (round(len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / greatest(len(text),1)::DOUBLE, 4) <= 0.2)),
         |langed AS (SELECT *, (CASE $pick ELSE 'und' END) AS pred_lang
         |  FROM (SELECT *, $hits FROM kept)),
         |dedup AS (SELECT * FROM langed
         |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1)
         |SELECT pred_lang, source, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars, CAST(sum(len(tkk)) AS BIGINT) AS total_words
         |FROM dedup GROUP BY pred_lang, source""".stripMargin
    },

    "d_minhash_bands" -> {
      val bands = (0 until MinHashBands).map(b => s"${duckBand(b)} AS b$b").mkString(", ")
      s"$duckShingleCtes\nSELECT doc_id, $bands FROM sig"
    },

    "d_curation_full" -> {
      val hits = TextOps.StopwordProfiles.map { case (lang, prof) =>
        s"len(list_filter(tkk, t -> t IN ${duckIn(prof)})) AS h_$lang"
      }.mkString(", ")
      val langs = TextOps.StopwordProfiles.map(_._1)
      val best = s"greatest(${langs.map("h_" + _).mkString(",")})"
      val pick = langs.map(l => s"WHEN h_$l = $best AND $best > 0 THEN '$l'").mkString(" ")
      s"""WITH tk AS (SELECT *, string_split(text,' ') AS tkk FROM documents),
         |rep AS (SELECT doc_id FROM (
         |  SELECT doc_id, round(CASE WHEN len(tkk) >= 2
         |    THEN 2.0 * list_max(list_transform(list_distinct(bgs),
         |         b -> len(list_filter(bgs, x -> x = b)))) / len(tkk)
         |    ELSE 0.0 END, 6) AS f
         |  FROM (SELECT doc_id, tkk, CASE WHEN len(tkk) >= 2
         |          THEN list_transform(generate_series(1, len(tkk)-1), j -> tkk[j]||' '||tkk[j+1])
         |          ELSE CAST([] AS VARCHAR[]) END AS bgs FROM tk))
         |  WHERE f <= 0.2),
         |shg AS (SELECT doc_id, list_distinct(CASE WHEN len(tkk) >= $ShingleN
         |  THEN list_transform(generate_series(1, len(tkk)-${ShingleN - 1}),
         |       j -> tkk[j]||' '||tkk[j+1]||' '||tkk[j+2])
         |  ELSE CAST([] AS VARCHAR[]) END) AS sh FROM tk),
         |bsh AS (SELECT DISTINCT unnest(sh) AS s FROM shg WHERE doc_id < 5),
         |dsh AS (SELECT doc_id, unnest(sh) AS s FROM shg),
         |hits2 AS (SELECT d.doc_id, count(*) AS n FROM dsh d JOIN bsh b ON d.s = b.s GROUP BY d.doc_id),
         |cont AS (SELECT t.doc_id FROM tk t LEFT JOIN hits2 h USING (doc_id)
         |         WHERE coalesce(h.n, 0) = 0),
         |kept AS (SELECT * FROM tk
         |  WHERE (len(tkk) BETWEEN 10 AND 100000)
         |   AND (round(list_sum(list_transform(tkk, t -> len(t)))::DOUBLE / len(tkk)::DOUBLE, 4) BETWEEN 2 AND 12)
         |   AND (round(len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / greatest(len(text),1)::DOUBLE, 4) <= 0.2)),
         |curated AS (SELECT k.* FROM kept k
         |  JOIN rep USING (doc_id) JOIN cont USING (doc_id)),
         |langed AS (SELECT *, (CASE $pick ELSE 'und' END) AS pred_lang
         |  FROM (SELECT *, $hits FROM curated)),
         |dedup AS (SELECT * FROM langed
         |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1)
         |SELECT pred_lang, source, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  round(avg(CAST(len(tkk) AS DOUBLE)) + 1e-9, 4) AS avg_words
         |FROM dedup GROUP BY pred_lang, source""".stripMargin
    },

    "d_minhash_pairs" -> {
      val bandRows = (0 until MinHashBands)
        .map(b => s"SELECT doc_id, $b AS band, ${duckBand(b)} AS band_hash FROM sig")
        .mkString("\nUNION ALL ")
      s"""$duckShingleCtes,
         |bands AS ($bandRows),
         |capped AS (SELECT doc_id, band, band_hash FROM (
         |  SELECT *, count(*) OVER (PARTITION BY band, band_hash) AS bn FROM bands) WHERE bn <= 1000),
         |cand AS (SELECT DISTINCT l.doc_id AS id_l, r.doc_id AS id_r
         |  FROM capped l JOIN capped r ON l.band = r.band AND l.band_hash = r.band_hash
         |  AND l.doc_id < r.doc_id)
         |SELECT id_l, id_r, jaccard FROM (
         |  SELECT id_l, id_r,
         |    round(len(list_intersect(a.sh, b.sh))::DOUBLE /
         |          len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE, 6) AS jaccard
         |  FROM cand JOIN sh a ON a.doc_id = id_l JOIN sh b ON b.doc_id = id_r)
         |WHERE jaccard >= 0.2""".stripMargin
    },

    "d_simhash" ->
      s"""SELECT doc_id, CAST(list_sum(list_transform(range(0,32), j ->
         |  CASE WHEN list_sum(list_transform(hs, x ->
         |         CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END)) >= 0
         |  THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS sim
         |FROM (SELECT doc_id, list_transform(list_distinct(string_split(text,' ')),
         |        t -> ${dH15("t")}) AS hs FROM documents)""".stripMargin,

    "d_simhash_pairs" ->
      s"""WITH sims AS (
         |  SELECT doc_id, CAST(list_sum(list_transform(range(0,32), j ->
         |    CASE WHEN list_sum(list_transform(hs, x ->
         |           CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END)) >= 0
         |    THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS sim
         |  FROM (SELECT doc_id, list_transform(list_distinct(string_split(text,' ')),
         |          t -> ${dH15("t")}) AS hs FROM documents)),
         |bands AS (
         |  SELECT doc_id, sim, b AS band, (sim >> (8*b)) & 255 AS band_hash
         |  FROM sims, unnest([0,1,2,3]) AS t(b))
         |SELECT id_l, id_r, hamming FROM (
         |  SELECT DISTINCT l.doc_id AS id_l, r.doc_id AS id_r,
         |    CAST(bit_count(xor(l.sim, r.sim)) AS BIGINT) AS hamming
         |  FROM bands l JOIN bands r ON l.band = r.band AND l.band_hash = r.band_hash
         |   AND l.doc_id < r.doc_id)
         |WHERE hamming <= 3""".stripMargin,

    // transitive closure of the (deterministic) simhash pair graph, min
    // reachable id per node — the SQL twin of the label-propagation CC
    "d_neardup_components" ->
      s"""WITH RECURSIVE sims AS (
         |  SELECT doc_id, CAST(list_sum(list_transform(range(0,32), j ->
         |    CASE WHEN list_sum(list_transform(hs, x ->
         |           CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END)) >= 0
         |    THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS sim
         |  FROM (SELECT doc_id, list_transform(list_distinct(string_split(text,' ')),
         |          t -> ${dH15("t")}) AS hs FROM documents)),
         |bands AS (
         |  SELECT doc_id, sim, b AS band, (sim >> (8*b)) & 255 AS band_hash
         |  FROM sims, unnest([0,1,2,3]) AS t(b)),
         |prs AS (SELECT id_l, id_r FROM (
         |  SELECT DISTINCT l.doc_id AS id_l, r.doc_id AS id_r,
         |    CAST(bit_count(xor(l.sim, r.sim)) AS BIGINT) AS hamming
         |  FROM bands l JOIN bands r ON l.band = r.band AND l.band_hash = r.band_hash
         |   AND l.doc_id < r.doc_id)
         |  WHERE hamming <= 3),
         |edges AS (SELECT id_l AS a, id_r AS b FROM prs UNION SELECT id_r, id_l FROM prs),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges UNION SELECT DISTINCT a, a FROM edges
         |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
         |SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a""".stripMargin,

    // survivors = docs whose component label is themselves (or unpaired)
    "d_neardup_dedupe" ->
      s"""WITH RECURSIVE sims AS (
         |  SELECT doc_id, CAST(list_sum(list_transform(range(0,32), j ->
         |    CASE WHEN list_sum(list_transform(hs, x ->
         |           CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END)) >= 0
         |    THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS sim
         |  FROM (SELECT doc_id, list_transform(list_distinct(string_split(text,' ')),
         |          t -> ${dH15("t")}) AS hs FROM documents)),
         |bands AS (
         |  SELECT doc_id, sim, b AS band, (sim >> (8*b)) & 255 AS band_hash
         |  FROM sims, unnest([0,1,2,3]) AS t(b)),
         |prs AS (SELECT id_l, id_r FROM (
         |  SELECT DISTINCT l.doc_id AS id_l, r.doc_id AS id_r,
         |    CAST(bit_count(xor(l.sim, r.sim)) AS BIGINT) AS hamming
         |  FROM bands l JOIN bands r ON l.band = r.band AND l.band_hash = r.band_hash
         |   AND l.doc_id < r.doc_id)
         |  WHERE hamming <= 3),
         |edges AS (SELECT id_l AS a, id_r AS b FROM prs UNION SELECT id_r, id_l FROM prs),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges UNION SELECT DISTINCT a, a FROM edges
         |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |losers AS (SELECT a FROM (SELECT a, min(b) AS m FROM reach GROUP BY a) WHERE a <> m)
         |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT a FROM losers)""".stripMargin,

    "t_text_normalize" ->
      """SELECT doc_id,
        | nfc_normalize(text || ' cafe' || chr(769)) AS nfc,
        | length(nfc_normalize(text || ' cafe' || chr(769)))
        |   < length(text || ' cafe' || chr(769)) AS composed
        |FROM documents""".stripMargin,

    "d_embed_neardup" ->
      s"""WITH b AS (SELECT vec_id, embedding, ${duckBucketExpr("embedding")} AS bucket
         |           FROM embeddings)
         |SELECT id_l, id_r, cos FROM (
         |  SELECT l.vec_id AS id_l, r.vec_id AS id_r,
         |    ${duckCos("l.embedding", "r.embedding")} AS cos
         |  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id)
         |WHERE cos >= 0.3""".stripMargin,

    "d_embed_banded" ->
      s"""WITH s AS (SELECT vec_id, embedding,
         |             ${duckBucketExpr("embedding", 2 * EmbedBits)} AS sig
         |           FROM embeddings),
         |b AS (SELECT vec_id, embedding, t.band,
         |        (sig >> (t.band * $EmbedBits)) & ${(1L << EmbedBits) - 1} AS bucket
         |      FROM s CROSS JOIN range(0, 2) t(band))
         |SELECT DISTINCT id_l, id_r, cos FROM (
         |  SELECT l.vec_id AS id_l, r.vec_id AS id_r,
         |    ${duckCos("l.embedding", "r.embedding")} AS cos
         |  FROM b l JOIN b r ON l.band = r.band AND l.bucket = r.bucket
         |    AND l.vec_id < r.vec_id)
         |WHERE cos >= 0.3""".stripMargin,

    "d_ann_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_v FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS nbr_id, embedding AS nbr_v FROM embeddings),
         |scored AS (SELECT query_id, nbr_id, ${duckCos("q_v", "nbr_v")} AS cos
         |           FROM q, c WHERE query_id <> nbr_id)
         |SELECT query_id, nbr_id, cos, rank FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |            ORDER BY cos DESC, nbr_id) AS INT) AS rank FROM scored)
         |WHERE rank <= 5""".stripMargin,

    // LSH ANN twin: same deterministic hyperplane signs, 8-bit buckets,
    // hamming-1 multiprobe, exact top-k within probed buckets.
    "d_ann_lsh" -> {
      val probes = (Seq("bucket") ++ (0 until 8).map(j => s"xor(bucket, ${1L << j})"))
        .mkString("[", ", ", "]")
      s"""WITH c AS (SELECT vec_id AS nbr_id, embedding AS nbr_v,
         |            ${duckBucketExpr("embedding", 8)} AS bucket FROM embeddings),
         |q0 AS (SELECT vec_id AS query_id, embedding AS q_v,
         |            ${duckBucketExpr("embedding", 8)} AS bucket FROM embeddings WHERE vec_id < 10),
         |q AS (SELECT query_id, q_v, unnest($probes) AS bucket FROM q0),
         |scored AS (SELECT DISTINCT query_id, nbr_id, ${duckCos("q_v", "nbr_v")} AS cos
         |           FROM c JOIN q USING (bucket) WHERE query_id <> nbr_id)
         |SELECT query_id, nbr_id, cos, rank FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |            ORDER BY cos DESC, nbr_id) AS INT) AS rank FROM scored)
         |WHERE rank <= 5""".stripMargin
    },

    // IVF ANN twin: centroid seeds = the 16 corpus vectors with smallest
    // (h15(vec_id), vec_id); assignment/probes pick cells by unrounded
    // cosine (bit-identical fold in both engines), tie-broken by cell id.
    "d_ann_ivf" ->
      s"""WITH seeds AS (
         |  SELECT embedding AS cent, CAST(row_number() OVER (
         |    ORDER BY ${dH15("CAST(vec_id AS VARCHAR)")}, vec_id) - 1 AS INT) AS cell
         |  FROM embeddings QUALIFY cell < 16),
         |ac AS (SELECT e.vec_id AS nbr_id, e.embedding AS nbr_v, s.cell,
         |         ${duckCosRaw("e.embedding", "s.cent")} AS cos_c
         |       FROM embeddings e CROSS JOIN seeds s),
         |assigned AS (SELECT nbr_id, nbr_v, cell FROM ac
         |  QUALIFY row_number() OVER (PARTITION BY nbr_id ORDER BY cos_c DESC, cell) = 1),
         |probes AS (SELECT nbr_id AS query_id, nbr_v AS q_v, cell FROM ac WHERE nbr_id < 10
         |  QUALIFY row_number() OVER (PARTITION BY nbr_id ORDER BY cos_c DESC, cell) <= 4),
         |scored AS (SELECT query_id, nbr_id, ${duckCos("q_v", "nbr_v")} AS cos
         |           FROM assigned JOIN probes USING (cell) WHERE query_id <> nbr_id)
         |SELECT query_id, nbr_id, cos, rank FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |            ORDER BY cos DESC, nbr_id) AS INT) AS rank FROM scored)
         |WHERE rank <= 5""".stripMargin,

    // PQ ANN twin: codebooks = the 16 hash-seeded vectors cut into 4
    // 16-dim subspaces; codes = per-subspace L2² argmin (element-order
    // double fold, ties by codeword id); ADC = the s-ordered fold of
    // per-subspace (q − codeword)² partials — bit-identical to the
    // PqLut-entry + PqAdc table-read accumulation.
    "d_ann_pq" -> {
      val d2 = dFoldSum("list_transform(generate_series(1,16), " +
        "i -> (e.embedding[c.s*16 + i]::DOUBLE - c.cw[i]) * " +
        "(e.embedding[c.s*16 + i]::DOUBLE - c.cw[i]))")
      val d2q = dFoldSum("list_transform(generate_series(1,16), " +
        "i -> (q.q_v[c2.s*16 + i]::DOUBLE - c2.cw[i]) * " +
        "(q.q_v[c2.s*16 + i]::DOUBLE - c2.cw[i]))")
      s"""WITH seeds AS (
         |  SELECT embedding AS sv, CAST(row_number() OVER (
         |    ORDER BY ${dH15("CAST(vec_id AS VARCHAR)")}, vec_id) - 1 AS INT) AS j
         |  FROM embeddings QUALIFY j < 16),
         |cb AS (SELECT g.s, sd.j,
         |         list_transform(generate_series(1, 16),
         |           i -> sd.sv[g.s*16 + i]::DOUBLE) AS cw
         |       FROM seeds sd CROSS JOIN
         |         (SELECT unnest(generate_series(0, 3)) AS s) g),
         |d AS (SELECT e.vec_id, c.s, c.j, c.cw, $d2 AS d2
         |      FROM embeddings e CROSS JOIN cb c),
         |codes AS (SELECT vec_id, s, cw FROM d
         |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS q_v
         |      FROM embeddings WHERE vec_id < 10),
         |qd AS (SELECT q.query_id, c2.vec_id AS nbr_id, c2.s, $d2q AS d2s
         |       FROM q CROSS JOIN codes c2 WHERE q.query_id <> c2.vec_id),
         |scored AS (SELECT query_id, nbr_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(d2s ORDER BY s)),
         |      (a, x) -> a + x) AS ad2
         |  FROM qd GROUP BY query_id, nbr_id)
         |SELECT query_id, nbr_id, round(ad2, 6) AS ad2, rank FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |            ORDER BY ad2, nbr_id) AS INT) AS rank FROM scored)
         |WHERE rank <= 5""".stripMargin
    },

    // IVF-PQ twin: the d_ann_ivf cell CTEs composed with the d_ann_pq
    // code/decode CTEs (one shared seed set at nlist = ksub = 16); a
    // corpus vector lives in exactly one cell and probe cells are
    // distinct per query, so (query, nbr) pairs are already unique.
    "d_ann_ivfpq" -> {
      val d2 = dFoldSum("list_transform(generate_series(1,16), " +
        "i -> (e.embedding[c.s*16 + i]::DOUBLE - c.cw[i]) * " +
        "(e.embedding[c.s*16 + i]::DOUBLE - c.cw[i]))")
      val d2q = dFoldSum("list_transform(generate_series(1,16), " +
        "i -> (p.q_v[c2.s*16 + i]::DOUBLE - c2.cw[i]) * " +
        "(p.q_v[c2.s*16 + i]::DOUBLE - c2.cw[i]))")
      s"""WITH seeds AS (
         |  SELECT embedding AS sv, CAST(row_number() OVER (
         |    ORDER BY ${dH15("CAST(vec_id AS VARCHAR)")}, vec_id) - 1 AS INT) AS j
         |  FROM embeddings QUALIFY j < 16),
         |cb AS (SELECT g.s, sd.j,
         |         list_transform(generate_series(1, 16),
         |           i -> sd.sv[g.s*16 + i]::DOUBLE) AS cw
         |       FROM seeds sd CROSS JOIN
         |         (SELECT unnest(generate_series(0, 3)) AS s) g),
         |ac AS (SELECT e.vec_id AS nbr_id, e.embedding AS nbr_v, s.j AS cell,
         |         ${duckCosRaw("e.embedding", "s.sv")} AS cos_c
         |       FROM embeddings e CROSS JOIN seeds s),
         |assigned AS (SELECT nbr_id, cell FROM ac
         |  QUALIFY row_number() OVER (PARTITION BY nbr_id ORDER BY cos_c DESC, cell) = 1),
         |probes AS (SELECT nbr_id AS query_id, nbr_v AS q_v, cell FROM ac WHERE nbr_id < 10
         |  QUALIFY row_number() OVER (PARTITION BY nbr_id ORDER BY cos_c DESC, cell) <= 4),
         |d AS (SELECT e.vec_id, c.s, c.j, c.cw, $d2 AS d2
         |      FROM embeddings e CROSS JOIN cb c),
         |codes AS (SELECT vec_id, s, cw FROM d
         |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) = 1),
         |qd AS (SELECT p.query_id, a.nbr_id, c2.s, $d2q AS d2s
         |       FROM probes p JOIN assigned a USING (cell)
         |         JOIN codes c2 ON c2.vec_id = a.nbr_id
         |       WHERE p.query_id <> a.nbr_id),
         |scored AS (SELECT query_id, nbr_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(d2s ORDER BY s)),
         |      (a, x) -> a + x) AS ad2
         |  FROM qd GROUP BY query_id, nbr_id)
         |SELECT query_id, nbr_id, round(ad2, 6) AS ad2, rank FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |            ORDER BY ad2, nbr_id) AS INT) AS rank FROM scored)
         |WHERE rank <= 5""".stripMargin
    },

    // Media stats twin over the Verify-materialized generator output.
    "m_media_stats" ->
      s"""SELECT kind, count(*) AS n,
         | CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
         | round(avg(struct_extract(meta, 'width')) + 1e-9, 4) AS avg_w,
         | round(avg(struct_extract(meta, 'height')) + 1e-9, 4) AS avg_h,
         | CAST(sum(struct_extract(meta, 'nFrames')) AS BIGINT) AS total_frames
         |FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/media2k/*.parquet')
         |GROUP BY kind""".stripMargin,

    // Audio-features twin: decode the RIFF/WAVE PCM16 payload IN SQL —
    // hex-slice past the canonical 44-byte header, rebuild little-endian
    // int16 samples, recompute RMS and zero-crossing rate. An independent
    // full re-decode of the real Wav codec's output.
    "m_audio_features" ->
      s"""WITH a AS (
         |  SELECT media_id, struct_extract(meta, 'sampleRate') AS sample_rate,
         |         substr(hex(payload), 89) AS hx
         |  FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/media2k/*.parquet')
         |  WHERE kind = 'audio'),
         |b AS (SELECT media_id, sample_rate,
         |        list_transform(generate_series(1, len(hx)//2),
         |          j -> CAST(concat('0x', substr(hx, 2*j-1, 2)) AS INT)) AS bs
         |      FROM a),
         |s AS (SELECT media_id, sample_rate,
         |        list_transform(generate_series(1, len(bs)//2),
         |          i -> CASE WHEN bs[2*i-1] + 256*bs[2*i] >= 32768
         |               THEN bs[2*i-1] + 256*bs[2*i] - 65536
         |               ELSE bs[2*i-1] + 256*bs[2*i] END) AS sm
         |      FROM b)
         |SELECT media_id, CAST(sample_rate AS INT) AS sample_rate,
         |  CAST(len(sm) AS INT) AS n_samples,
         |  round(sqrt(list_sum(list_transform(sm, x -> CAST(x AS DOUBLE) * x))
         |        / len(sm)) + 1e-9, 4) AS rms,
         |  round(CAST(len(list_filter(generate_series(2, len(sm)),
         |          i -> (sm[i] < 0) <> (sm[i-1] < 0))) AS DOUBLE)
         |        / (len(sm) - 1) + 1e-9, 4) AS zcr
         |FROM s""".stripMargin,

    // aHash twin: decode the P5 raster IN SQL, independently recompute the
    // 16×16 nearest-neighbor resize for the copied ids, then the 8×8
    // sample → mean-threshold bit string — the oracle re-derives the
    // resize chain rather than assuming the invariance theorem.
    "m_image_ahash" ->
      s"""WITH img AS (
         |  SELECT media_id, struct_extract(meta, 'width') AS w,
         |         struct_extract(meta, 'height') AS h,
         |         substr(hex(payload), 39) AS hx
         |  FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/media2k/*.parquet')
         |  WHERE kind = 'image'),
         |b AS (SELECT media_id, w, h, list_transform(generate_series(1, len(hx)//2),
         |        i -> CAST(concat('0x', substr(hx, 2*i-1, 2)) AS INT)) AS bs FROM img),
         |u AS (
         |  SELECT media_id, w AS width, h AS height, bs FROM b
         |  UNION ALL
         |  SELECT media_id + 100000 AS media_id, 16 AS width, 16 AS height,
         |    list_transform(generate_series(0, 255),
         |      p -> bs[(p//16 * h//16)*w + (p%16 * w//16) + 1]) AS bs
         |  FROM b),
         |s AS (SELECT media_id, width, height,
         |  list_transform(generate_series(0, 63),
         |    k -> bs[(k//8 * height//8)*width + (k%8 * width//8) + 1]) AS px
         |  FROM u),
         |m AS (SELECT media_id, width, height, px, list_sum(px)/64.0 AS mean FROM s)
         |SELECT media_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
         |  array_to_string(list_transform(px,
         |    p -> CASE WHEN p > mean THEN '1' ELSE '0' END), '') AS ahash
         |FROM m""".stripMargin,

    // Media kNN twin: decode the P5 (PGM) payload IN SQL (hex-slice the
    // raster past the fixed-width 19-byte Netpbm header), rebuild the
    // 16-bucket byte histogram, then exact cosine top-3 — an independent
    // check of the real-codec decode path.
    "m_media_knn" -> {
      val dim16 = 16
      s"""WITH img AS (
         |  SELECT media_id, substr(hex(payload), 39) AS hx
         |  FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/media2k/*.parquet')
         |  WHERE kind = 'image'),
         |b AS (SELECT media_id, list_transform(generate_series(1, len(hx)//2),
         |        i -> CAST(concat('0x', substr(hx, 2*i-1, 2)) AS INT)) AS bs FROM img),
         |feat AS (SELECT media_id AS vec_id, list_transform(generate_series(0, 15),
         |        j -> CAST(CAST(len(list_filter(bs, x -> x // 16 = j)) AS DOUBLE)
         |             / len(bs) AS FLOAT)) AS emb FROM b),
         |q AS (SELECT vec_id AS query_id, emb AS q_v FROM feat WHERE vec_id < 30),
         |c AS (SELECT vec_id AS nbr_id, emb AS nbr_v FROM feat),
         |scored AS (SELECT query_id, nbr_id, ${duckCos("q_v", "nbr_v", dim16)} AS cos
         |           FROM q, c WHERE query_id <> nbr_id)
         |SELECT query_id, nbr_id, cos, rank FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |            ORDER BY cos DESC, nbr_id) AS INT) AS rank FROM scored)
         |WHERE rank <= 3""".stripMargin
    }
  )
}
