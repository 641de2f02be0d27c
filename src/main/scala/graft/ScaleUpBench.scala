package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf0.1 → sf1 scale point for the heavy data-ops queries (VERDICT r3 item
  * 2): the driver ships testdata only up to sf0.1, so this main
  * synthesizes documents/embeddings tables of the SAME SHAPE as the
  * driver's (31-word vocab, 10–100 words/doc, ~0.16% exact-dup rate, 20
  * sources, 5 langs; 64-dim ~unit-norm embeddings, 10 labels) at any row
  * count, deterministically (pure column functions of `id` — identical at
  * any parallelism), then times the `d_*`/`t_*` query subset on it.
  *
  * Usage:
  *   --materialize <dir> <nDocs> <nEmb>
  *   --run <dir> [namePrefix,...]   (default subset: d_,t_)
  *
  * Ratios between a 5 000-doc and a 50 000-doc run isolate data-scale
  * growth from generator differences (both points share this generator).
  */
object ScaleUpBench {

  /** The driver documents vocabulary (extracted from sf0.1 testdata). */
  private val Vocab = Seq("a", "agg", "batch", "big", "column", "customer",
    "data", "dup", "fast", "filter", "group", "hash", "join", "key", "line",
    "merge", "order", "part", "query", "row", "scan", "slow", "small",
    "sort", "spark", "stream", "table", "the", "value", "vector", "window")
  private val Langs = Seq("de", "en", "es", "fr", "zh")

  def documents(spark: SparkSession, n: Long): DataFrame = {
    val vocabArr = array(Vocab.map(lit): _*)
    val langArr = array(Langs.map(lit): _*)
    // text is a pure function of an "author" id; ~1/625 of docs reuse an
    // earlier author → exact duplicates at the testdata's observed rate
    val author = when(
      pmod(xxhash64(lit("dup"), col("id")), lit(625L)) === 0 && col("id") >= 40,
      col("id") - 40).otherwise(col("id"))
    val nWords = (pmod(xxhash64(lit("len"), author), lit(91L)) + 10).cast("int")
    val words = transform(sequence(lit(1), nWords),
      j => element_at(vocabArr,
        (pmod(xxhash64(lit("w"), author, j), lit(Vocab.size.toLong)) + 1).cast("int")))
    spark.range(0, n)
      .select(col("id").as("doc_id"),
        concat_ws(" ", words).as("text"),
        element_at(langArr, (pmod(col("id"), lit(5L)) + 1).cast("int")).as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20L)).cast("string")).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def embeddings(spark: SparkSession, n: Long, dim: Int = 64): DataFrame =
    spark.range(0, n)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          j => ((pmod(xxhash64(lit("e"), col("id"), j), lit(2001L)) - 1000) / 1730.0)
            .cast("float")).as("embedding"),
        pmod(col("id"), lit(10L)).cast("int").as("label"))

  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "--materialize" :: dir :: nDocs :: nEmb :: Nil =>
      val spark = session()
      documents(spark, nDocs.toLong).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      embeddings(spark, nEmb.toLong).repartition(8)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      println(s"MATERIALIZED $dir docs=$nDocs emb=$nEmb")
      spark.stop()

    case "--run" :: dir :: rest =>
      val prefixes = rest.headOption.map(_.split(",").toSeq).getOrElse(Seq("d_", "t_"))
      val spark = session()
      // warmup: parquet footers + codegen machinery
      scala.util.Try(spark.read.parquet(s"$dir/documents.parquet").count())
      // SPARK_GRAFT_PASSES=2 (default) warms each query once and times the
      // best of the remaining passes — the scale-RATIO measure; JIT/codegen
      // noise would otherwise swamp the 10× comparison
      val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
      val subset = SparkEntry.queries.toSeq
        .filter { case (n, _) => prefixes.exists(n.startsWith) }.sortBy(_._1)
      val results = subset.map { case (name, fn) =>
        val times = (1 to passes).map { _ =>
          val t0 = System.nanoTime()
          val ok = scala.util.Try(fn(spark, dir).count())
          if (ok.isSuccess) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        name -> (if (times.exists(_ < 0)) -1.0
                 else if (passes > 1) times.tail.min else times.head)
      }
      val qs = results.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
      println(s"""SCALEUP {"dir":"$dir","total":${results.map(_._2).filter(_ > 0).sum},"queries":$qs}""")
      spark.stop()

    case "--neardup" :: dir :: rest if rest.size <= 1 =>
      // simhash near-dup + survivor selection at a given LSH band width —
      // the scale lever measurement (8-bit bands blow up quadratically at
      // 50k docs; see Dedupe.simhashNearDups scaladoc). With no width
      // argument the operator SELF-SIZES (Dedupe.autoBandBits) — the
      // round-5 scale-safety contract: defaults must survive any corpus.
      val spark = session()
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nDocs = docs.count()
      val bandBits = rest.headOption.map(_.toInt)
        .getOrElse(graft.dedup.Dedupe.autoBandBits(nDocs))
      val t0 = System.nanoTime()
      val pairs = graft.dedup.Dedupe.simhashNearDups(
        docs, col("text"), col("doc_id"), maxDist = 3, bandBits = bandBits)
      val nPairs = pairs.count()
      val tPairs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val survivors = graft.dedup.Dedupe.dedupeByPairs(
        docs, col("doc_id"), pairs).count()
      val tDedupe = (System.nanoTime() - t1) / 1e9
      println(s"""NEARDUP {"dir":"$dir","band_bits":$bandBits,"pairs":$nPairs,""" +
        s""""pairs_secs":$tPairs,"survivors":$survivors,"dedupe_secs":$tDedupe}""")
      spark.stop()

    case "--winnow" :: nDocs :: rest if rest.size <= 1 =>
      // substring-dedup scale probe: winnowing fingerprints at any corpus
      // size (gen_boiler shape — 35% of docs carry one of 24 shared
      // 96-token runs, so shared-fingerprint hotness grows linearly with
      // the corpus, the realistic boilerplate regime). The token table is
      // materialized first so the timed region is the operator, not the
      // generator.
      val spark = session()
      val dir = rest.headOption.getOrElse("/tmp/graft_winnow_input")
      graft.tokens.Winnow.genWithBoilerplate(spark, nDocs.toLong, parts = 32)
        .toDF().write.mode("overwrite").parquet(s"$dir/tokens.parquet")
      val df = spark.read.parquet(s"$dir/tokens.parquet")
      val tf = System.nanoTime()
      graft.tokens.Winnow.fingerprints(df).count()
      val fpSecs = (System.nanoTime() - tf) / 1e9
      // two timed passes: the second is the steady-state figure (JIT/GC
      // absorb the first — same best-of rule as --run)
      val timed = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val stats = graft.tokens.Winnow.dupStats(df)
          .agg(count(lit(1)).as("dup_docs"), sum(col("n_fp")).as("n_fp"),
            sum(col("dup_fp")).as("dup_fp")).collect()(0)
        (stats, (System.nanoTime() - t0) / 1e9)
      }
      val (stats, _) = timed.head
      val secs = timed.map(_._2).min
      println(s"""WINNOW {"docs":$nDocs,"dup_docs":${stats.getLong(0)},""" +
        s""""n_fp":${stats.getLong(1)},"dup_fp":${stats.getLong(2)},""" +
        s""""fp_secs":$fpSecs,"secs":$secs,"secs_cold":${timed.head._2}}""")
      spark.stop()

    case "--para" :: nDocs :: rest if rest.size <= 1 =>
      // paragraph-dedup scale probe (gen_para shape — ~40% of paragraph
      // slots draw from a FIXED 24-paragraph boilerplate pool, so per-hash
      // copy counts grow LINEARLY with the corpus: the hot-key regime the
      // min-struct partial agg + streamed probe join is built for).
      val spark = session()
      val dir = rest.headOption.getOrElse("/tmp/graft_para_input")
      graft.text.ParagraphDedup.genParaDocs(spark, nDocs.toLong, parts = 32)
        .toDF().write.mode("overwrite").parquet(s"$dir/paradocs.parquet")
      val df = spark.read.parquet(s"$dir/paradocs.parquet")
      def probe(out: DataFrame): (org.apache.spark.sql.Row, Double) = {
        val timed = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val r = out.agg(sum(col("n_para")).as("n_para"),
            sum(col("n_removed")).as("n_removed")).collect()(0)
          (r, (System.nanoTime() - t0) / 1e9)
        }
        (timed.head._1, timed.map(_._2).min)
      }
      val (fw, fwSecs) = probe(graft.text.ParagraphDedup.dedupeFirstWins(df))
      val (fc, fcSecs) = probe(graft.text.ParagraphDedup.stripCommon(df, minDocs = 3))
      println(s"""PARA {"docs":$nDocs,"n_para":${fw.getLong(0)},""" +
        s""""removed_firstwins":${fw.getLong(1)},"secs_firstwins":$fwSecs,""" +
        s""""removed_common":${fc.getLong(1)},"secs_common":$fcSecs}""")
      spark.stop()

    case "--embed" :: dir :: nBits :: Nil =>
      // embedding cosine near-dup at a given sign-bucket width — the same
      // scale lever as simhash bandBits: 2^nBits buckets, candidates grow
      // with (corpus/2^nBits)^2 per bucket (see cosineNearDups scaladoc)
      val spark = session()
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      emb.count()
      val t0 = System.nanoTime()
      val nPairs = graft.sim.Similarity.cosineNearDups(
        emb, col("vec_id"), col("embedding"),
        threshold = 0.3, nBits = nBits.toInt).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"""EMBED {"dir":"$dir","n_bits":$nBits,"pairs":$nPairs,"secs":$secs}""")
      spark.stop()

    case "--embed-banded" :: dir :: bands :: rest if rest.size <= 1 =>
      // no rowBits argument → the operator self-sizes from its own count()
      val spark = session()
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      emb.count()
      val rowBits = rest.headOption.map(_.toInt).getOrElse(0)
      val t0 = System.nanoTime()
      val nPairs = graft.sim.Similarity.cosineNearDupsBanded(
        emb, col("vec_id"), col("embedding"),
        threshold = 0.3, bands = bands.toInt, rowBits = rowBits).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"""EMBED_BANDED {"dir":"$dir","bands":$bands,"row_bits":$rowBits,""" +
        s""""pairs":$nPairs,"secs":$secs}""")
      spark.stop()

    case "--pack" :: dir :: shards :: Nil =>
      // sequence-packing throughput over a token table (the north-star
      // input shape) — steady-state best-of-2; shards is the hot-source
      // fan-out lever (TokenOps.packSequences scaladoc)
      val spark = session()
      val toks = spark.read.parquet(dir)
      val rows = toks.count()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val packs = graft.tokens.TokenOps.packSequences(toks, budget = 2048,
          shards = shards.toInt).count()
        (packs, (System.nanoTime() - t0) / 1e9)
      }
      val (packedRows, secs) = times.minBy(_._2)
      println(s"""PACK {"dir":"$dir","rows":$rows,"shards":$shards,""" +
        s""""packed_rows":$packedRows,"secs":$secs,"rows_per_sec":${(rows / secs).toLong}}""")
      spark.stop()

    case "--chunk" :: nDocs :: rest if rest.size <= 1 =>
      // context-window chunking scale probe: fully narrow op — wall should
      // track input size ~linearly with zero shuffle (the plan to verify)
      val spark = session()
      val dir = rest.headOption.getOrElse("/tmp/graft_chunk_input")
      graft.tokens.Winnow.genWithBoilerplate(spark, nDocs.toLong, parts = 32)
        .toDF().write.mode("overwrite").parquet(s"$dir/tokens.parquet")
      val df = spark.read.parquet(s"$dir/tokens.parquet")
      val timed = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = graft.tokens.TokenOps.chunkSequences(df, maxLen = 128, overlap = 32)
          .agg(count(lit(1)).as("chunks"), sum(col("chunk_len")).as("toks")).collect()(0)
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (r, secs) = timed.minBy(_._2)
      println(s"""CHUNK {"docs":$nDocs,"chunks":${r.getLong(0)},""" +
        s""""chunk_tokens":${r.getLong(1)},"secs":$secs,"secs_cold":${timed.head._2}}""")
      spark.stop()

    case "--decontam" :: nDocs :: rest if rest.size <= 1 =>
      // token-level 13-gram decontamination scale probe: bench fixed at
      // 2000 docs (benchmarks don't grow with the corpus); corpus-side
      // explode+broadcast-join is the scaling surface
      val spark = session()
      val dir = rest.headOption.getOrElse("/tmp/graft_decontam_input")
      graft.tokens.Winnow.genWithBoilerplate(spark, nDocs.toLong, parts = 32)
        .toDF().write.mode("overwrite").parquet(s"$dir/tokens.parquet")
      val corpus = spark.read.parquet(s"$dir/tokens.parquet")
      val bench = graft.tokens.Winnow.genWithBoilerplate(spark, rows = 2000,
        parts = 8, startId = 500000000L).toDF()
      val timed = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = graft.tokens.TokenOps.tokenContamination(corpus, bench, n = 13)
          .agg(count(lit(1)).as("docs_hit"), sum(col("hit_grams")).as("hits")).collect()(0)
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (r, secs) = timed.minBy(_._2)
      println(s"""DECONTAM {"docs":$nDocs,"docs_hit":${r.getLong(0)},""" +
        s""""hit_grams":${r.getLong(1)},"secs":$secs,"secs_cold":${timed.head._2}}""")
      spark.stop()

    case "--incr" :: corpusRows :: batchRows :: rest if rest.size <= 1 =>
      // incremental-dedup scale probe: bloom fast-pass + maybe-lane anti
      // join VS the plain full-batch anti join, same input, same result —
      // the measured case for the bloom pre-filter's shuffle savings
      val spark = session()
      val dir = rest.headOption.getOrElse("/tmp/graft_incr_input")
      graft.tokens.Winnow.genWithDups(spark, corpusRows.toLong, batchRows.toLong,
        parts = 32).toDF().write.mode("overwrite").parquet(s"$dir/tokens.parquet")
      val all = spark.read.parquet(s"$dir/tokens.parquet")
      val batch = all.filter(col("lane") === "batch")
      // the persisted content-hash index of the committed corpus — built
      // once at commit time (like any snapshot column statistic); BOTH
      // paths below read it, so the comparison isolates the per-batch plan
      all.filter(col("lane") === "corpus")
        .select(graft.tokens.TokenOps.contentHash(col("tokens")).as("h"))
        .write.mode("overwrite").parquet(s"$dir/corpus_idx.parquet")
      val corpusIdx = spark.read.parquet(s"$dir/corpus_idx.parquet")
      val mBits = 1L << 26 // 64 Mbit -> 8 MiB sketch
      // shuffle-bytes listener: wall time on ONE host hides shuffle cost
      // (blocks are memory/disk-local); bytes written is the signal that
      // predicts multi-executor network cost
      val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
      def time2(f: => Long): (Long, Double, Long) = {
        val timed = (1 to 2).map { _ =>
          shuffleBytes.set(0)
          val t0 = System.nanoTime(); val n = f
          val secs = (System.nanoTime() - t0) / 1e9
          Thread.sleep(1000) // let the listener bus drain stage events
          (n, secs, shuffleBytes.get())
        }
        timed.minBy(_._2)
      }
      // sketch built ONCE per corpus commit (timed as build), then every
      // incremental batch pays only probe + streamed-index resolve
      val tb = System.nanoTime()
      val sketch = graft.tokens.TokenOps.bloomSketchValue(corpusIdx, mBits,
        k = 3, hash = col("h"))
      val buildSecs = (System.nanoTime() - tb) / 1e9
      val (nBloom, sBloom, shBloom) = time2(
        graft.tokens.TokenOps.incrementalDedupe(corpusIdx, batch, mBits = mBits,
          k = 3, prebuiltSketch = Some(sketch), corpusHash = col("h")).count())
      val (nExact, sExact, shExact) = time2(
        batch.join(corpusIdx.select(col("h").as("_ch")).distinct(),
          graft.tokens.TokenOps.contentHash(col("tokens")) === col("_ch"), "left_anti").count())
      println(s"""INCR {"corpus":$corpusRows,"batch":$batchRows,"m_bits":$mBits,""" +
        s""""bloom_build_secs":$buildSecs,""" +
        s""""new_bloom":$nBloom,"secs_bloom_per_batch":$sBloom,"shuffle_bytes_bloom":$shBloom,""" +
        s""""new_exact":$nExact,"secs_exact_per_batch":$sExact,"shuffle_bytes_exact":$shExact}""")
      spark.stop()

    case "--pii" :: nDocs :: rest if rest.size <= 1 =>
      // PII scrub scale probe: fully narrow regex op — wall should track
      // input ~linearly with zero shuffle (like --chunk)
      val spark = session()
      val dir = rest.headOption.getOrElse("/tmp/graft_pii_input")
      graft.text.Pii.genPiiDocs(spark, nDocs.toLong, parts = 32)
        .toDF().write.mode("overwrite").parquet(s"$dir/pii.parquet")
      val df = spark.read.parquet(s"$dir/pii.parquet")
      val timed = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = graft.text.Pii.scrub(df, col("text"), col("doc_id"))
          .agg(sum(col("n_email") + col("n_ip") + col("n_ssn") + col("n_phone"))
            .as("hits"), sum(length(col("scrubbed"))).as("out_chars")).collect()(0)
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (rp, pSecs) = timed.minBy(_._2)
      println(s"""PII {"docs":$nDocs,"hits":${rp.getLong(0)},""" +
        s""""out_chars":${rp.getLong(1)},"secs":$pSecs,"secs_cold":${timed.head._2}}""")
      spark.stop()

    case "--bpe" :: nDocs :: rest if rest.size <= 1 =>
      // BPE pair-count scale probe: narrow pair explode + map-side-combined
      // count + TakeOrdered top-k — the aggregate keys are vocab²-bounded,
      // so wall should grow with token volume, not with k
      val spark = session()
      val dir = rest.headOption.getOrElse("/tmp/graft_bpe_input")
      graft.tokens.Winnow.genWithBoilerplate(spark, nDocs.toLong, parts = 32)
        .toDF().write.mode("overwrite").parquet(s"$dir/tokens.parquet")
      val df = spark.read.parquet(s"$dir/tokens.parquet")
      val timed = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val top = graft.tokens.TokenOps.bpePairCounts(df, k = 256)
          .agg(count(lit(1)).as("k"), sum(col("n")).as("top_mass"),
            max(col("n")).as("max_n")).collect()(0)
        (top, (System.nanoTime() - t0) / 1e9)
      }
      val (rb, bSecs) = timed.minBy(_._2)
      println(s"""BPE {"docs":$nDocs,"k":${rb.getLong(0)},""" +
        s""""top_mass":${rb.getLong(1)},"max_n":${rb.getLong(2)},""" +
        s""""secs":$bSecs,"secs_cold":${timed.head._2}}""")
      spark.stop()

    case "--strip" :: nDocs :: rest if rest.size <= 1 =>
      // duplicate-run removal scale probe (gen_boiler shape): the
      // stride-1 site stream is the inherent cost of exact substring
      // dedup; what must NOT grow super-linearly is the winner aggregate
      // (duplicated grams only) and the loser join.
      val spark = session()
      val dir = rest.headOption.getOrElse("/tmp/graft_strip_input")
      graft.tokens.Winnow.genWithBoilerplate(spark, nDocs.toLong, parts = 32)
        .toDF().write.mode("overwrite").parquet(s"$dir/tokens.parquet")
      val df = spark.read.parquet(s"$dir/tokens.parquet")
      val timed = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val stats = graft.tokens.Winnow.removeDuplicateRuns(df)
          .agg(count(lit(1)).as("docs_hit"), sum(col("n_removed")).as("toks_removed"))
          .collect()(0)
        (stats, (System.nanoTime() - t0) / 1e9)
      }
      val (stats, _) = timed.head
      println(s"""STRIP {"docs":$nDocs,"docs_hit":${stats.getLong(0)},""" +
        s""""toks_removed":${stats.getLong(1)},"secs":${timed.map(_._2).min},""" +
        s""""secs_cold":${timed.head._2}}""")
      spark.stop()

    case "--shuffle" :: nRows :: rest if rest.size <= 1 =>
      // global training-order shuffle probe: the bucketed-rank plan's
      // cost must stay ~linear (per-bucket window sorts N/B rows; B
      // self-sizes). Input materialized first; timed region = the op.
      val spark = session()
      val dir = rest.headOption.getOrElse("/tmp/graft_shuffle_input")
      graft.core.Gen.tokenseq(spark,
          graft.core.GenConfig(rows = nRows.toLong, maxTok = 32, parts = 32))
        .toDF().select(col("doc_id"), col("n_tok"), col("source"))
        .write.mode("overwrite").parquet(s"$dir/rows.parquet")
      val df = spark.read.parquet(s"$dir/rows.parquet")
      val timed = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val mx = graft.tokens.TokenOps.shuffleOrder(df) // self-sized buckets
          .agg(max(col("order_idx")).as("mx")).collect()(0).getLong(0)
        (mx, (System.nanoTime() - t0) / 1e9)
      }
      println(s"""SHUFFLE {"rows":$nRows,"max_idx":${timed.head._1},""" +
        s""""secs":${timed.map(_._2).min},"secs_cold":${timed.head._2}}""")
      spark.stop()

    case "--semdedup" :: dir :: rest if rest.size <= 1 =>
      // SemDeDup scale probe over the materialized embeddings table. With
      // no nlist argument the operator SELF-SIZES (Similarity.autoNlist —
      // cells grow linearly with the corpus so per-cell pair work stays
      // ~constant); an explicit nlist measures the lever directly.
      val spark = session()
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val nVecs = emb.count()
      val nlist = rest.headOption.map(_.toInt)
        .getOrElse(graft.sim.Similarity.autoNlist(nVecs))
      val timed = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val nDup = graft.sim.Similarity.semDedup(emb, col("vec_id"),
          col("embedding"), tau = 0.3, nlist = nlist)
          .filter(col("is_dup")).count()
        (nDup, (System.nanoTime() - t0) / 1e9)
      }
      val (nDup, sSecs) = timed.minBy(_._2)
      println(s"""SEMDEDUP {"dir":"$dir","vectors":$nVecs,"nlist":$nlist,""" +
        s""""dups":$nDup,"secs":$sSecs,"secs_cold":${timed.head._2}}""")
      spark.stop()

    case "--pq" :: dir :: rest if rest.size <= 1 =>
      // ANN scale probe: exact brute force vs compressed-domain PQ vs
      // cell-pruned IVF-PQ over the materialized embeddings, same query
      // set — the measured cost ladder of the three search architectures.
      val spark = session()
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val nVecs = emb.count()
      val nq = rest.headOption.map(_.toInt).getOrElse(100)
      val q = emb.filter(col("vec_id") < nq)
      def timed(f: => Long): (Long, Double) = {
        val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
      }
      val (nB, tB) = timed(graft.sim.Similarity.bruteForceTopK(
        emb, q, col("vec_id"), col("embedding"), k = 10).count())
      val (nP, tP) = timed(graft.sim.Similarity.pqTopK(
        emb, q, col("vec_id"), col("embedding"), k = 10).count())
      val nlist = graft.sim.Similarity.autoNlist(nVecs)
      val (nI, tI) = timed(graft.sim.Similarity.ivfPqTopK(
        emb, q, col("vec_id"), col("embedding"), k = 10,
        nlist = nlist, nprobe = math.max(1, nlist / 4)).count())
      println(s"""PQ {"dir":"$dir","vectors":$nVecs,"queries":$nq,"nlist":$nlist,""" +
        s""""brute":{"rows":$nB,"secs":$tB},"pq":{"rows":$nP,"secs":$tP},""" +
        s""""ivfpq":{"rows":$nI,"secs":$tI}}""")
      spark.stop()

    case "--pqstage" :: dir :: rest if rest.size <= 1 =>
      // stage-level timing for the PQ scan: encode-only, pair-scored
      // without the top-k window, and the full query — locates the cost
      val spark = session()
      import org.apache.spark.sql.graft.Bridge
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val nq = rest.headOption.map(_.toInt).getOrElse(100)
      val q0 = emb.filter(col("vec_id") < nq)
      val cbs = graft.sim.Similarity.pqCodebooks(emb, col("vec_id"), col("embedding"), 4, 16)
      val coded = emb.select(col("vec_id").as("nbr_id"), col("embedding").as("nbr_v"))
        .withColumn("codes", Bridge.column(graft.sim.PqEncode(Bridge.expression(col("nbr_v")), cbs)))
        .select("nbr_id", "codes")
      def t(f: => Long): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      val tEnc = t(coded.count())
      val q = q0.select(col("vec_id").as("query_id"), col("embedding").as("q_v"))
        .withColumn("lut", Bridge.column(graft.sim.PqLut(Bridge.expression(col("q_v")), cbs)))
        .select("query_id", "lut")
      val scored = coded.join(broadcast(q), col("query_id") =!= col("nbr_id"))
        .withColumn("ad2", Bridge.column(graft.sim.PqAdc(
          Bridge.expression(col("lut")), Bridge.expression(col("codes")), 4, 16)))
        .select("query_id", "nbr_id", "ad2")
      val tScore = t(scored.filter(col("ad2") < -1.0).count()) // forces full scan, ~0 rows out
      val tFull = t(graft.sim.Similarity.pqTopK(emb, q0, col("vec_id"), col("embedding"), k = 10).count())
      // brute stages for contrast
      val bScored = emb.select(col("vec_id").as("nbr_id"), col("embedding").as("nbr_v"),
          graft.sim.Similarity.norm(col("embedding")).as("n_c"))
        .join(broadcast(q0.select(col("vec_id").as("query_id"), col("embedding").as("q_v"),
          graft.sim.Similarity.norm(col("embedding")).as("n_q"))),
          col("query_id") =!= col("nbr_id"))
        .withColumn("cos", graft.sim.Similarity.dot(col("q_v"), col("nbr_v")) / (col("n_q") * col("n_c")))
        .select("query_id", "nbr_id", "cos")
      val tBScore = t(bScored.filter(col("cos") > 2.0).count())
      // identical windows over the two skinny scored sets
      import org.apache.spark.sql.expressions.Window
      val wP = Window.partitionBy(col("query_id")).orderBy(col("ad2"), col("nbr_id"))
      val tPqWin = t(scored.withColumn("rank", row_number().over(wP))
        .filter(col("rank") <= 10).count())
      val wB = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nbr_id"))
      val tBWin = t(bScored.withColumn("rank", row_number().over(wB))
        .filter(col("rank") <= 10).count())
      val plan = graft.sim.Similarity.pqTopK(emb, q0, col("vec_id"),
        col("embedding"), k = 10).queryExecution.executedPlan.toString
      val hasPartial = plan.contains("WindowGroupLimit") && plan.contains("Partial")
      // isolate the sort-key: pq rows ranked by a synthetic cheap double,
      // and by nbr_id alone; brute ranked ascending like pq
      val wS = Window.partitionBy(col("query_id"))
        .orderBy((col("nbr_id") * 1.0).as("synth"), col("nbr_id"))
      val tPqSynth = t(scored.withColumn("rank", row_number().over(wS))
        .filter(col("rank") <= 10).count())
      // tie-heavy synthetic key (500 distinct values) — comparator probe
      val wT = Window.partitionBy(col("query_id"))
        .orderBy((pmod(col("nbr_id"), lit(500L)) * 1.0).as("synth"), col("nbr_id"))
      val tPqTies = t(scored.withColumn("rank", row_number().over(wT))
        .filter(col("rank") <= 10).count())
      // materialization probe: persist the skinny scored rows, then window
      val cached = scored.persist()
      val tMat = t(cached.count())
      val tWinCached = t(cached.withColumn("rank", row_number().over(wP))
        .filter(col("rank") <= 10).count())
      cached.unpersist()
      // codegen-pathology probe: same live window with whole-stage codegen off
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val tWinNoWscg = t(scored.withColumn("rank", row_number().over(wP))
        .filter(col("rank") <= 10).count())
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val wBA = Window.partitionBy(col("query_id")).orderBy(col("cos"), col("nbr_id"))
      val tBWinAsc = t(bScored.withColumn("rank", row_number().over(wBA))
        .filter(col("rank") <= 10).count())
      println(s"""PQSTAGE {"dir":"$dir","encode_secs":$tEnc,"pq_scan_secs":$tScore,""" +
        s""""pq_win_secs":$tPqWin,"brute_win_secs":$tBWin,"pq_win_synthkey_secs":$tPqSynth,""" +
        s""""pq_win_tieskey_secs":$tPqTies,"pq_mat_secs":$tMat,"pq_win_cached_secs":$tWinCached,"pq_win_nowscg_secs":$tWinNoWscg,""" +
        s""""brute_win_asc_secs":$tBWinAsc,""" +
        s""""pq_full_secs":$tFull,"brute_scan_secs":$tBScore,"pq_partial_limit":$hasPartial}""")
      spark.stop()

    case "--bm25" :: dir :: rest if rest.size <= 1 =>
      // retrieval scale probe: BM25 top-k over the materialized documents
      // with the first nq docs as queries — the query-vocab prune keeps
      // the model bounded regardless of corpus vocabulary.
      val spark = session()
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nDocs = docs.count()
      val nq = rest.headOption.map(_.toInt).getOrElse(20)
      val t0 = System.nanoTime()
      val n = graft.text.TextOps.bm25TopK(docs, col("text"), col("doc_id"),
        docs.filter(col("doc_id") < nq), col("doc_id"), col("text"), k = 10).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"""BM25 {"dir":"$dir","docs":$nDocs,"queries":$nq,"rows":$n,"secs":$secs}""")
      spark.stop()

    case "--hll" :: nRows :: rest if rest.size <= 1 =>
      // cardinality scale probe: HLL sketch vs exact count(distinct) over
      // a generated keyed stream — the shuffle-constant vs key-keyed
      // shuffle trade measured at row scale.
      val spark = session()
      import spark.implicits._
      val n = nRows.toLong
      val groups = rest.headOption.map(_.toInt).getOrElse(8)
      val rows = spark.range(n).select(
        (col("id") % groups).cast("string").as("grp"),
        // ~n/3 distinct keys per group, hash-scattered
        ((col("id") * 2654435761L) % (n / 3 + 1)).as("k"))
      val t0 = System.nanoTime()
      val est = rows.groupBy("grp")
        .agg(graft.sketch.Hll.agg(col("k"), p = 12).as("sk"))
        .select(graft.sketch.Hll.estimate(col("sk"), p = 12).as("e"))
        .agg(org.apache.spark.sql.functions.sum("e")).head().getDouble(0)
      val tHll = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val exact = rows.groupBy("grp")
        .agg(countDistinct(col("k")).as("d"))
        .agg(org.apache.spark.sql.functions.sum("d")).head().getLong(0)
      val tExact = (System.nanoTime() - t1) / 1e9
      println(s"""HLL {"rows":$n,"groups":$groups,"est_sum":$est,"exact_sum":$exact,""" +
        s""""err":${math.abs(est - exact) / exact},"hll_secs":$tHll,"exact_secs":$tExact}""")
      spark.stop()

    case other =>
      System.err.println(s"usage: --materialize dir nDocs nEmb | --run dir [prefixes] | --neardup dir bandBits | --embed dir nBits | --embed-banded dir bands rowBits | --pack dir shards | --chunk nDocs [dir] | --decontam nDocs [dir] | --incr corpusRows batchRows [dir] | --pii nDocs [dir] | --strip nDocs [dir] | --shuffle nRows [dir] | --bpe nDocs [dir] | --semdedup dir [nlist] | --pq dir [nq] | --bm25 dir [nq] | --hll nRows [groups] (got $other)")
      sys.exit(2)
  }
}
