package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Gen, GenConfig}

/** Physical-plan shape assertions — the properties that decide whether the
  * job survives a 100× scale-up: column pruning reaches the scan, the
  * enrich join broadcasts, the parse stage stays narrow, filters push down.
  */
class PlanSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("planspec").toString + "/tok"
    Gen.tokenseq(spark, GenConfig(rows = 5000, parts = 4)).write.parquet(d)
    d
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("countersOnly prunes the tokens column out of the parquet scan") {
    val p = plan(TokenPipeline.countersOnly(spark.read.parquet(dir), Gen.sourceAttrs(spark)))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse(
      fail(s"no ReadSchema in plan:\n$p"))
    assert(!readSchema.contains("tokens"), s"tokens not pruned: $readSchema")
    assert(readSchema.contains("doc_id") && readSchema.contains("n_tok"))
  }

  test("enrich is a broadcast hash join — never a shuffled join") {
    val p = plan(graft.enrich.Enrich.lookup(
      spark.read.parquet(dir), Gen.sourceAttrs(spark), Seq("source")))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("parse stage is a narrow map: no Exchange in the plan") {
    val p = plan(graft.parse.Grok.parse(
      spark.read.parquet(dir), col("doc_id"), TokenPipeline.DocIdGrok))
    assert(!p.contains("Exchange"), p)
  }

  test("filter transform pushes its predicate into the scan") {
    val p = plan(spark.read.parquet(dir).filter(col("source") === "web")
      .select(col("doc_id")))
    val scanLine = p.linesIterator.find(_.contains("PushedFilters")).getOrElse(
      fail(s"no PushedFilters in plan:\n$p"))
    assert(scanLine.contains("EqualTo(source,web)"), scanLine)
  }

  test("full dataflow keeps one shuffle: the counters aggregation") {
    val df = TokenPipeline.countersOnly(spark.read.parquet(dir), Gen.sourceAttrs(spark))
    val exchanges = plan(df).linesIterator.count(_.trim.startsWith("+- Exchange"))
    // one hash-partitioning exchange for groupBy(sink, source); AQE may add
    // a read stage but not extra shuffles
    assert(exchanges <= 2, s"unexpected shuffle count $exchanges:\n${plan(df)}")
  }

  test("tag_cardinality_limit plan never funnels tags through one task") {
    for (df <- Seq(
      graft.ops.Transforms.tagCardinalityLimit(
        spark.read.parquet(dir), "source", col("n_tok"), 3),
      graft.ops.Transforms.tagCardinalityDropTag(
        spark.read.parquet(dir), "source", col("n_tok"), 3))) {
      val p = plan(df)
      // the first-seen cutoff must be a per-partition top-k
      // (TakeOrderedAndProject), not a global-sort window
      assert(!p.contains("Exchange SinglePartition"), p)
      assert(p.contains("TakeOrderedAndProject"), p)
    }
  }

  test("ddsketch aggregates partially before the shuffle (map-side combine)") {
    val p = plan(spark.read.parquet(dir).groupBy(col("source"))
      .agg(graft.sketch.DDSketch.sketch(col("n_tok")).as("sk")))
    val exchangeLine = p.linesIterator.indexWhere(_.contains("Exchange"))
    val partialLine = p.linesIterator.indexWhere(_.contains("partial_ddsketch"))
    assert(partialLine > exchangeLine && exchangeLine >= 0,
      s"partial_ddsketch must sit below (before) the Exchange:\n$p")
  }

  test("sequence packing is one shuffle + partition-local sort + one pass") {
    val p = plan(graft.tokens.TokenOps.packSequences(
      spark.read.parquet(dir).select("doc_id", "n_tok", "source"), 4096).toDF())
    assert(p.linesIterator.count(_.trim.startsWith("+- Exchange")) == 1, p)
    // the Sort node must be partition-local (global = false), never a
    // range-partitioned global sort
    val sortLine = p.linesIterator.find(_.trim.startsWith("+- Sort")).getOrElse(
      fail(s"no Sort in plan:\n$p"))
    assert(sortLine.contains("false"), s"sort must be partition-local: $sortLine")
  }

  test("fused curation makes at most 2 unfiltered scans of documents") {
    import spark.implicits._
    val ddir = Files.createTempDirectory("planspec-docs").toString
    (0L until 64L).map(i => (i, s"some repeated words number $i in a plain document body here",
      "en", "web", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$ddir/documents.parquet")
    val p = plan(graft.DataOpsQueries.queries("d_curation_full")(spark, ddir))
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    // the benchmark subtree's scan pushes doc_id < 5 down and reads a
    // handful of rows; full corpus passes are the ones that matter at 100 TB
    val full = scans.filterNot(_.contains("LessThan(doc_id,5)"))
    assert(scans.size <= 3, s"${scans.size} document scans:\n${scans.mkString("\n")}")
    assert(full.size <= 2, s"${full.size} UNFILTERED document scans:\n${full.mkString("\n")}")
  }

  test("stratified sample and tfidf top-k get a map-side WindowGroupLimit") {
    import spark.implicits._
    val d = (1L to 200L).map(i => (i, s"src${i % 3}", s"word${i % 7} word${i % 5} text"))
      .toDF("doc_id", "source", "text")
    val pSample = plan(graft.tokens.TokenOps.stratifiedSample(
      d.select("doc_id", "source"), col("source"), col("doc_id"), perGroup = 5))
    assert(pSample.contains("WindowGroupLimit"),
      s"stratified sample missing WindowGroupLimit:\n$pSample")
    // both a partial (map-side, pre-shuffle) and a final group limit
    assert("WindowGroupLimit".r.findAllIn(pSample).size >= 2,
      s"expected partial+final group limits:\n$pSample")
    val pTfidf = plan(graft.text.TextOps.tfidfTopK(d, col("text"), col("doc_id"), k = 2))
    assert(pTfidf.contains("WindowGroupLimit"),
      s"tfidf top-k missing WindowGroupLimit:\n$pTfidf")
  }

  test("whole-stage codegen covers the parse+enrich+remap pipeline") {
    val (flagged, _) = TokenPipeline.dataflow(
      spark.read.parquet(dir), Gen.sourceAttrs(spark), 1024)
    flagged.queryExecution.toRdd.count() // finalize the adaptive plan
    val formatted = flagged.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("codegen id"), formatted)
  }

  test("gelf reassembly is a single id-keyed shuffle (narrow parse, map-side count)") {
    import spark.implicits._
    val gdir = Files.createTempDirectory("planspec-gelf").toString + "/dg"
    Seq(1, 2, 3).map(i => f"1e0f${i}%016x0002aa")
      .toDF("hex").select(unhex(col("hex")).as("datagram")).write.parquet(gdir)
    val p = plan(graft.functions.Framing.reassembleGelf(
      spark.read.parquet(gdir), "datagram"))
    // one exchange for the msg_id aggregate; the chunk parse stays below it
    assert(p.linesIterator.count(_.trim.contains("Exchange")) == 1, p)
    val exchangeLine = p.linesIterator.indexWhere(_.contains("Exchange"))
    val parseLine = p.linesIterator.indexWhere(_.contains("gelf_chunk_parse"))
    assert(parseLine > exchangeLine && exchangeLine >= 0,
      s"chunk parse must sit below (before) the Exchange:\n$p")
  }

  test("banded cosine LSH shuffles only (band,bucket) joins + the skinny pair-distinct") {
    import spark.implicits._
    val vecs = (0L until 32L).map(i => (i, Array.tabulate(8)(d => (i * 7 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val p = plan(graft.sim.Similarity.cosineNearDupsBanded(
      vecs, col("vec_id"), col("embedding"), threshold = 0.3, bands = 2, rowBits = 4))
    // no broadcast NLJ / cartesian anywhere — the join is hash-keyed
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the distinct aggregate runs over (id_l, id_r, cos) only — vectors
    // never enter the dedup shuffle
    val aggLine = p.linesIterator.find(l => l.contains("HashAggregate") &&
      l.contains("id_l")).getOrElse(fail(s"no pair aggregate in plan:\n$p"))
    assert(!aggLine.contains("v_l") && !aggLine.contains("v_r"),
      s"vectors leaked into the dedup shuffle: $aggLine")
  }

  test("context-window chunking is fully narrow: no Exchange") {
    val p = plan(graft.tokens.TokenOps.chunkSequences(
      spark.read.parquet(dir), maxLen = 128, overlap = 32))
    assert(!p.contains("Exchange"), p)
  }

  test("token decontamination: bench side broadcasts, corpus aggregates once") {
    val corpus = spark.read.parquet(dir)
    val bench = graft.tokens.Winnow.genWithBoilerplate(spark, rows = 50,
      parts = 2, startId = 900000L).toDF()
    val p = plan(graft.tokens.TokenOps.tokenContamination(corpus, bench, n = 13))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus must never meet the bench in a shuffled join:\n$p")
    // corpus-side shuffles: exactly the one doc-keyed count aggregate
    // (the bench side's distinct adds its own tiny exchanges)
    val corpusAggExchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(doc_id"))
    assert(corpusAggExchanges == 1, s"corpus must shuffle exactly once:\n$p")
  }

  test("bloom probe prefilter is fully narrow: no Exchange, stays in codegen") {
    val sketch = new Array[Byte](512)
    val df = graft.tokens.TokenOps.bloomPrefilterWithSketch(
      sketch, spark.read.parquet(dir), k = 3)
    val p = plan(df)
    assert(!p.contains("Exchange"), p)
    // the probe projection (native content hash + bloom_probe) must sit
    // INSIDE a codegen stage — `*(n)` prefix on the Project line
    val projLine = p.linesIterator.find(_.contains("bloom_probe"))
      .getOrElse(fail(s"no probe projection in plan:\n$p"))
    assert(projLine.trim.matches("""^(\+- )?\*\(\d+\) Project.*"""),
      s"probe projection fell out of whole-stage codegen:\n$p")
  }

  test("pii scrub is fully narrow: no Exchange, regexes in codegen") {
    import spark.implicits._
    val d = graft.text.Pii.genPiiDocs(spark, rows = 500, parts = 4).toDF()
    val p = plan(graft.text.Pii.scrub(d, col("text"), col("doc_id")))
    assert(!p.contains("Exchange"), p)
  }

  test("bpe pair counts: partial agg before the shuffle, TakeOrdered not a global sort") {
    import spark.implicits._
    val d = (1L to 300L).map(i => (i, Array.tabulate(20)(j => ((i + j) % 50).toInt)))
      .toDF("doc_id", "tokens")
    val p = plan(graft.tokens.TokenOps.bpePairCounts(d, k = 16))
    // map-side combine: a partial_count aggregate below the exchange
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"pair count not map-side combined:\n$p")
    // global top-k must be TakeOrderedAndProject (per-partition top-k +
    // driver k-merge), never Sort + GlobalLimit over the pair table
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$p")
  }

  test("global shuffle: bucket-partitioned window, never a single-partition sort") {
    import spark.implicits._
    val d = (1L to 500L).map(i => (s"d$i", 10, "web")).toDF("doc_id", "n_tok", "source")
    val p = plan(graft.tokens.TokenOps.shuffleOrder(d, buckets = 8))
    // the rank window partitions by bucket — no Exchange SinglePartition
    // (the plan a global row_number() OVER (ORDER BY …) would force)
    assert(!p.contains("SinglePartition"), s"global sort leaked in:\n$p")
    assert(p.contains("Window"), p)
    // offsets arrive via broadcast, not a shuffled join
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("vocab prune: remap stage is narrow (vocab is a plan literal)") {
    import spark.implicits._
    val d = (1L to 200L).map(i => (s"d$i", Array.tabulate(16)(j => (i + j).toInt), 16, "web"))
      .toDF("doc_id", "tokens", "n_tok", "source")
    val p = plan(graft.tokens.TokenOps.pruneVocab(d, vocabSize = 8, unkId = 9999))
    // after the driver-side vocab cut the output plan is pure projection:
    // no Exchange, no Join — the vocab rides as a literal array
    assert(!p.contains("Exchange"), s"vocab prune shuffles:\n$p")
    assert(!p.contains("Join"), s"vocab prune joins:\n$p")
  }

  test("diversity sample gets a map-side WindowGroupLimit; url canon is narrow") {
    import spark.implicits._
    val vecs = (0L until 100L).map(i => (i, Array.tabulate(16)(j =>
      ((graft.core.Mix.mix64(i * 131L + j) % 1000L) / 1000.0f))))
      .toDF("vec_id", "embedding")
    val p = plan(graft.sim.Similarity.diversitySample(vecs, col("vec_id"),
      col("embedding"), perCell = 3, nlist = 8))
    assert(p.contains("WindowGroupLimit"), s"no group limit:\n$p")
    assert(p.toLowerCase.contains("partial"), s"no map-side limit phase:\n$p")

    val urls = (1L to 100L).map(i => (i, s"http://ex$i.com/a?b=$i"))
      .toDF("doc_id", "url")
    val pu = plan(urls.select(graft.text.Urls.canonicalize(col("url")).as("c")))
    assert(!pu.contains("Exchange"), s"url canon shuffles:\n$pu")
  }

  test("bm25: query terms broadcast, map-side group limit, partial tf aggregate") {
    import spark.implicits._
    val d = (1L to 300L).map(i => (i, s"word${i % 11} word${i % 7} word${i % 5} tail$i"))
      .toDF("doc_id", "text")
    val p = plan(graft.text.TextOps.bm25TopK(d, col("text"), col("doc_id"),
      d.filter(col("doc_id") < 3), col("doc_id"), col("text"), k = 5))
    assert(p.contains("BroadcastHashJoin"), s"query-term prune not broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"), s"no per-query group limit:\n$p")
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"tf aggregate not map-side combined:\n$p")
  }

  test("pq ann: narrow native encode/adc, queries broadcast, map-side group limit") {
    import spark.implicits._
    // parquet-backed corpus: over a LocalRelation Catalyst constant-folds
    // pq_encode at plan time and the pin can't see the encode stage
    val vdir = Files.createTempDirectory("planspec-pq").toString + "/vecs"
    (0L until 100L).map(i => (i, Array.tabulate(16)(j =>
      ((graft.core.Mix.mix64(i * 131L + j) % 1000L) / 1000.0f))))
      .toDF("vec_id", "embedding").write.parquet(vdir)
    val vecs = spark.read.parquet(vdir)
    val p = plan(graft.sim.Similarity.pqTopK(vecs, vecs.filter(col("vec_id") < 5),
      col("vec_id"), col("embedding"), k = 3, m = 4, ksub = 8))
    assert(p.contains("pq_encode") && p.contains("pq_adc"),
      s"native PQ expressions missing:\n$p")
    assert(p.contains("Broadcast"), s"query side not broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"), s"no group limit:\n$p")
    // the corpus exchange to the per-query window carries codes, not
    // vectors: nbr_v is projected away before the only shuffle
    val afterExchange = p.substring(p.indexOf("Exchange"))
    assert(!afterExchange.contains("nbr_v"),
      s"corpus vectors crossed the shuffle:\n$p")
  }

  test("duplicate-run removal: no cartesian; winner aggregate combines map-side") {
    val d = graft.tokens.Winnow.genWithBoilerplate(spark, rows = 200, parts = 4).toDF()
    val p = plan(graft.tokens.Winnow.removeDuplicateRuns(d))
    assert(!p.contains("Cartesian"), s"cartesian in strip plan:\n$p")
    assert(p.toLowerCase.contains("partial"), s"winner agg not map-side:\n$p")
  }

  test("semdedup: assignment narrow (literal centroids), pair join keyed by cell") {
    import spark.implicits._
    val d = (0L until 100L).map(i => (i, Array.tabulate(16)(j =>
      ((graft.core.Mix.mix64(i * 131L + j) % 1000L) / 1000.0f))))
      .toDF("vec_id", "embedding")
    val p = plan(graft.sim.Similarity.semDedup(d, col("vec_id"),
      col("embedding"), tau = 0.8, nlist = 8))
    // no cartesian anywhere: candidate pairs are confined to cells
    assert(!p.contains("Cartesian"), s"cartesian in semdedup plan:\n$p")
    // the pair join is keyed by the cell id
    val joinLine = p.linesIterator.find(l =>
      l.contains("Join") && l.contains("cell")).getOrElse(
      fail(s"no cell-keyed join in plan:\n$p"))
    assert(joinLine.contains("cell"), joinLine)
  }
}
