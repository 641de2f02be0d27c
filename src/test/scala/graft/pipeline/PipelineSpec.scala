package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Gen, GenConfig}
import graft.table.SnapshotTable

/** End-to-end verification of the north-star requirements (BASELINE.json):
  * per-sink aggregate counts, row-level token-array equality vs the oracle,
  * dropped-lane accounting, restart idempotence, salt/parallelism
  * invariance.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = GenConfig(rows = 20000, maxTok = 2048, parts = 8)
  private lazy val oracle = Oracle.runGenerated(cfg)
  private def tmpRoot(): String = Files.createTempDirectory("sinks").toString

  private def sparkCounters(df: org.apache.spark.sql.DataFrame): Map[(String, String), (Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3))).toMap

  test("flagship counters (no IO) match oracle exactly") {
    val counters = TokenPipeline.countersOnly(
      Gen.tokenseq(spark, cfg).toDF(), Gen.sourceAttrs(spark))
      .select("sink", "source", "row_count", "sum_n_tok")
    assert(sparkCounters(counters) == oracle.counters)
  }

  test("committed run: per-sink counters + dropped lanes match oracle") {
    val root = tmpRoot()
    val res = TokenPipeline.runPerSinkLegacy(spark, Gen.tokenseq(spark, cfg).toDF(),
      Gen.sourceAttrs(spark), TokenPipeline.Config(root, "job-a"))
    assert(sparkCounters(res.counters.select("sink", "source", "row_count", "sum_n_tok"))
      == oracle.counters)
    val droppedGot = res.droppedCounts.as[(String, Long)].collect().toMap
    assert(droppedGot == oracle.droppedByReason)
    // lineage: total rows across partitions == observed route_in metric
    val lineageTotal = res.lineage.agg(sum("rows")).as[Long].head()
    assert(lineageTotal == res.stageMetrics("route_in"))
    // stage-count conservation: rows_out(stage k) == rows_in(stage k+1),
    // and each stage's loss equals the oracle's dropped lane for it
    val m = res.stageMetrics
    val d = oracle.droppedByReason
    assert(m("parse_in") == cfg.rows)
    assert(m("parse_in") - m("parse_out") == d.getOrElse("parse_error", 0L))
    assert(m("parse_out") - m("enrich_out") == d.getOrElse("enrich_miss", 0L))
    assert(m("enrich_out") - m("remap_out") == d.getOrElse("vrl_abort", 0L))
    assert(m("remap_out") == m("route_in"))
  }

  test("routed rows: token-array equality per sink (north-star invariant)") {
    val root = tmpRoot()
    val res = TokenPipeline.runPerSinkLegacy(spark, Gen.tokenseq(spark, cfg).toDF(),
      Gen.sourceAttrs(spark), TokenPipeline.Config(root, "job-b"))
    for (sink <- Seq("sink_hot", "sink_long", "sink_pii", "_unmatched")) {
      val got = res.sinks(sink).read(spark).get
        .select("doc_id", "tokens", "n_tok", "source")
        .as[(String, Array[Int], Int, String)]
        .collect().sortBy(_._1)
        .map { case (d, t, n, s) => Oracle.RoutedRow(d, t.toVector, n, s) }
        .toVector
      assert(got == oracle.routed.getOrElse(sink, Vector.empty), s"sink $sink")
    }
  }

  test("restart: kill between sink commits → re-run → no duplicates") {
    val root = tmpRoot()
    // simulate a partial run that committed only sink_hot, then crashed
    val (flagged, _) = TokenPipeline.dataflow(
      Gen.tokenseq(spark, cfg).toDF(), Gen.sourceAttrs(spark), 1024)
    val hotOnly = new SnapshotTable(s"$root/sink_hot")
    hotOnly.append(graft.route.Route.sinkView(flagged, "sink_hot"),
      "job-c-sink_hot", partitionBy = Seq("source"))
    // full re-run with the same jobId resumes: sink_hot skipped, others written
    val res = TokenPipeline.runPerSinkLegacy(spark, Gen.tokenseq(spark, cfg).toDF(),
      Gen.sourceAttrs(spark), TokenPipeline.Config(root, "job-c"))
    assert(res.sinks("sink_hot").currentVersion == 1) // not re-committed
    assert(sparkCounters(res.counters.select("sink", "source", "row_count", "sum_n_tok"))
      == oracle.counters)
    // and a full second re-run is a complete no-op
    val res2 = TokenPipeline.runPerSinkLegacy(spark, Gen.tokenseq(spark, cfg).toDF(),
      Gen.sourceAttrs(spark), TokenPipeline.Config(root, "job-c"))
    assert(sparkCounters(res2.counters.select("sink", "source", "row_count", "sum_n_tok"))
      == oracle.counters)
  }

  test("multi-match single-write path: counters, dropped, metrics, rows match oracle") {
    val root = tmpRoot()
    val res = TokenPipeline.runMulti(spark, Gen.tokenseq(spark, cfg).toDF(),
      Gen.sourceAttrs(spark), TokenPipeline.Config(root, "job-m"))
    assert(sparkCounters(res.counters.select("sink", "source", "row_count", "sum_n_tok"))
      == oracle.counters)
    assert(res.droppedCounts.as[(String, Long)].collect().toMap == oracle.droppedByReason)
    val m = res.stageMetrics
    assert(m("parse_in") == cfg.rows && m("remap_out") == m("route_in"))
    assert(res.lineage.agg(sum("rows")).as[Long].head() == m("route_in"))
    // token-array equality per sink through the single-table view
    for (sink <- Seq("sink_hot", "sink_pii", "_unmatched")) {
      val got = res.sinkView(spark, sink).get
        .select("doc_id", "tokens", "n_tok", "source")
        .as[(String, Array[Int], Int, String)]
        .collect().sortBy(_._1)
        .map { case (d, t, n, s) => Oracle.RoutedRow(d, t.toVector, n, s) }
        .toVector
      assert(got == oracle.routed.getOrElse(sink, Vector.empty), s"sink $sink")
    }
    // restart with the same jobId: complete no-op, identical counters
    val res2 = TokenPipeline.runMulti(spark, Gen.tokenseq(spark, cfg).toDF(),
      Gen.sourceAttrs(spark), TokenPipeline.Config(root, "job-m"))
    assert(res2.table.currentVersion == 1)
    assert(sparkCounters(res2.counters.select("sink", "source", "row_count", "sum_n_tok"))
      == oracle.counters)
  }

  test("salt invariance: salting changes layout only, never counts") {
    val a = TokenPipeline.runPerSinkLegacy(spark, Gen.tokenseq(spark, cfg).toDF(),
      Gen.sourceAttrs(spark), TokenPipeline.Config(tmpRoot(), "job-s1", saltBuckets = 1))
    val b = TokenPipeline.runPerSinkLegacy(spark, Gen.tokenseq(spark, cfg).toDF(),
      Gen.sourceAttrs(spark), TokenPipeline.Config(tmpRoot(), "job-s2", saltBuckets = 16))
    assert(sparkCounters(a.counters.select("sink", "source", "row_count", "sum_n_tok"))
      == sparkCounters(b.counters.select("sink", "source", "row_count", "sum_n_tok")))
  }

  test("repartition invariance: generator content independent of parallelism") {
    // bit_xor: order-independent, overflow-free content digest
    def digest(parts: Int) = Gen.tokenseq(spark, cfg.copy(parts = parts)).toDF()
      .agg(expr("bit_xor(xxhash64(doc_id, n_tok, source))"),
        sum(aggregate(col("tokens"), lit(0L), (a, t) => a + t))).as[(Long, Long)].head()
    assert(digest(2) == digest(32))
  }

  test("exclusive-route single-write path matches the first-match oracle") {
    val root = tmpRoot()
    val (_, counters) = TokenPipeline.runExclusive(spark,
      Gen.tokenseq(spark, cfg).toDF(), Gen.sourceAttrs(spark),
      TokenPipeline.Config(root, "job-x"))
    val exOracle = Oracle.runGenerated(cfg, exclusive = true)
    assert(sparkCounters(counters.select("sink", "source", "row_count", "sum_n_tok"))
      == exOracle.counters)
  }

  test("grok parseMulti: first matching pattern wins, fields union") {
    import graft.parse.Grok
    val df = Seq("a/b/42", "x-7", "nope nope").toDF("s")
    val out = Grok.parseMulti(df, col("s"), Seq(
      Grok.compile("%{WORD:p}/%{WORD:q}/%{INT:n:int}"),
      Grok.compile("%{WORD:p}-%{INT:n:int}")))
      .select("s", "_parse_ok", "_grok_idx", "p", "q", "n")
      .as[(String, Boolean, Int, String, String, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a/b/42") == (("a/b/42", true, 0, "a", "b", Some(42L))))
    val x = out("x-7")
    assert(x._2 && x._3 == 1 && x._4 == "x" && x._5 == null && x._6.contains(7L))
    assert(!out("nope nope")._2)
  }

  test("salting defuses the hot-source shuffle partition") {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64, spark_partition_id, count}
    val df = Gen.tokenseq(spark, cfg).toDF()
    def maxPartFrac(d: org.apache.spark.sql.DataFrame): Double = {
      val counts = d.groupBy(spark_partition_id()).count().as[(Int, Long)].collect()
      counts.map(_._2).max.toDouble / counts.map(_._2).sum
    }
    // explicit partition count: AQE would otherwise coalesce this small
    // shuffle into one partition and hide the skew
    val unsalted = maxPartFrac(df.repartition(48, col("source")))
    val salted = maxPartFrac(df
      .withColumn("_salt", pmod(xxhash64(col("doc_id")), lit(8)))
      .repartition(48, col("source"), col("_salt")))
    assert(unsalted > 0.4, s"hot partition should dominate unsalted: $unsalted")
    assert(salted < unsalted / 3, s"salting must spread the hot source: $salted vs $unsalted")
  }

  test("skew exists by construction (hot web source ~50%)") {
    val dist = Gen.tokenseq(spark, cfg).toDF().groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(dist("web").toDouble / cfg.rows > 0.45)
    assert(dist.contains(Gen.GhostSource)) // enrich-miss lane is exercised
  }
}
