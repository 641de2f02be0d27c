package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Gen
import graft.pipeline.TokenPipeline

/** At-scale restart evidence for the north rule's "resumes at the last
  * committed snapshot without duplicating sink rows": run the COMMITTED
  * pipeline path ([[TokenPipeline.runMulti]]) over a 10 M-row input, let
  * the harness SIGKILL the JVM mid-run (see bin/restart-10m.sh), re-run
  * with the same jobId, and assert exactly-once results:
  *
  *   - zero duplicate routed rows: count == distinct (sink, doc_id) count
  *   - per-sink counters equal the no-IO counters oracle on the same input
  *
  * The kill lands wherever the timer says — mid-parquet-write (orphaned
  * uncommitted snap dir, invisible to reads) or between the multi and
  * dropped commits (multi's jobId already committed → append is a no-op on
  * re-run). Both must converge to the same committed state.
  *
  * Modes: `--run in sinksRoot jobId` (the killable pass),
  * `--check in sinksRoot jobId` (re-run + assert; exit 1 on violation);
  * `--run-exclusive`/`--check-exclusive` — the same kill/rerun contract
  * over [[TokenPipeline.runExclusive]] (first-match single-table sink,
  * per-doc uniqueness + counters vs the no-IO exclusive oracle).
  */
object RestartProbe {

  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[16]")
      .appName("graft-restart-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "--run" :: in :: root :: jobId :: Nil =>
      val spark = session()
      TokenPipeline.runMulti(spark, spark.read.parquet(in),
        Gen.sourceAttrs(spark), TokenPipeline.Config(root, jobId))
      println("RUN_COMPLETE")
      spark.stop()

    case "--check" :: in :: root :: jobId :: Nil =>
      val spark = session()
      val res = TokenPipeline.runMulti(spark, spark.read.parquet(in),
        Gen.sourceAttrs(spark), TokenPipeline.Config(root, jobId))
      val routed = res.table.read(spark).get
      val total = routed.count()
      val distinct = routed.select("sink", "doc_id").distinct().count()
      val oracle = TokenPipeline.countersOnly(
          spark.read.parquet(in), Gen.sourceAttrs(spark))
        .select("sink", "source", "row_count", "sum_n_tok")
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val got = res.counters
        .select("sink", "source", "row_count", "sum_n_tok")
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val dupFree = total == distinct
      val countersOk = got == oracle
      println(s"""CHECK {"rows":$total,"distinct":$distinct,""" +
        s""""dup_free":$dupFree,"counters_match":$countersOk}""")
      spark.stop()
      if (!(dupFree && countersOk)) sys.exit(1)

    case "--run-exclusive" :: in :: root :: jobId :: Nil =>
      val spark = session()
      TokenPipeline.runExclusive(spark, spark.read.parquet(in),
        Gen.sourceAttrs(spark), TokenPipeline.Config(root, jobId))
      println("RUN_COMPLETE")
      spark.stop()

    case "--check-exclusive" :: in :: root :: jobId :: Nil =>
      // re-run the same jobId after a crash: the snapshot commit must be
      // idempotent (already-committed jobId appends are no-ops), leaving
      // exactly one copy of every routed row
      val spark = session()
      val (table, counters) = TokenPipeline.runExclusive(spark,
        spark.read.parquet(in), Gen.sourceAttrs(spark),
        TokenPipeline.Config(root, jobId))
      val routed = table.read(spark).get
      val total = routed.count()
      // exclusive routing: every doc lands in exactly ONE sink, so doc_id
      // alone must be unique across the whole table
      val distinct = routed.select("doc_id").distinct().count()
      val oracle = TokenPipeline.countersOnlyExclusive(
          spark.read.parquet(in), Gen.sourceAttrs(spark))
        .select("sink", "source", "row_count", "sum_n_tok")
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val got = counters
        .select("sink", "source", "row_count", "sum_n_tok")
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val dupFree = total == distinct
      val countersOk = got == oracle
      println(s"""CHECK_EXCLUSIVE {"rows":$total,"distinct":$distinct,""" +
        s""""dup_free":$dupFree,"counters_match":$countersOk}""")
      spark.stop()
      if (!(dupFree && countersOk)) sys.exit(1)

    case other =>
      System.err.println(
        s"usage: --run|--check|--run-exclusive|--check-exclusive <inputDir> <sinksRoot> <jobId> (got $other)")
      sys.exit(2)
  }
}
