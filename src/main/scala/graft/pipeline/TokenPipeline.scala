package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.enrich.Enrich
import graft.parse.Grok
import graft.remap.Remap
import graft.route.Route
import graft.table.SnapshotTable

/** The north-star pipeline (BASELINE.json): parse → enrich → remap →
  * route → salted partitioned sink → aggregate, over the tokenized-sequence
  * table. Every stage is declarative Catalyst; the only imperative pieces
  * are the snapshot commit and the metrics collection.
  */
object TokenPipeline {

  /** Grok pattern for the doc_id metadata (FIXTURES.md §1). */
  val DocIdPattern = "%{WORD:src_tag}/%{WORD:tenant}/%{INT:shard:int}/%{INT:date_str}/%{INT:seq:int}"
  lazy val DocIdGrok: Grok.Compiled = Grok.compile(DocIdPattern)

  /** Route table (FIXTURES.md §3). `sink_long` overlaps `sink_hot` —
    * the multi-match case of route.rs:42-56.
    */
  def routes(longMin: Int): Seq[(String, Column)] = Seq(
    "sink_hot" -> (col("source") === "web"),
    "sink_long" -> (col("n_tok") >= longMin),
    "sink_pii" -> (col("pii") && col("priority") >= 2))

  /** VRL-abort condition (deterministic, field-based — see SURVEY.md §7
    * risk 1 on order-free semantics).
    */
  val AbortModulus = 997L

  final case class Config(sinksRoot: String, jobId: String,
                          saltBuckets: Int = 8, longMin: Int = 1024)

  final case class Result(
      counters: DataFrame,            // (sink, source, row_count, sum_n_tok) from COMMITTED data
      droppedCounts: DataFrame,       // (drop_reason, n)
      lineage: DataFrame,             // (stage, partition_id, rows)
      stageMetrics: Map[String, Long],// rows per stage (observe() counters)
      sinks: Map[String, SnapshotTable])

  /** The pure dataflow (parse → enrich → remap → route flags), shared by
    * the committed-run path and the in-memory flagship query. Returns
    * (flagged main lane, dropped lane).
    */
  def dataflow(input: DataFrame, attrs: DataFrame, longMin: Int): (DataFrame, DataFrame) = {
    // Stage row counters ride the main lane as observe() metrics — the
    // component_received/sent_events_total analog (docs/specs/component.md:
    // 125,223): zero-shuffle CollectMetrics, resolved when the lane
    // materializes; read back via queryExecution.observedMetrics.
    // ---- parse (vectorized grok over doc_id; remap.rs parse family) ----
    val parsed = Grok.parse(
      input.observe("parse_in", count(lit(1)).as("rows")), col("doc_id"), DocIdGrok)
    val parseOk = parsed.filter(col("_parse_ok")).drop("_parse_ok")
      .observe("parse_out", count(lit(1)).as("rows"))
    val parseDropped = parsed.filter(!col("_parse_ok"))
      .select(col("doc_id"), col("source"), lit("parse_error").as("drop_reason"),
        lit("parse").as("component_id"))

    // ---- enrich (broadcast lookup, strict; lib/enrichment find_table_row) ----
    val (enriched0, enrichDropped0) = Enrich.strict(parseOk, attrs, Seq("source"), "region")
    val enriched = enriched0.observe("enrich_out", count(lit(1)).as("rows"))
    val enrichDropped = enrichDropped0.select(col("doc_id"), col("source"),
      col("drop_reason"), col("component_id"))

    // ---- remap (VRL program as Catalyst when-chains) ----
    val remap = Remap()
      .set("token_bucket",
        when(col("n_tok") >= longMin, "long")
          .when(col("n_tok") >= 256, "mid")
          .otherwise("short"))
      .set("tok_sum", aggregate(col("tokens"), lit(0L), (acc, x) => acc + x))
      .set("quota_frac", col("n_tok").cast("double") / col("quota_toks"))
      .abortWhen(pmod(col("seq"), lit(AbortModulus)) === 0, "vrl_abort")
    val Remap.RemapResult(remapped0, remapDropped0) = remap.run(enriched)
    val remapped = remapped0.observe("remap_out", count(lit(1)).as("rows"))
    val remapDropped = remapDropped0.select(col("doc_id"), col("source"),
      col("drop_reason"), col("component_id"))

    // ---- route (multi-match flags; route.rs:42-56) ----
    val flagged = Route.flags(remapped, routes(longMin))
    val dropped = parseDropped.unionByName(enrichDropped).unionByName(remapDropped)
    (flagged, dropped)
  }

  /** In-memory flagship: routed per-sink counters without sink IO
    * (the aggregate stage; aggregate.rs / component_sent_events_total).
    */
  def countersOnly(input: DataFrame, attrs: DataFrame, longMin: Int = 1024): DataFrame = {
    val routed = {
      val (flagged, _) = dataflow(input, attrs, longMin)
      // single-pass exploded form — one shuffle on (sink, source)
      val names = routes(longMin).map(_._1) :+ Route.Unmatched
      val arms = names.map(n => when(col(s"_route_$n"), lit(n)).otherwise(lit(null: String)))
      flagged.withColumn("sink", explode(array_compact(array(arms: _*))))
    }
    routed.groupBy(col("sink"), col("source"))
      .agg(count(lit(1)).as("row_count"), sum(col("n_tok")).as("sum_n_tok"))
  }

  /** Exclusive first-match counters without sink IO — the no-IO oracle for
    * [[runExclusive]] restart checks (same dataflow + Route.exclusive, no
    * write, no snapshot read-back).
    */
  def countersOnlyExclusive(input: DataFrame, attrs: DataFrame,
                            longMin: Int = 1024): DataFrame = {
    val (flagged, _) = dataflow(input, attrs, longMin)
    Route.exclusive(
        flagged.drop(flagged.columns.filter(_.startsWith("_route_")): _*),
        routes(longMin))
      .groupBy(col("sink"), col("source"))
      .agg(count(lit(1)).as("row_count"), sum(col("n_tok")).as("sum_n_tok"))
  }

  /** Exclusive-route committed run: first-match-wins routing written as ONE
    * snapshot table partitioned by (sink, source) — a single pass and a
    * single write job instead of one filtered write per sink. This is the
    * more scalable sink shape when routing is exclusive (each row lands in
    * exactly one partition directory); multi-match routing needs the
    * per-sink writes of [[run]].
    */
  def runExclusive(spark: SparkSession, input: DataFrame, attrs: DataFrame,
                   cfg: Config): (SnapshotTable, DataFrame) = {
    val (flagged, _) = dataflow(input, attrs, cfg.longMin)
    val routed = Route.exclusive(
      flagged.drop(flagged.columns.filter(_.startsWith("_route_")): _*),
      routes(cfg.longMin))
      .withColumn("_salt", pmod(xxhash64(col("doc_id")), lit(cfg.saltBuckets)))
      .repartition(col("sink"), col("source"), col("_salt"))
      .drop("_salt")
    val table = new SnapshotTable(s"${cfg.sinksRoot}/exclusive")
    table.append(routed, s"${cfg.jobId}-exclusive", partitionBy = Seq("sink", "source"))
    val counters = table.read(spark).get
      .groupBy(col("sink"), col("source"))
      .agg(count(lit(1)).as("row_count"), sum(col("n_tok")).as("sum_n_tok"))
    (table, counters)
  }

  /** Result of [[runMulti]] — one multi-match table instead of per-sink
    * tables; `sinkView` recovers a per-sink frame (partition-pruned on the
    * `sink=` directory).
    */
  final case class MultiResult(
      table: SnapshotTable, droppedTable: SnapshotTable,
      counters: DataFrame, droppedCounts: DataFrame,
      lineage: DataFrame, stageMetrics: Map[String, Long]) {
    def sinkView(spark: SparkSession, name: String): Option[DataFrame] =
      table.read(spark).map(_.filter(col("sink") === name).drop("sink"))
  }

  /** Multi-match committed run as ONE write job — the scale path for
    * multi-match sinks. Route conditions evaluate once; a row matching k
    * sinks explodes into k sink-tagged rows; the routed stream lands in a
    * single snapshot table partitioned by (sink, source) with salted
    * repartitioning. Replaces [[run]]'s full-dataset persist + N filtered
    * writes: at 100 TB the input is never cached or spilled and never
    * scanned once per sink — the explode duplicates only multi-match rows
    * (duplication factor = average matches per row), and each row is
    * written exactly where its partition directory lives.
    *
    * Lineage + stage metrics cost one extra NARROW pass over the dataflow
    * (a codegen'd parse→enrich→remap recompute), which at scale is cheaper
    * than spilling the whole dataset via MEMORY_AND_DISK.
    */
  def runMulti(spark: SparkSession, input: DataFrame, attrs: DataFrame,
               cfg: Config): MultiResult = {
    import scala.jdk.CollectionConverters._
    val (flagged0, dropped) = dataflow(input, attrs, cfg.longMin)
    val flagged = flagged0.observe("route_in", count(lit(1)).as("rows"))

    // metrics/lineage pass: collect() is partition-count-sized, and running
    // it through THIS DataFrame's queryExecution resolves every observe()
    // in the chain without persisting the data lane
    val lineage0 = flagged.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows"))
      .withColumn("stage", lit("route_in"))
      .select("stage", "partition_id", "rows")
    val lineageRows = lineage0.collect()
    val observed = lineage0.queryExecution.observedMetrics
    val metrics = Seq("parse_in", "parse_out", "enrich_out", "remap_out", "route_in")
      .map(n => n -> observed.get(n).map(_.getLong(0)).getOrElse(-1L)).toMap
    val lineage = spark.createDataFrame(lineageRows.toList.asJava, lineage0.schema)

    val names = routes(cfg.longMin).map(_._1) :+ Route.Unmatched
    val arms = names.map(n => when(col(s"_route_$n"), lit(n)).otherwise(lit(null: String)))
    val routed0 = flagged
      .withColumn("sink", explode(array_compact(array(arms: _*))))
      .drop(flagged0.columns.filter(_.startsWith("_route_")): _*)
      .withColumn("_salt", pmod(xxhash64(col("doc_id")), lit(cfg.saltBuckets)))
      .repartition(col("sink"), col("source"), col("_salt"))
      .drop("_salt")
    // secrets never reach committed storage: redact the _meta secrets map
    // at the sink boundary (provenance fields survive)
    val routed =
      if (routed0.columns.contains(Meta.Col)) Meta.redact(routed0) else routed0

    val table = new SnapshotTable(s"${cfg.sinksRoot}/multi")
    table.append(routed, s"${cfg.jobId}-multi", partitionBy = Seq("sink", "source"))
    val droppedTable = new SnapshotTable(s"${cfg.sinksRoot}/dropped")
    droppedTable.append(dropped, s"${cfg.jobId}-dropped", partitionBy = Seq("drop_reason"))

    // counters from committed data only (exactly-once accounting); an
    // empty input commits no parquet → read is None → empty counters
    // empty-input fallbacks keep the COUNTERS SCHEMA (not a zero-column
    // emptyDataFrame) so consumers can always select the counter columns
    val counters = table.read(spark)
      .map(_.groupBy(col("sink"), col("source"))
        .agg(count(lit(1)).as("row_count"), sum(col("n_tok")).as("sum_n_tok")))
      .getOrElse(routed.limit(0).groupBy(col("sink"), col("source"))
        .agg(count(lit(1)).as("row_count"), sum(col("n_tok")).as("sum_n_tok")))
    val droppedCounts = droppedTable.read(spark)
      .map(_.groupBy(col("drop_reason")).agg(count(lit(1)).as("n")))
      .getOrElse(dropped.limit(0).groupBy(col("drop_reason")).agg(count(lit(1)).as("n")))

    MultiResult(table, droppedTable, counters, droppedCounts, lineage, metrics)
  }

  /** LEGACY per-sink committed run — retained ONLY as the reference
    * implementation for PipelineSpec's runMulti-equivalence and restart
    * tests (hence `private[pipeline]`: no production caller can reach it).
    * It persists the full flagged dataset (MEMORY_AND_DISK) and runs one
    * filtered write per sink — at 100 TB that spills the whole input;
    * [[runMulti]] is the committed path (one exploded write, no persist).
    * Restart-safe: per-sink jobIds make re-runs skip committed sinks.
    */
  private[pipeline] def runPerSinkLegacy(
      spark: SparkSession, input: DataFrame, attrs: DataFrame, cfg: Config): Result = {
    val (flagged0, dropped) = dataflow(input, attrs, cfg.longMin)

    // Stage row-count metrics via observe() — zero-shuffle CollectMetrics,
    // the analog of component_sent_events_total (docs/specs/component.md:223).
    val flagged = flagged0
      .observe("route_in", count(lit(1)).as("rows"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // materialize cache (resolves observe metrics) + per-partition lineage
    val lineage = flagged.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows"))
      .withColumn("stage", lit("route_in"))
      .select("stage", "partition_id", "rows")
      .persist(StorageLevel.MEMORY_AND_DISK)
    lineage.count()

    val sinkNames = routes(cfg.longMin).map(_._1) :+ Route.Unmatched
    val sinks = (sinkNames :+ "dropped").map { name =>
      name -> new SnapshotTable(s"${cfg.sinksRoot}/$name")
    }.toMap

    // per-sink salted write: repartition on (source, salt) defuses the hot
    // `web` partition; salt shapes file layout only, never row content
    sinkNames.foreach { name =>
      val view = Route.sinkView(flagged, name)
        .withColumn("_salt", pmod(xxhash64(col("doc_id")), lit(cfg.saltBuckets)))
        .repartition(col("source"), col("_salt"))
        .drop("_salt")
      sinks(name).append(view, s"${cfg.jobId}-$name", partitionBy = Seq("source"))
    }
    sinks("dropped").append(dropped, s"${cfg.jobId}-dropped", partitionBy = Seq("drop_reason"))

    // counters from committed snapshots only
    val counters = sinkNames.flatMap { name =>
      sinks(name).read(spark).map(
        _.groupBy(col("source")).agg(count(lit(1)).as("row_count"), sum(col("n_tok")).as("sum_n_tok"))
          .withColumn("sink", lit(name))
          .select("sink", "source", "row_count", "sum_n_tok"))
    }.reduce(_ unionByName _)

    val droppedCounts = sinks("dropped").read(spark)
      .map(_.groupBy(col("drop_reason")).agg(count(lit(1)).as("n")))
      .getOrElse(spark.emptyDataFrame)

    val observed = flagged.queryExecution.observedMetrics
    val metrics = Seq("parse_in", "parse_out", "enrich_out", "remap_out", "route_in")
      .map(n => n -> observed.get(n).map(_.getLong(0)).getOrElse(-1L)).toMap

    flagged.unpersist()
    Result(counters, droppedCounts, lineage, metrics, sinks)
  }
}
