package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Transforms
import graft.route.Route

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 re-expressed
  * Spark-first over the driver's testdata tables; `oracleSql` holds the
  * DuckDB-equivalent SQL the driver uses as the correctness oracle.
  * Column names are aligned on both sides (the driver hash-compares after
  * sorting columns by name). Double aggregates are rounded on both sides
  * to absorb summation-order ULP differences between engines.
  */
object SparkEntry {

  /** Placeholder in oracle SQL that [[Verify]] substitutes with the absolute
    * verify out-dir, so oracles over in-code-synthesized inputs can
    * `read_parquet` the very rows the Spark query consumed (materialized by
    * Verify from the same deterministic generators).
    */
  val OutDirToken = "__VERIFY_OUT__"

  /** Inputs synthesized in-code by some queries (not read from sfDir).
    * Verify materializes each under `<outDir>/_inputs/<name>`; the
    * generators are pure functions of the row index, so the parquet equals
    * what the queries compute in memory at any parallelism.
    */
  def materializedInputs: Map[String, SparkSession => DataFrame] = Map(
    "gen10k" -> (s => slimGen(s, 10000, 8)),
    "gen50k" -> (s => slimGen(s, 50000, 16)),
    "source_attrs" -> (s => graft.core.Gen.sourceAttrs(s)),
    "gen_boiler" -> (s =>
      graft.tokens.Winnow.genWithBoilerplate(s, rows = 3000, parts = 8).toDF()),
    "gen_para" -> (s =>
      graft.text.ParagraphDedup.genParaDocs(s, rows = 4000, parts = 8).toDF()),
    "gen_bench" -> (s =>
      graft.tokens.Winnow.genWithBoilerplate(s, rows = 200, parts = 4,
        startId = 5000000L).toDF()),
    "gen_incr" -> (s =>
      graft.tokens.Winnow.genWithDups(s, corpusRows = 4000, batchRows = 1500,
        parts = 8).toDF()),
    "media2k" -> (s =>
      graft.multimodal.Multimodal.genMedia(s, rows = 2000, parts = 8).toDF()),
    "gen_pii" -> (s =>
      graft.text.Pii.genPiiDocs(s, rows = 4000, parts = 8).toDF()),
    "gen_html" -> (s =>
      graft.text.Html.genHtmlDocs(s, rows = 4000, parts = 8).toDF()),
    "gen_urls" -> (s =>
      graft.text.Urls.genUrls(s, rows = 4000, parts = 8).toDF()),
    "gen_snap2" -> (s =>
      graft.tokens.Winnow.genSnapshotNew(s, rows = 3000, parts = 8)),
    "gen_warc" -> (s =>
      graft.functions.Warc.genWarcRecords(s, rows = 4000, parts = 8).toDF()),
    "gen_web" -> (s =>
      graft.text.Html.genWebPages(s, rows = 4000, parts = 8).toDF()))

  /** Generator output minus the token payload — the pipeline oracles only
    * touch (doc_id, n_tok, source), so the materialized input stays small.
    */
  private def slimGen(s: SparkSession, rows: Long, parts: Int): DataFrame = {
    import graft.core.{Gen, GenConfig}
    Gen.tokenseq(s, GenConfig(rows = rows, parts = parts)).toDF()
      .select(col("doc_id"), col("n_tok"), col("source"))
  }

  /** Flagship query; driver smoke-checks rows>0. The full north-star
    * dataflow — grok parse → broadcast enrich → VRL-style remap → multi-match
    * route → per-sink counters — over the deterministic tokenized-sequence
    * generator (BASELINE.json north_star), sized for a smoke check.
    */
  def entry(spark: SparkSession): DataFrame = {
    import graft.core.{Gen, GenConfig}
    import graft.pipeline.TokenPipeline
    TokenPipeline.countersOnly(
      Gen.tokenseq(spark, GenConfig(rows = 10000, parts = 8)).toDF(),
      Gen.sourceAttrs(spark))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    DataOpsQueries.queries ++ graft.functions.FunctionQueries.queries ++
    graft.ops.TransformVariantQueries.queries ++ coreQueries

  def oracleSql: Map[String, String] =
    DataOpsQueries.oracleSql ++ graft.functions.FunctionQueries.oracleSql ++
    graft.ops.TransformVariantQueries.oracleSql ++ coreOracleSql

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregate core sanity (TPC-H q1-style pricing summary) ----
    "q1_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"))
    }),

    // ---- filter transform (src/transforms/filter.rs:88-96) ----
    "q_filter" -> ((s, dir) => {
      Transforms.filterT(Tables.events(s, dir),
        col("event_type") === "error" && col("value") > 100)
        .select(col("event_id"), col("user_id"), col("value"))
    }),

    // ---- route: multi-match fan-out (src/transforms/route.rs:42-56) ----
    "q_route_multimatch" -> ((s, dir) => {
      Route.routedUnion(Tables.events(s, dir), Seq(
        "hot" -> (col("event_type") === "error"),
        "big" -> (col("value") >= 180),
        "signup" -> (col("event_type") === "signup")))
        .select(col("sink"), col("event_id"))
    }),

    // ---- exclusive_route: first-match-wins (exclusive_route/transform.rs:44-55) ----
    "q_route_exclusive" -> ((s, dir) => {
      Route.exclusive(Tables.events(s, dir), Seq(
        "hot" -> (col("event_type") === "error"),
        "big" -> (col("value") >= 180),
        "signup" -> (col("event_type") === "signup")))
        .groupBy(col("sink")).agg(count(lit(1)).as("n"))
    }),

    // ---- rendezvous (HRW) shard routing: resize-stable key→shard ----
    // (scale path for sharded sinks; shard4 vs shard5 columns evidence the
    //  minimal-movement property — only ~1/5 of keys move when a 5th shard
    //  joins, vs ~4/5 under pmod routing)
    "q_route_rendezvous" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val s4 = Seq("s0", "s1", "s2", "s3")
      val a4 = Route.rendezvous(ev, col("user_id"), s4, "shard4")
      Route.rendezvous(a4, col("user_id"), s4 :+ "s4", "shard5")
        .select(col("event_id"), col("shard4"), col("shard5"),
          (col("shard4") =!= col("shard5")).as("moved"))
    }),

    // ---- sample: deterministic key sampling (sample/transform.rs:81-91) ----
    "q_sample" -> ((s, dir) => {
      Transforms.sampleByMod(Tables.events(s, dir), col("event_id"), 10)
        .select(col("event_id"), col("sample_rate"))
    }),

    // ---- dedupe: keep-first per key (dedupe/transform.rs:47-85) ----
    "q_dedupe" -> ((s, dir) => {
      Transforms.dedupeKeepFirst(Tables.documents(s, dir),
        Seq(col("lang"), col("source")), Seq(col("doc_id")))
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // ---- throttle: N per key per window (throttle/transform.rs:42-67) ----
    "q_throttle" -> ((s, dir) => {
      Transforms.throttle(Tables.events(s, dir), col("user_id"), col("ts"),
        "hour", 3, col("event_id"))
        .select(col("event_id"), col("user_id"))
    }),

    // ---- reduce: group-merge with strategies (reduce/config.rs:33-106) ----
    "q_reduce" -> ((s, dir) => {
      Transforms.reduceGroups(Tables.events(s, dir),
        Seq(col("user_id")), col("ts"), col("value"))
    }),

    // ---- aggregate: tumbling-window metric agg (aggregate.rs:26-84) ----
    // Rounding (and the +1e-9 decimal-lattice nudge on avg: inputs have 2
    // decimals, so averages land EXACTLY on x.xx5 half-way points where
    // Spark HALF_UP and DuckDB binary rounding disagree) happens HERE at
    // the oracle-comparison surface — the library emits raw doubles.
    "q_aggregate" -> ((s, dir) => {
      Transforms.aggregateTumbling(Tables.events(s, dir), col("ts"), "hour",
        Seq(col("event_type")), col("value"))
        .select(col("window_start"), col("event_type"), col("n"),
          round(col("sum_v"), 2).as("sum_v"),
          round(col("avg_v") + lit(1e-9), 4).as("avg_v"),
          col("min_v"), col("max_v"),
          round(col("stddev_v"), 2).as("stddev_v"))
    }),

    // ---- window: context ring-buffer (window/transform.rs:50-94) ----
    "q_window_context" -> ((s, dir) => {
      Transforms.contextWindow(Tables.events(s, dir), col("user_id"),
        Seq(col("ts"), col("event_id")), col("event_type") === "error", 2, 2)
        .select(col("event_id"))
    }),

    // ---- log_to_metric: counters from logs (log_to_metric.rs:42-78) ----
    "q_log_to_metric" -> ((s, dir) => {
      Transforms.logToMetricCounter(Tables.events(s, dir), "events_total", Seq("event_type"))
    }),

    // ---- metric_to_log: metric → structured log (metric_to_log.rs:30-40) ----
    "q_metric_to_log" -> ((s, dir) => {
      Transforms.metricToLog(Tables.events(s, dir).filter(col("event_type") === "purchase"),
        lit("purchase_value"), col("value"), col("ts"))
    }),

    // ---- incremental_to_absolute: running sums (incremental_to_absolute.rs:15-68) ----
    "q_incr_to_abs" -> ((s, dir) => {
      Transforms.incrementalToAbsolute(Tables.events(s, dir), col("user_id"),
        Seq(col("ts"), col("event_id")), col("value"))
        .select(col("event_id"), col("user_id"), col("abs_value"))
    }),

    // ---- tag_cardinality_limit (tag_cardinality_limit/mod.rs) ----
    "q_tag_cardinality" -> ((s, dir) => {
      Transforms.tagCardinalityLimit(Tables.events(s, dir), "event_type", col("ts"), 3)
        .select(col("event_id"), col("event_type"))
    }),

    // ---- enrichment-table lookup = broadcast join (lib/enrichment/src/lib.rs:50-88) ----
    "q_enrich" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("sum_price"))
    }),

    // ---- CIDR-prefix enrichment (geoip table shape; enrichment_tables/
    //      geoip.rs) — broadcast per-prefix-length joins, longest wins ----
    "q_enrich_cidr" -> ((s, dir) => {
      import s.implicits._
      val ip = concat(lit("10."), pmod(col("user_id"), lit(5)), lit("."),
        pmod(col("event_id"), lit(256)), lit(".9"))
      val table = Seq(
        ("10.0.0.0/16", "dc-a"), ("10.1.0.0/16", "dc-b"),
        ("10.2.0.0/15", "dc-c"), ("10.0.0.0/8", "dc-default")).toDF("cidr", "dc")
      graft.enrich.Enrich.cidrLookup(
        Tables.events(s, dir).withColumn("ip", ip), table, col("ip"))
        .select(col("event_id"), col("ip"), col("dc"))
    }),

    // ---- as-of enrichment: latest versioned state ≤ event time ----
    // (Enrich.asofJoin — union + timeline window, one shuffle, no
    //  |facts|×|versions| explosion). State table is derived
    //  deterministically from the events' own user_id domain: versions at
    //  Jan 1/9/17/25, raggedly missing when (user_id+v)%3=0 so some early
    //  events exercise the null (no-state-yet) lane.
    "q_asof_enrich" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val st = ev.select(col("user_id")).distinct()
        .withColumn("v", explode(sequence(lit(0), lit(3))))
        .filter(pmod(col("user_id") + col("v"), lit(3)) =!= 0)
        .select(col("user_id"),
          expr("TIMESTAMP '2024-01-01 00:00:00' + make_interval(0, 0, 0, v * 8, 0, 0, 0)")
            .as("state_ts"),
          element_at(
            array(lit("bronze"), lit("silver"), lit("gold"), lit("plat")),
            (pmod(col("user_id") * 7 + col("v") * 13, lit(4)) + 1).cast("int"))
            .as("tier"))
      graft.enrich.Enrich.asofJoin(ev, st, "user_id", "ts", "state_ts", Seq("tier"))
        .select(col("event_id"), col("user_id"), col("tier"),
          // ntz → parquet int64 micros, physically identical to the
          // DuckDB oracle's naive TIMESTAMP (a tz'd literal would write
          // ns and NaT-vs-unit artifacts break exact comparators)
          col("state_ts").cast("timestamp_ntz").as("state_ts"))
    }),

    // ---- skew-salted shuffle join: hot-key defusal without broadcast ----
    // (dim derived from the events' own event_type domain — a full-coverage
    //  left join, so the oracle is the plain join: any salt-replication
    //  error shows up as ×salts duplicate or dropped rows)
    "q_skew_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val dim = ev.select(col("event_type")).distinct()
        .withColumn("type_len", length(col("event_type")))
        .withColumn("type_tag", upper(col("event_type")))
      graft.enrich.Enrich.saltedJoin(ev, dim, "event_type", col("event_id"), salts = 8)
        .select(col("event_id"), col("event_type"), col("type_len"), col("type_tag"))
    }),

    // ---- Bloom-pruned selective join: semi-join pushdown ----
    // (dim keys = 1/17 of the user domain — the sketch prunes ~94% of fact
    //  rows before the join shuffle; result is exactly the plain inner join)
    "q_bloom_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val dim = ev.select(col("user_id")).distinct()
        .filter(pmod(col("user_id"), lit(17)) === 0)
        .withColumn("grp", pmod(col("user_id"), lit(7)))
      graft.enrich.Enrich.bloomPrunedJoin(ev, dim, "user_id")
        .select(col("event_id"), col("user_id"), col("grp"))
    }),

    // ---- parse_json (VRL parse_json; SURVEY §2.5) ----
    "q_parse_json" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("int").as("k"))
    }),

    // ---- parse_regex (VRL parse_regex; SURVEY §2.5) ----
    "q_parse_regex" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("k_re"))
    }),

    // ---- north-star pipeline over the deterministic generator ----
    // (input materialized by Verify → full DuckDB oracle below, on top of
    //  the single-threaded Scala oracle in PipelineSpec)
    "p_pipeline_counters" -> ((s, _) => {
      import graft.core.{Gen, GenConfig}
      graft.pipeline.TokenPipeline.countersOnly(
        Gen.tokenseq(s, GenConfig(rows = 50000, parts = 16)).toDF(),
        Gen.sourceAttrs(s))
    }),
    "p_pipeline_parse" -> ((s, _) => {
      import graft.core.{Gen, GenConfig}
      graft.parse.Grok.parse(
        Gen.tokenseq(s, GenConfig(rows = 10000, parts = 8)).toDF(),
        col("doc_id"), graft.pipeline.TokenPipeline.DocIdGrok)
        .filter(col("_parse_ok"))
        .select(col("doc_id"), col("src_tag"), col("tenant"), col("shard"),
          col("date_str"), col("seq"))
    })
  )

  private def coreOracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_price,
        | round(avg(l_discount),6) AS avg_disc
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter" ->
      "SELECT event_id, user_id, value FROM events WHERE event_type='error' AND value>100",

    "q_route_multimatch" ->
      """SELECT 'hot' AS sink, event_id FROM events WHERE event_type='error'
        |UNION ALL SELECT 'big' AS sink, event_id FROM events WHERE value>=180
        |UNION ALL SELECT 'signup' AS sink, event_id FROM events WHERE event_type='signup'
        |UNION ALL SELECT '_unmatched' AS sink, event_id FROM events
        | WHERE NOT(event_type='error' OR value>=180 OR event_type='signup')""".stripMargin,

    "q_route_exclusive" ->
      """SELECT CASE WHEN event_type='error' THEN 'hot'
        |            WHEN value>=180 THEN 'big'
        |            WHEN event_type='signup' THEN 'signup'
        |            ELSE '_unmatched' END AS sink, count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,

    // argmax-by-weight via row_number; tie-break ORDER BY w DESC, sh DESC
    // matches Spark's struct-max (weight first, then shard name)
    "q_route_rendezvous" ->
      """WITH a4 AS (
        |  SELECT event_id, sh,
        |         row_number() OVER (PARTITION BY event_id ORDER BY
        |           CAST(concat('0x', substr(md5(concat(CAST(user_id AS VARCHAR),'|',sh)),1,15)) AS BIGINT) DESC,
        |           sh DESC) AS rn
        |  FROM events, (SELECT unnest(['s0','s1','s2','s3']) AS sh)),
        |a5 AS (
        |  SELECT event_id, sh,
        |         row_number() OVER (PARTITION BY event_id ORDER BY
        |           CAST(concat('0x', substr(md5(concat(CAST(user_id AS VARCHAR),'|',sh)),1,15)) AS BIGINT) DESC,
        |           sh DESC) AS rn
        |  FROM events, (SELECT unnest(['s0','s1','s2','s3','s4']) AS sh))
        |SELECT a4.event_id, a4.sh AS shard4, a5.sh AS shard5,
        |       a4.sh <> a5.sh AS moved
        |FROM a4 JOIN a5 ON a4.event_id = a5.event_id
        |WHERE a4.rn = 1 AND a5.rn = 1""".stripMargin,

    "q_sample" ->
      "SELECT event_id, 10 AS sample_rate FROM events WHERE event_id % 10 = 0",

    "q_dedupe" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |         row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1""".stripMargin,

    "q_throttle" ->
      """SELECT event_id, user_id FROM (
        |  SELECT event_id, user_id,
        |         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |                            ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn <= 3""".stripMargin,

    "q_reduce" ->
      """SELECT user_id, count(*) AS n_merged, min(ts) AS first_ts, max(ts) AS last_ts,
        | round(sum(value),2) AS sum_value, round(max(value),2) AS max_value
        |FROM events GROUP BY user_id""".stripMargin,

    "q_aggregate" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        | count(*) AS n, round(sum(value),2) AS sum_v, round(avg(value) + 1e-9, 4) AS avg_v,
        | min(value) AS min_v, max(value) AS max_v, round(stddev_samp(value),2) AS stddev_v
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_window_context" ->
      """SELECT event_id FROM (
        |  SELECT event_id, max(CASE WHEN event_type='error' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS keep
        |  FROM events) WHERE keep = 1""".stripMargin,

    "q_log_to_metric" ->
      """SELECT event_type, CAST(count(*) AS DOUBLE) AS value,
        | 'events_total' AS name, 'incremental' AS kind
        |FROM events GROUP BY event_type""".stripMargin,

    "q_metric_to_log" ->
      """SELECT 'metric purchase_value=' || CAST(value AS VARCHAR) AS message,
        | ts AS timestamp, 'purchase_value' AS metric_name, value AS metric_value
        |FROM events WHERE event_type='purchase'""".stripMargin,

    "q_incr_to_abs" ->
      """SELECT event_id, user_id,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS abs_value
        |FROM events""".stripMargin,

    "q_tag_cardinality" ->
      """SELECT e.event_id, e.event_type FROM events e
        |JOIN (
        |  SELECT event_type, row_number() OVER (ORDER BY fs, event_type) AS rk
        |  FROM (SELECT event_type, min(ts) AS fs FROM events GROUP BY event_type)
        |) r ON e.event_type = r.event_type WHERE r.rk <= 3""".stripMargin,

    "q_enrich" ->
      """SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice),2) AS sum_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    // expected-value oracle: the /16s beat the /8 for second octet 0-3;
    // octet 4 falls through to the /8 default; 10.2 and 10.3 share the /15
    "q_enrich_cidr" ->
      """SELECT event_id,
        | ('10.' || (user_id % 5) || '.' || (event_id % 256) || '.9') AS ip,
        | CASE (user_id % 5) WHEN 0 THEN 'dc-a' WHEN 1 THEN 'dc-b'
        |      WHEN 2 THEN 'dc-c' WHEN 3 THEN 'dc-c' ELSE 'dc-default' END AS dc
        |FROM events""".stripMargin,

    // DuckDB's native ASOF LEFT JOIN is the independent oracle for the
    // union-window as-of implementation (same >= contract, null before
    // a key's first version).
    "q_asof_enrich" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |st AS (
        |  SELECT user_id,
        |         TIMESTAMP '2024-01-01 00:00:00' + to_days(CAST(v*8 AS INT)) AS state_ts,
        |         CASE ((user_id*7 + v*13) % 4) WHEN 0 THEN 'bronze' WHEN 1 THEN 'silver'
        |              WHEN 2 THEN 'gold' ELSE 'plat' END AS tier
        |  FROM u, (SELECT unnest([0,1,2,3]) AS v) vs
        |  WHERE (user_id + v) % 3 <> 0)
        |SELECT e.event_id, e.user_id, s.tier, s.state_ts
        |FROM events e ASOF LEFT JOIN st s
        |  ON e.user_id = s.user_id AND e.ts >= s.state_ts""".stripMargin,

    "q_skew_join" ->
      """SELECT event_id, event_type,
        | CAST(length(event_type) AS INT) AS type_len,
        | upper(event_type) AS type_tag
        |FROM events""".stripMargin,

    "q_bloom_join" ->
      """SELECT e.event_id, e.user_id, (e.user_id % 7) AS grp
        |FROM events e
        |JOIN (SELECT DISTINCT user_id FROM events WHERE user_id % 17 = 0) d
        |  ON e.user_id = d.user_id""".stripMargin,

    "q_parse_json" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events",

    "q_parse_regex" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k_re FROM events""",

    // Grok-parse twin over the Verify-materialized generator slice. The
    // doc_id layout is slash-separated \w+ segments, so split == the grok
    // captures; the regexp_matches WHERE mirrors the _parse_ok lane.
    "p_pipeline_parse" ->
      s"""SELECT doc_id,
         | string_split(doc_id, '/')[1] AS src_tag,
         | string_split(doc_id, '/')[2] AS tenant,
         | CAST(string_split(doc_id, '/')[3] AS BIGINT) AS shard,
         | string_split(doc_id, '/')[4] AS date_str,
         | CAST(string_split(doc_id, '/')[5] AS BIGINT) AS seq
         |FROM read_parquet('$OutDirToken/_inputs/gen10k/*.parquet')
         |WHERE regexp_matches(doc_id, '^\\w+/\\w+/[+-]?\\d+/[+-]?\\d+/[+-]?\\d+$$')""".stripMargin,

    // North-star counters twin: parse (regex gate) → strict enrich (inner
    // join drops the ghost source) → VRL abort (seq % 997 = 0) → multi-match
    // route fan-out → per-(sink, source) counters.
    "p_pipeline_counters" ->
      s"""WITH g AS (SELECT * FROM read_parquet('$OutDirToken/_inputs/gen50k/*.parquet')),
         |p AS (SELECT doc_id, n_tok, source,
         |        CAST(string_split(doc_id, '/')[5] AS BIGINT) AS seq
         |      FROM g
         |      WHERE regexp_matches(doc_id, '^\\w+/\\w+/[+-]?\\d+/[+-]?\\d+/[+-]?\\d+$$')),
         |e AS (SELECT p.*, a.pii, a.priority
         |      FROM p JOIN read_parquet('$OutDirToken/_inputs/source_attrs/*.parquet') a
         |      USING (source)),
         |r AS (SELECT * FROM e WHERE seq % 997 <> 0),
         |f AS (SELECT source, n_tok, unnest(list_filter([
         |        CASE WHEN source = 'web' THEN 'sink_hot' END,
         |        CASE WHEN n_tok >= 1024 THEN 'sink_long' END,
         |        CASE WHEN pii AND priority >= 2 THEN 'sink_pii' END,
         |        CASE WHEN NOT (source = 'web' OR n_tok >= 1024 OR (pii AND priority >= 2))
         |             THEN '_unmatched' END
         |      ], x -> x IS NOT NULL)) AS sink FROM r)
         |SELECT sink, source, count(*) AS row_count,
         |       CAST(sum(n_tok) AS BIGINT) AS sum_n_tok
         |FROM f GROUP BY sink, source""".stripMargin
  )
}
