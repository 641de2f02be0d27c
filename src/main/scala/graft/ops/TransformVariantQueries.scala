package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Coverage queries for the transform config-variants (the non-default
  * reference behaviors: exclude conditions, ignore-lists, full reduce
  * strategy set, forward_when, drop_tag, histogram mode, json codec) —
  * each with a DuckDB twin.
  */
object TransformVariantQueries {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- sample + exclude (sample/config.rs:76-83) ----
    "v_sample_exclude" -> ((s, dir) => {
      Transforms.sampleWithExclude(ev(s, dir), col("event_id"), 10,
        col("event_type") === "error")
        .select(col("event_id"), col("sample_rate"))
    }),

    // ---- sample + group_by (sample/config.rs:60-74) ----
    "v_sample_groupby" -> ((s, dir) => {
      Transforms.sampleGrouped(ev(s, dir), col("user_id"), col("event_id"), 10)
        .select(col("event_id"), col("sample_rate"), col("sample_group"))
    }),

    // ---- dedupe timed variant (dedupe/timed_transform.rs) ----
    "v_dedupe_timed" -> ((s, dir) => {
      Transforms.dedupeTimed(ev(s, dir).select("event_id", "ts", "user_id", "event_type"),
        Seq(col("user_id"), col("event_type")), col("ts"), "hour",
        Seq(col("ts"), col("event_id")))
        .select(col("event_id"))
    }),

    // ---- throttle + exclude (throttle/config.rs:54-58) ----
    "v_throttle_exclude" -> ((s, dir) => {
      Transforms.throttleWithExclude(ev(s, dir), col("user_id"), col("ts"), "hour",
        3, col("event_id"), col("event_type") === "error")
        .select(col("event_id"), col("user_id"))
    }),

    // ---- dedupe ignore-list mode (dedupe/common.rs) ----
    "v_dedupe_ignore" -> ((s, dir) => {
      Transforms.dedupeIgnoring(
        ev(s, dir).select("event_id", "ts", "user_id", "event_type"),
        ignore = Seq("event_id", "ts"), order = Seq(col("ts"), col("event_id")))
        .select(col("event_id"), col("user_id"), col("event_type"))
    }),

    // ---- reduce full strategy set (reduce/config.rs:64-106) ----
    "v_reduce_strategies" -> ((s, dir) => {
      Transforms.reduceStrategies(ev(s, dir), Seq(col("user_id")), col("ts"),
        col("event_id"), round(col("value"), 2), col("event_type"))
        // arrays → strings: the driver's row-sort compare needs scalar cells
        .withColumn("arr_v", array_join(col("arr_v").cast("array<string>"), ","))
        .withColumn("flat_unique_s", array_join(array_sort(col("flat_unique_s")), ","))
    }),

    // ---- reduce session semantics: ends_when / starts_when ----
    "v_reduce_ends_when" -> ((s, dir) => {
      Transforms.reduceSessionsEndsWhen(ev(s, dir), col("user_id"),
        Seq(col("ts"), col("event_id")), col("event_type") === "purchase",
        col("ts"), round(col("value"), 2))
    }),
    "v_reduce_starts_when" -> ((s, dir) => {
      Transforms.reduceSessionsStartsWhen(ev(s, dir), col("user_id"),
        Seq(col("ts"), col("event_id")), col("event_type") === "signup",
        col("ts"), round(col("value"), 2))
    }),

    // ---- idle-gap sessionization (reduce expire_after_ms batch analog) ----
    "v_sessionize_gap" -> ((s, dir) => {
      Transforms.sessionizeByGap(ev(s, dir), col("user_id"), col("ts"),
        Seq(col("ts"), col("event_id")), gapSec = 1800, round(col("value"), 2))
    }),

    // ---- first-touch funnel: signup → click → purchase ----
    "v_funnel" -> ((s, dir) => {
      Transforms.funnel(ev(s, dir), col("user_id"), col("ts"), Seq(
        "signup" -> (col("event_type") === "signup"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")))
    }),

    // ---- robust MAD anomaly flags over hourly per-type ingest counts ----
    "v_anomaly_mad" -> ((s, dir) => {
      Transforms.anomalyMad(ev(s, dir), col("event_type"), col("ts"), "hour")
    }),

    // ---- trailing sliding-window rate (throttle audit view) ----
    "v_sliding_rate" -> ((s, dir) => {
      Transforms.slidingRate(ev(s, dir), col("user_id"), col("ts"), 3600L)
        .select(col("event_id"), col("user_id"), col("rate_n"))
    }),

    // ---- rollup counters: the dashboard totals lattice in ONE pass ----
    // (ROLLUP(event_type, lang-ish tag) — Spark plans a single Expand +
    //  hash agg, each level map-side combinable; vs one query per level =
    //  L full scans)
    "v_rollup_counters" -> ((s, dir) => {
      val e = ev(s, dir).withColumn("vtag",
        when(col("value") >= 100, "hi").otherwise("lo"))
      e.rollup(col("event_type"), col("vtag"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
        .select(coalesce(col("event_type"), lit("_total")).as("event_type"),
          coalesce(col("vtag"), lit("_total")).as("vtag"),
          col("n"), col("sum_v"))
    }),

    // ---- top talkers per route: exact per-group top-k over the
    //      pre-aggregated (group, key) count table ----
    "v_top_talkers" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val counts = ev(s, dir).groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("n").desc, col("user_id"))
      counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("event_type"), col("user_id"), col("n"),
          col("rk").cast("long").as("rk"))
    }),

    // ---- SLO burn rate: hourly + trailing-6h error ppm, burn flags ----
    // ("error" = value >= 150, ~25% base rate against a 100000-ppm budget
    //  so both burn flags actually fire in the data)
    "v_burn_rate" -> ((s, dir) => {
      Transforms.burnRate(ev(s, dir), col("event_type"), col("ts"),
        col("value") >= 150, budgetPpm = 100000L)
    }),

    // ---- join-key skew audit: top heavy hitters with ppm share ----
    "v_skew_audit" -> ((s, dir) => {
      Transforms.skewAudit(ev(s, dir), col("user_id"), topK = 10)
    }),

    // ---- winsorization: clamp to the per-type [p1, p99] band ----
    "v_winsorize" -> ((s, dir) => {
      Transforms.winsorize(ev(s, dir), col("event_type"), col("value"))
        .select(col("event_id"), col("event_type"),
          round(col("value"), 2).as("value"),
          round(col("value_w") + lit(1e-9), 2).as("value_w"))
    }),

    // ---- level-shift change-point: binary segmentation per series ----
    "v_change_point" -> ((s, dir) => {
      Transforms.changePoint(ev(s, dir), col("event_type"), col("ts"), "hour")
    }),

    // ---- k-anonymity suppression on (event_type, value-decile) cells ----
    "v_k_anonymize" -> ((s, dir) => {
      val e = ev(s, dir).withColumn("vdec",
        floor(col("value") / 20.0).cast("long"))
      Transforms.kAnonymize(e, Seq("event_type", "vdec"), k = 10)
        .select(col("event_id"), col("event_type"), col("vdec"))
    }),

    // ---- cohort retention matrix: first-day cohorts × active days ----
    "v_cohort_retention" -> ((s, dir) => {
      Transforms.cohortRetention(ev(s, dir), col("user_id"), col("ts"), "day")
    }),

    // ---- reduce max_events flush (reduce/config.rs) ----
    "v_reduce_max_events" -> ((s, dir) => {
      Transforms.reduceMaxEvents(ev(s, dir), Seq(col("user_id")), col("ts"),
        col("event_id"), round(col("value"), 2), maxEvents = 8)
    }),

    // ---- window + forward_when (window/config.rs:44-50) ----
    "v_window_forward" -> ((s, dir) => {
      Transforms.contextWindowForward(ev(s, dir), col("user_id"),
        Seq(col("ts"), col("event_id")), col("event_type") === "error", 2, 2,
        forwardWhen = col("event_type") === "purchase")
        .select(col("event_id"))
    }),

    // ---- tag_cardinality_limit, action=drop_tag (config.rs:90-96) ----
    "v_tag_droptag" -> ((s, dir) => {
      Transforms.tagCardinalityDropTag(ev(s, dir), "event_type", col("ts"), 3)
        .select(col("event_id"), col("event_type"))
    }),

    // ---- tag_cardinality_limit probabilistic/Bloom mode
    //      (tag_cardinality_limit/config.rs:56-83, tag_value_set.rs:60-137)
    //      over a 97-value derived tag so Bloom false positives actually
    //      occur at limit=20/m=64 — the over-admissions ARE the semantics ----
    "v_tag_bloom" -> ((s, dir) => {
      val e = ev(s, dir).withColumn("tag97", (col("user_id") % 97).cast("string"))
      Transforms.tagCardinalityLimitBloom(e, "tag97", col("ts"), limit = 20)
        .select(col("event_id"), col("tag97"))
    }),

    // ---- log_to_metric histogram mode (log_to_metric.rs:101-123) ----
    "v_log_to_metric_hist" -> ((s, dir) => {
      Transforms.logToMetricHistogram(ev(s, dir), Seq("event_type"),
        col("value"), Seq(50.0, 100.0, 150.0, 200.0))
    }),

    // ---- log_to_metric gauge/set/summary modes (log_to_metric.rs:42-78:
    //      Gauge = latest by arrival, Set = distinct values, Summary =
    //      count/sum/quantiles) ----
    "v_log_to_metric_modes" -> ((s, dir) => {
      ev(s, dir).groupBy(col("event_type"))
        .agg(
          max_by(round(col("value"), 2),
            struct(col("ts"), col("event_id"))).as("gauge_last"),
          size(collect_set(col("user_id"))).cast("long").as("set_n"),
          count(lit(1)).as("count"),
          round(sum(col("value")), 2).as("sum"),
          round(expr("percentile(value, 0.5)") + lit(1e-9), 2).as("p50"),
          round(expr("percentile(value, 0.99)") + lit(1e-9), 2).as("p99"))
    }),

    // ---- aggregate Diff mode: delta of Absolute series (aggregate.rs:48-77) ----
    "v_aggregate_diff" -> ((s, dir) => {
      Transforms.aggregateDiff(ev(s, dir), col("user_id"),
        Seq(col("ts"), col("event_id")), col("value"))
        .select(col("event_id"), col("user_id"),
          round(col("diff_value"), 2).as("diff_value"))
    }),

    // ---- aggregate Auto mode: kind-aware Sum/Latest dispatch ----
    "v_aggregate_auto" -> ((s, dir) => {
      val kind = when(pmod(col("user_id"), lit(2)) === 0, "incremental")
        .otherwise("absolute")
      Transforms.aggregateAuto(ev(s, dir), col("ts"), "hour",
        Seq(col("event_type")), kind, col("event_id"), col("value"))
        .withColumn("agg_value", round(col("agg_value"), 2))
    }),

    // ---- remap fan-out: one event → N events (remap.rs:604-611) ----
    "v_remap_fanout" -> ((s, dir) => {
      val parts = split(concat(col("event_type"), lit(",x"),
        pmod(col("event_id"), lit(3))), ",", -1)
      val graft.remap.Remap.RemapResult(main, _) =
        graft.remap.Remap().fanOut("part", parts).run(ev(s, dir))
      main.select(col("event_id"), col("part"))
    }),

    // ---- multiline aggregation (file source multiline mode) ----
    "v_multiline" -> ((s, dir) => {
      val line = concat(col("event_type"), lit(" "), pmod(col("event_id"), lit(1000)))
      Transforms.multilineAggregate(ev(s, dir), col("user_id"),
        Seq(col("ts"), col("event_id")),
        startsWhen = col("event_type") =!= "click", // clicks are continuations
        line = line)
    }),

    // ---- GELF-shaped encode (lib/codecs gelf encoder) ----
    "v_encode_gelf" -> ((s, dir) => {
      ev(s, dir).select(col("event_id"),
        to_json(struct(
          lit("1.1").as("version"),
          concat(lit("h"), pmod(col("user_id"), lit(50))).as("host"),
          col("event_type").as("short_message"),
          col("event_id").as("_event_id"))).as("gelf"))
    }),

    // ---- datadog_search conditions driving a multi-match route ----
    // (the second condition language, src/conditions/datadog_search.rs —
    //  wildcards, ranges, comparisons, boolean operators, negation)
    "v_datadog_route" -> ((s, dir) => {
      import graft.conditions.DatadogSearch
      def c(q: String) = DatadogSearch.compile(q, col, col("event_type"))
      graft.route.Route.routedUnion(ev(s, dir), Seq(
        "hot" -> c("event_type:error"),
        "big" -> c("value:[180 TO 200]"),
        "mix" -> c("event_type:sign* OR (event_type:purchase AND value:>=100)"),
        "quiet" -> c("NOT event_type:click AND value:<20")))
        .select(col("sink"), col("event_id"))
    }),

    // ---- DDSketch metric value: mergeable sketch column → quantiles ----
    // (AgentDDSketch / Distribution analog, metric/value.rs:20-82)
    "v_ddsketch" -> ((s, dir) => {
      import graft.sketch.DDSketch
      ev(s, dir).filter(col("value") > 0)
        .groupBy(col("event_type"))
        .agg(DDSketch.sketch(col("value")).as("sk"))
        .select(col("event_type"),
          DDSketch.count(col("sk")).as("n"),
          DDSketch.quantile(col("sk"), 0.5).as("p50"),
          DDSketch.quantile(col("sk"), 0.95).as("p95"))
    }),

    // ---- sink-path template: {{ field }} + strftime (src/template.rs) ----
    "v_template" -> ((s, dir) => {
      ev(s, dir).select(col("event_id"),
        graft.config.Template.render(
          "logs/{{ event_type }}/%Y-%m-%d/u{{ user_id }}-%H.log",
          col("ts")).as("path"))
    }),

    // ---- json codec: encode (to_json) + decode (from_json) round trip ----
    "v_json_codec" -> ((s, dir) => {
      val j = to_json(struct(col("event_id").as("id"), col("event_type").as("t")))
      ev(s, dir).select(col("event_id"),
        j.as("encoded"),
        from_json(j, lit("id BIGINT, t STRING")).getField("t").as("decoded_t"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "v_sample_exclude" ->
      """SELECT event_id,
        | CASE WHEN event_type = 'error' THEN NULL ELSE 10 END AS sample_rate
        |FROM events WHERE event_type = 'error' OR event_id % 10 = 0""".stripMargin,

    "v_sample_groupby" ->
      """SELECT event_id, 10 AS sample_rate, user_id AS sample_group
        |FROM events WHERE (event_id + user_id * 31) % 10 = 0""".stripMargin,

    "v_dedupe_timed" ->
      """SELECT event_id FROM (
        |  SELECT event_id, row_number() OVER (
        |    PARTITION BY user_id, event_type, date_trunc('hour', ts)
        |    ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,

    "v_throttle_exclude" ->
      """SELECT event_id, user_id FROM (
        |  SELECT event_id, user_id, event_type,
        |    sum(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END)
        |      OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |            ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rn
        |  FROM events)
        |WHERE event_type = 'error' OR rn <= 3""".stripMargin,

    "v_dedupe_ignore" ->
      """SELECT event_id, user_id, event_type FROM (
        |  SELECT event_id, user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,

    "v_reduce_strategies" ->
      """SELECT user_id, count(*) AS n,
        | (list(round(value,2) ORDER BY ts, event_id))[1] AS first_v,
        | (list(round(value,2) ORDER BY ts DESC, event_id DESC))[1] AS last_v,
        | round(sum(round(value,2)), 2) AS sum_v,
        | max(round(value,2)) AS max_v, min(round(value,2)) AS min_v,
        | list_aggregate(list_transform(list(round(value,2) ORDER BY ts, event_id),
        |     x -> CAST(x AS VARCHAR)), 'string_agg', ',') AS arr_v,
        | string_agg(event_type, ' ' ORDER BY ts, event_id) AS concat_s,
        | list_aggregate(list_sort(list_distinct(list(event_type))), 'string_agg', ',') AS flat_unique_s
        |FROM events GROUP BY user_id""".stripMargin,

    // NOTE: DuckDB sum(INTEGER) yields HUGEINT while Spark emits BIGINT —
    // every integer sum that reaches oracle output is CAST to BIGINT
    // (the Hashing.duckH15 convention; round-1 hash-fail root cause).
    "v_reduce_ends_when" ->
      """SELECT user_id AS key, CAST(session AS BIGINT) AS session, count(*) AS n, min(ts) AS first_ts,
        | max(ts) AS last_ts, round(sum(round(value,2)), 2) AS sum_v
        |FROM (
        |  SELECT *, coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS session
        |  FROM events)
        |GROUP BY user_id, session""".stripMargin,

    "v_sliding_rate" ->
      """SELECT event_id, user_id,
        | count(*) OVER (PARTITION BY user_id
        |   ORDER BY CAST(epoch(date_trunc('second', ts)) AS BIGINT)
        |   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS rate_n
        |FROM events""".stripMargin,

    "v_rollup_counters" ->
      """SELECT coalesce(event_type, '_total') AS event_type,
        |       coalesce(vtag, '_total') AS vtag,
        |       count(*) AS n, round(sum(value), 2) AS sum_v
        |FROM (SELECT event_type,
        |             CASE WHEN value >= 100 THEN 'hi' ELSE 'lo' END AS vtag,
        |             value
        |      FROM events)
        |GROUP BY ROLLUP(event_type, vtag)""".stripMargin,

    "v_top_talkers" ->
      """SELECT event_type, user_id, n, rk FROM (
        |  SELECT event_type, user_id, n,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY n DESC, user_id) AS rk
        |  FROM (SELECT event_type, user_id, count(*) AS n
        |        FROM events GROUP BY 1, 2))
        |WHERE rk <= 3""".stripMargin,

    "v_burn_rate" ->
      """WITH h AS (
        |  SELECT event_type AS series, date_trunc('hour', ts) AS h,
        |         count(*) AS n,
        |         CAST(sum(CASE WHEN value >= 150 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS errs
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT series, h, n, errs,
        |    sum(n) OVER (PARTITION BY series
        |      ORDER BY CAST(epoch(date_trunc('second', h)) AS BIGINT)
        |      RANGE BETWEEN 18000 PRECEDING AND CURRENT ROW) AS n6,
        |    sum(errs) OVER (PARTITION BY series
        |      ORDER BY CAST(epoch(date_trunc('second', h)) AS BIGINT)
        |      RANGE BETWEEN 18000 PRECEDING AND CURRENT ROW) AS errs6
        |  FROM h)
        |SELECT series, h, n, errs,
        |  CAST((errs * 1000000) // n AS BIGINT) AS rate_ppm,
        |  CAST((errs6 * 1000000) // n6 AS BIGINT) AS rate6_ppm,
        |  ((errs * 1000000) // n) > 1440000 AS burn_fast,
        |  ((errs6 * 1000000) // n6) > 600000 AS burn_slow
        |FROM w""".stripMargin,

    "v_skew_audit" ->
      """WITH c AS (SELECT user_id AS key, count(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT sum(n) AS tot FROM c)
        |SELECT c.key, c.n, CAST((c.n * 1000000) // t.tot AS BIGINT) AS share_ppm
        |FROM c, t ORDER BY c.n DESC, c.key LIMIT 10""".stripMargin,

    "v_winsorize" ->
      """WITH q AS (
        |  SELECT event_type, quantile_cont(value, 0.01) AS lo,
        |         quantile_cont(value, 0.99) AS hi
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type, round(e.value, 2) AS value,
        |       round(least(greatest(e.value, q.lo), q.hi) + 1e-9, 2) AS value_w
        |FROM events e JOIN q USING (event_type)""".stripMargin,

    "v_change_point" ->
      """WITH c AS (
        |  SELECT event_type AS series, date_trunc('hour', ts) AS b, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT series, b, n,
        |    CAST(row_number() OVER (PARTITION BY series ORDER BY b) AS BIGINT) AS idx,
        |    sum(n) OVER (PARTITION BY series ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(n) OVER (PARTITION BY series) AS tot,
        |    count(*) OVER (PARTITION BY series) AS cnt
        |  FROM c),
        |d AS (
        |  SELECT series, b,
        |    CAST(cum AS DOUBLE) / idx AS mean_left,
        |    CAST(tot - cum AS DOUBLE) / (cnt - idx) AS mean_right,
        |    abs(CAST(cum AS DOUBLE) / idx
        |      - CAST(tot - cum AS DOUBLE) / (cnt - idx)) AS delta
        |  FROM st WHERE idx < cnt),
        |r AS (SELECT *, row_number() OVER (PARTITION BY series
        |        ORDER BY delta DESC, b) AS rk FROM d)
        |SELECT series, b AS split_after,
        |  round(mean_left + 1e-9, 4) AS mean_left,
        |  round(mean_right + 1e-9, 4) AS mean_right,
        |  round(delta + 1e-9, 4) AS delta
        |FROM r WHERE rk = 1""".stripMargin,

    "v_k_anonymize" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |         CAST(floor(value / 20.0) AS BIGINT) AS vdec
        |  FROM events),
        |cells AS (SELECT event_type, vdec FROM e
        |          GROUP BY 1, 2 HAVING count(*) >= 10)
        |SELECT e.event_id, e.event_type, e.vdec
        |FROM e JOIN cells USING (event_type, vdec)""".stripMargin,

    "v_cohort_retention" ->
      """WITH e AS (SELECT user_id AS key, date_trunc('day', ts) AS b FROM events),
        |c AS (SELECT key, min(b) AS cohort FROM e GROUP BY key)
        |SELECT c.cohort, e.b AS period, count(DISTINCT e.key) AS n_active
        |FROM e JOIN c ON e.key = c.key
        |GROUP BY c.cohort, e.b""".stripMargin,

    "v_anomaly_mad" ->
      """WITH c AS (
        |  SELECT event_type AS series, date_trunc('hour', ts) AS window_start,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT series, median(CAST(n AS DOUBLE)) AS med FROM c GROUP BY 1),
        |d AS (SELECT c.series, c.window_start, c.n, m.med,
        |             abs(c.n - m.med) AS dev
        |      FROM c JOIN m USING(series)),
        |md AS (SELECT series, median(dev) AS mad FROM d GROUP BY 1)
        |SELECT d.series, d.window_start, d.n,
        |       round(d.med, 2) AS med, round(md.mad, 2) AS mad,
        |       (d.dev > 3.0 * md.mad) AS is_anomaly
        |FROM d JOIN md USING(series)""".stripMargin,

    "v_funnel" ->
      """WITH f AS (
        |  SELECT user_id AS key,
        |         min(CASE WHEN event_type='signup' THEN ts END) AS s1,
        |         min(CASE WHEN event_type='click' THEN ts END) AS s2,
        |         min(CASE WHEN event_type='purchase' THEN ts END) AS s3
        |  FROM events GROUP BY user_id)
        |SELECT key, s1 AS t_signup,
        |  CASE WHEN s1 IS NOT NULL AND s2 > s1 THEN s2 END AS t_click,
        |  CASE WHEN s1 IS NOT NULL AND s2 > s1
        |        AND s3 > s2 THEN s3 END AS t_purchase
        |FROM f""".stripMargin,

    "v_sessionize_gap" ->
      """SELECT user_id AS key, CAST(session AS BIGINT) AS session, count(*) AS n,
        | min(ts) AS first_ts, max(ts) AS last_ts,
        | round(sum(round(value,2)), 2) AS sum_v,
        | CAST(epoch(date_trunc('second', max(ts)))
        |      - epoch(date_trunc('second', min(ts))) AS BIGINT) AS duration_s
        |FROM (
        |  SELECT *, sum(CASE WHEN prev_ts IS NULL
        |                       OR epoch(date_trunc('second', ts))
        |                        - epoch(date_trunc('second', prev_ts)) > 1800 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
        |  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |        FROM events))
        |GROUP BY user_id, session""".stripMargin,

    "v_reduce_starts_when" ->
      """SELECT user_id AS key, CAST(session AS BIGINT) AS session, count(*) AS n, min(ts) AS first_ts,
        | max(ts) AS last_ts, round(sum(round(value,2)), 2) AS sum_v
        |FROM (
        |  SELECT *, sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
        |  FROM events)
        |GROUP BY user_id, session""".stripMargin,

    "v_reduce_max_events" ->
      """SELECT user_id, CAST(chunk AS BIGINT) AS chunk, count(*) AS n_merged,
        | min(ts) AS first_ts, max(ts) AS last_ts,
        | round(sum(round(value, 2)), 2) AS sum_value
        |FROM (
        |  SELECT *, (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) // 8 AS chunk
        |  FROM events)
        |GROUP BY user_id, chunk""".stripMargin,

    "v_window_forward" ->
      """SELECT event_id FROM (
        |  SELECT event_id, event_type,
        |    max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS near_err
        |  FROM events)
        |WHERE event_type = 'purchase' OR near_err = 1""".stripMargin,

    "v_tag_droptag" ->
      """SELECT e.event_id,
        | CASE WHEN r.rk <= 3 THEN e.event_type ELSE NULL END AS event_type
        |FROM events e
        |JOIN (
        |  SELECT event_type, row_number() OVER (ORDER BY fs, event_type) AS rk
        |  FROM (SELECT event_type, min(ts) AS fs FROM events GROUP BY event_type)
        |) r ON e.event_type = r.event_type""".stripMargin,

    "v_tag_bloom" ->
      """WITH tagged AS (
        |  SELECT event_id, ts, CAST(user_id % 97 AS VARCHAR) AS tag97 FROM events),
        |acc AS (
        |  SELECT tag97 FROM (
        |    SELECT tag97, row_number() OVER (ORDER BY fs, tag97) AS rk
        |    FROM (SELECT tag97, min(ts) AS fs FROM tagged GROUP BY tag97))
        |  WHERE rk <= 20),
        |bits AS (
        |  SELECT DISTINCT
        |    (CAST('0x'||substr(md5(j || '|' || tag97),1,15) AS BIGINT) % 64) AS b
        |  FROM acc, (VALUES ('0'),('1')) t(j))
        |SELECT e.event_id, e.tag97 FROM tagged e
        |WHERE e.tag97 IN (SELECT tag97 FROM acc)
        |   OR ((CAST('0x'||substr(md5('0|' || e.tag97),1,15) AS BIGINT) % 64)
        |         IN (SELECT b FROM bits)
        |       AND (CAST('0x'||substr(md5('1|' || e.tag97),1,15) AS BIGINT) % 64)
        |         IN (SELECT b FROM bits))""".stripMargin,

    "v_log_to_metric_hist" ->
      """SELECT event_type,
        | CAST(sum(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS le_50_0,
        | CAST(sum(CASE WHEN value <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS le_100_0,
        | CAST(sum(CASE WHEN value <= 150 THEN 1 ELSE 0 END) AS BIGINT) AS le_150_0,
        | CAST(sum(CASE WHEN value <= 200 THEN 1 ELSE 0 END) AS BIGINT) AS le_200_0,
        | count(*) AS count, round(sum(value), 2) AS sum
        |FROM events GROUP BY event_type""".stripMargin,

    "v_log_to_metric_modes" ->
      """SELECT event_type,
        | (list(round(value,2) ORDER BY ts DESC, event_id DESC))[1] AS gauge_last,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS set_n,
        | count(*) AS count, round(sum(value), 2) AS sum,
        | round(quantile_cont(value, 0.5) + 1e-9, 2) AS p50,
        | round(quantile_cont(value, 0.99) + 1e-9, 2) AS p99
        |FROM events GROUP BY event_type""".stripMargin,

    "v_aggregate_diff" ->
      """SELECT event_id, user_id, round(value - prev, 2) AS diff_value
        |FROM (
        |  SELECT event_id, user_id, value,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events)
        |WHERE prev IS NOT NULL""".stripMargin,

    "v_aggregate_auto" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type, kind,
        | count(*) AS n,
        | round(CASE WHEN kind = 'incremental' THEN sum(value)
        |       ELSE (list(value ORDER BY ts DESC, event_id DESC))[1] END, 2) AS agg_value
        |FROM (SELECT *, CASE WHEN user_id % 2 = 0 THEN 'incremental'
        |                     ELSE 'absolute' END AS kind FROM events)
        |GROUP BY window_start, event_type, kind""".stripMargin,

    "v_remap_fanout" ->
      """SELECT event_id, unnest(string_split(event_type || ',x' || (event_id % 3), ',')) AS part
        |FROM events""".stripMargin,

    "v_multiline" ->
      """SELECT user_id AS key, CAST(record AS BIGINT) AS record, count(*) AS n_lines,
        | string_agg(event_type || ' ' || (event_id % 1000), chr(10) ORDER BY ts, event_id) AS message
        |FROM (
        |  SELECT *, sum(CASE WHEN event_type <> 'click' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS record
        |  FROM events)
        |GROUP BY user_id, record""".stripMargin,

    "v_encode_gelf" ->
      """SELECT event_id,
        | to_json(struct_pack(version := '1.1', host := 'h' || (user_id % 50),
        |   short_message := event_type, "_event_id" := event_id)) AS gelf
        |FROM events""".stripMargin,

    "v_datadog_route" ->
      """SELECT 'hot' AS sink, event_id FROM events WHERE event_type = 'error'
        |UNION ALL SELECT 'big' AS sink, event_id FROM events WHERE value BETWEEN 180 AND 200
        |UNION ALL SELECT 'mix' AS sink, event_id FROM events
        | WHERE event_type LIKE 'sign%' OR (event_type = 'purchase' AND value >= 100)
        |UNION ALL SELECT 'quiet' AS sink, event_id FROM events
        | WHERE NOT (event_type = 'click') AND value < 20
        |UNION ALL SELECT '_unmatched' AS sink, event_id FROM events
        | WHERE NOT (event_type = 'error' OR (value BETWEEN 180 AND 200)
        |   OR (event_type LIKE 'sign%' OR (event_type = 'purchase' AND value >= 100))
        |   OR (NOT (event_type = 'click') AND value < 20))""".stripMargin,

    "v_ddsketch" -> {
      val g = graft.sketch.DDSketch.DefaultGamma
      val lnG = math.log(g)
      s"""WITH b AS (
         |  SELECT event_type, CAST(ceil(ln(value) / $lnG) AS INT) AS bi, count(*) AS cnt
         |  FROM events WHERE value > 0 GROUP BY 1, 2),
         |t AS (
         |  SELECT event_type, bi, cnt,
         |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bi) AS cum,
         |    sum(cnt) OVER (PARTITION BY event_type) AS n
         |  FROM b)
         |SELECT event_type, CAST(n AS BIGINT) AS n,
         |  round(2 * power($g, min(CASE WHEN cum >= floor(0.5 * (n - 1)) + 1 THEN bi END)) / ${g + 1.0}, 6) AS p50,
         |  round(2 * power($g, min(CASE WHEN cum >= floor(0.95 * (n - 1)) + 1 THEN bi END)) / ${g + 1.0}, 6) AS p95
         |FROM t GROUP BY event_type, n""".stripMargin
    },

    "v_template" ->
      """SELECT event_id,
        | ('logs/' || event_type || '/' || strftime(ts, '%Y-%m-%d') || '/u'
        |  || user_id || '-' || strftime(ts, '%H') || '.log') AS path
        |FROM events""".stripMargin,

    "v_json_codec" ->
      """SELECT event_id,
        | to_json(struct_pack(id := event_id, t := event_type)) AS encoded,
        | CAST(json_extract_string(to_json(struct_pack(id := event_id, t := event_type)), '$.t')
        |      AS VARCHAR) AS decoded_t
        |FROM events""".stripMargin
  )
}
