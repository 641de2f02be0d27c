package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch `Dataset` analogs of the reference's 17 transforms
  * (reference: src/transforms/mod.rs:5-37; inventory in SURVEY.md §2.1).
  *
  * Each transform from the reference is re-expressed as a declarative
  * Catalyst plan fragment — `DataFrame => DataFrame` — so predicate
  * pushdown, column pruning and whole-stage codegen apply. Stateful
  * processing-time semantics (LRU dedupe, GCRA throttle, ring-buffer
  * window) are re-defined over an explicit deterministic ordering column,
  * which is the only meaning they can have in a distributed batch engine
  * (SURVEY.md §7 "hard parts" #1).
  */
object Transforms {

  /** `filter` transform (reference: src/transforms/filter.rs:88-96):
    * drop rows failing a condition. Trivially `ds.filter` — Catalyst pushes
    * it into the scan.
    */
  def filterT(df: DataFrame, cond: Column): DataFrame = df.filter(cond)

  /** `sample` transform, key-field mode (reference:
    * src/transforms/sample/transform.rs:81-91: seahash(key) % rate == 0).
    * Deterministic hash-bucket sampling on a key column: keeps exactly the
    * rows whose key hashes into bucket 0 of `rate` buckets, and annotates
    * the effective `sample_rate` like the reference does
    * (sample/transform.rs:146). Scale note: a pure narrow map — no shuffle.
    */
  def sampleByHash(df: DataFrame, key: Column, rate: Int): DataFrame =
    df.filter(pmod(xxhash64(key), lit(rate)) === 0)
      .withColumn("sample_rate", lit(rate))

  /** `sample` on an already-numeric key: `key % rate == 0`. Used when the
    * key is a dense id and the oracle must be SQL-expressible in any engine.
    */
  def sampleByMod(df: DataFrame, key: Column, rate: Int): DataFrame =
    df.filter(pmod(key, lit(rate)) === 0).withColumn("sample_rate", lit(rate))

  /** `dedupe` transform (reference: src/transforms/dedupe/transform.rs:47-85
    * — drop events whose match-fields were seen before). Batch semantics:
    * keep the first row per key under a deterministic `orderBy`, which is
    * the distributed meaning of the reference's arrival-order LRU.
    * Scale note: one shuffle on the key; map-side partial aggregation does
    * not apply to row_number, so for pure "keep any one" use
    * `dropDuplicates` instead (hash-agg, partial-combinable).
    */
  def dedupeKeepFirst(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** `throttle` transform (reference: src/transforms/throttle/transform.rs:42-67
    * — at most `threshold` events per `window` per key, GCRA). Batch analog:
    * at most `threshold` rows per (key, time-bucket), earliest first.
    */
  def throttle(df: DataFrame, key: Column, ts: Column, bucket: String,
               threshold: Int, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(key, date_trunc(bucket, ts)).orderBy(ts, tieBreak)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= threshold).drop("_rn")
  }

  /** `aggregate` transform (reference: src/transforms/aggregate.rs:26-84 —
    * metric aggregation over tumbling `interval_ms` windows with modes
    * Sum/Latest/Count/Max/Min/Mean/Stdev). Batch analog: tumbling
    * event-time windows via `date_trunc` + hash aggregation (partial
    * map-side combine → one shuffle). Aggregates are emitted RAW (full
    * double precision) — cross-engine rounding accommodations belong in the
    * oracle-comparison layer (SparkEntry query wrappers), not here.
    */
  def aggregateTumbling(df: DataFrame, ts: Column, bucket: String,
                        series: Seq[Column], value: Column): DataFrame =
    df.groupBy((date_trunc(bucket, ts).as("window_start") +: series): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(value).as("sum_v"),
        avg(value).as("avg_v"),
        min(value).as("min_v"),
        max(value).as("max_v"),
        stddev_samp(value).as("stddev_v"))

  /** `aggregate` Diff mode (reference: src/transforms/aggregate.rs:48-77 —
    * for Absolute-kind metric series, emit the delta against the previous
    * absolute value of the same series; the first observation has nothing
    * to diff against and produces no output). The inverse of
    * [[incrementalToAbsolute]]. Lag window per series — one shuffle on the
    * series key; emitted raw (rounding is the oracle layer's job).
    */
  def aggregateDiff(df: DataFrame, series: Column, order: Seq[Column],
                    value: Column): DataFrame = {
    val w = Window.partitionBy(series).orderBy(order: _*)
    df.withColumn("diff_value", value - lag(value, 1).over(w))
      .filter(col("diff_value").isNotNull)
  }

  /** `aggregate` Auto mode (reference: src/transforms/aggregate.rs:48-77 —
    * kind-aware dispatch over the metric-kind lattice: Incremental series
    * aggregate by SUM within the window, Absolute series by LATEST
    * arrival). One hash aggregate computing both arms; the kind column
    * picks per group. `tie` breaks equal timestamps deterministically.
    */
  def aggregateAuto(df: DataFrame, ts: Column, bucket: String, series: Seq[Column],
                    kind: Column, tie: Column, value: Column): DataFrame =
    df.groupBy((date_trunc(bucket, ts).as("window_start") +: series :+ kind.as("kind")): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(value).as("_sum"),
        max_by(value, struct(ts, tie)).as("_latest"))
      .withColumn("agg_value",
        when(col("kind") === "incremental", col("_sum")).otherwise(col("_latest")))
      .drop("_sum", "_latest")

  /** `reduce` transform (reference: src/transforms/reduce/config.rs:33-106 —
    * group events by fields and merge with per-field strategies). The
    * order-insensitive strategy subset (sum / min / max / count / first-by-ts /
    * last-by-ts) as a single hash aggregate.
    */
  def reduceGroups(df: DataFrame, keys: Seq[Column], ts: Column, value: Column): DataFrame =
    df.groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_merged"),
        min(ts).as("first_ts"),
        max(ts).as("last_ts"),
        round(sum(value), 2).as("sum_value"),
        round(max(value), 2).as("max_value"))

  /** `window` transform (reference: src/transforms/window/transform.rs:50-94
    * — ring buffer of `before` events flushed with `after` following events
    * when `flush_when` fires). Batch analog: a row-frame window over a
    * deterministic per-key ordering — a row survives if any row within
    * [-after, +before] of it (from the row's own perspective) matches the
    * flush condition.
    */
  def contextWindow(df: DataFrame, key: Column, order: Seq[Column],
                    flushWhen: Column, before: Int, after: Int): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*).rowsBetween(-after, before)
    df.withColumn("_keep", max(flushWhen.cast("int")).over(w))
      .filter(col("_keep") === 1).drop("_keep")
  }

  /** `incremental_to_absolute` (reference:
    * src/transforms/incremental_to_absolute.rs:15-68 — running sum per
    * metric series). Running-total window; per-key sequential, shuffled
    * once on the series key.
    */
  def incrementalToAbsolute(df: DataFrame, series: Column, order: Seq[Column],
                            value: Column): DataFrame = {
    val w = Window.partitionBy(series).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("abs_value", round(sum(value).over(w), 2))
  }

  /** `tag_cardinality_limit` (reference:
    * src/transforms/tag_cardinality_limit/mod.rs, value_limit default 500,
    * config.rs:38-39; first-seen values win). Batch analog: rank tag values
    * by first-seen timestamp and keep rows whose value is within the limit
    * (`drop_event` action). The rank table is tiny (distinct tag values) —
    * broadcast back, no second shuffle of the fact table.
    */
  def tagCardinalityLimit(df: DataFrame, tag: String, ts: Column, limit: Int): DataFrame =
    df.join(broadcast(acceptedTags(df, tag, ts, limit)), Seq(tag), "left_semi")

  /** The `limit` first-seen tag values, via aggregate + per-partition top-k
    * (`orderBy(...).limit(k)` → TakeOrderedAndProject). Unlike a
    * `row_number` over a global `Window.orderBy`, NO single task ever sees
    * all distinct tag values — unbounded-cardinality tags are the exact
    * adversary this transform exists for.
    */
  private def acceptedTags(df: DataFrame, tag: String, ts: Column, limit: Int): DataFrame =
    df.groupBy(col(tag)).agg(min(ts).as("_fs"))
      .orderBy(col("_fs"), col(tag)).limit(limit)
      .select(col(tag))

  /** `log_to_metric` counter mode (reference:
    * src/transforms/log_to_metric.rs:42-78 — derive Counter metrics with
    * templated name/tags from log fields). Batch analog: a hash aggregate
    * emitting rows in the metric schema (name, tags, kind, value).
    */
  def logToMetricCounter(df: DataFrame, metricName: String, tags: Seq[String]): DataFrame =
    df.groupBy(tags.map(col): _*)
      .agg(count(lit(1)).cast("double").as("value"))
      .withColumn("name", lit(metricName))
      .withColumn("kind", lit("incremental"))

  /** `metric_to_log` (reference: src/transforms/metric_to_log.rs:30-40 —
    * serialize a metric into a structured log). Batch analog: reshape into
    * the log schema with a message string; pure projection, no shuffle.
    */
  def metricToLog(df: DataFrame, name: Column, value: Column, ts: Column): DataFrame =
    df.select(
      concat(lit("metric "), name, lit("="), value.cast("string")).as("message"),
      ts.as("timestamp"),
      name.as("metric_name"),
      value.as("metric_value"))

  // ------------------- config-variant forms -------------------

  /** `sample` with `exclude` (reference: sample/config.rs:76-83 — events
    * matching `exclude` bypass sampling entirely and carry no
    * `sample_rate`). Narrow map, no shuffle.
    */
  def sampleWithExclude(df: DataFrame, key: Column, rate: Int, exclude: Column): DataFrame =
    df.filter(exclude || pmod(key, lit(rate)) === 0)
      .withColumn("sample_rate", when(exclude, lit(null: java.lang.Integer)).otherwise(lit(rate)))

  /** `throttle` with `exclude` (reference: throttle/config.rs:54-58 —
    * excluded events are never rate-limited and don't consume quota).
    */
  def throttleWithExclude(df: DataFrame, key: Column, ts: Column, bucket: String,
                          threshold: Int, tieBreak: Column, exclude: Column): DataFrame = {
    // excluded rows don't consume quota: rank only the throttled population
    val ranked = df.withColumn("_ex", coalesce(exclude, lit(false)))
      .withColumn("_rn",
        sum(when(col("_ex"), 0).otherwise(1)).over(
          Window.partitionBy(key, date_trunc(bucket, ts)).orderBy(ts, tieBreak)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ranked.filter(col("_ex") || col("_rn") <= threshold).drop("_ex", "_rn")
  }

  /** `sample` with `group_by` (reference: sample/config.rs:60-74 —
    * sampling decisions are made independently per group bucket, so one
    * group's volume can't starve another's sample). The group key joins the
    * hash input; still a narrow map.
    */
  def sampleGrouped(df: DataFrame, group: Column, key: Column, rate: Int): DataFrame =
    df.filter(pmod(key + group * 31L, lit(rate)) === 0)
      .withColumn("sample_rate", lit(rate))
      .withColumn("sample_group", group)

  /** `dedupe` timed variant (reference: dedupe/timed_transform.rs —
    * `max_age_ms` expires cache entries, so duplicates further apart than
    * the window survive). Batch analog: first-per-(key, time-bucket).
    */
  def dedupeTimed(df: DataFrame, keys: Seq[Column], ts: Column, bucket: String,
                  order: Seq[Column]): DataFrame =
    dedupeKeepFirst(df, keys :+ date_trunc(bucket, ts), order)

  /** `dedupe` ignore-list mode (reference: dedupe/common.rs — fields NOT
    * in the ignore list form the match key).
    */
  def dedupeIgnoring(df: DataFrame, ignore: Seq[String], order: Seq[Column]): DataFrame = {
    val keys = df.columns.filterNot(ignore.contains).map(col).toSeq
    dedupeKeepFirst(df, keys, order)
  }

  /** `reduce` with the full order-sensitive strategy set (reference:
    * reduce/config.rs:64-106: discard/retain = first/last by arrival,
    * sum/max/min, array, concat). Arrival order is the explicit (ts, tie)
    * ordering; array/concat collect in that order via sort_array over
    * (ts, tie, v) structs — deterministic under any partitioning.
    */
  def reduceStrategies(df: DataFrame, keys: Seq[Column], ts: Column, tie: Column,
                       value: Column, strValue: Column): DataFrame = {
    val ordStruct = struct(ts.as("o1"), tie.as("o2"), value.as("v"), strValue.as("s"))
    df.groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        min_by(value, ordStruct).as("first_v"),   // discard strategy: first wins
        max_by(value, ordStruct).as("last_v"),    // retain strategy: last wins
        round(sum(value), 2).as("sum_v"),
        max(value).as("max_v"), min(value).as("min_v"),
        transform(sort_array(collect_list(ordStruct)), x => x.getField("v")).as("arr_v"),
        array_join(transform(sort_array(collect_list(ordStruct)), x => x.getField("s")), " ")
          .as("concat_s"),
        array_distinct(transform(sort_array(collect_list(ordStruct)), x => x.getField("s")))
          .as("flat_unique_s"))
  }

  /** `reduce` session semantics (reference: reduce/config.rs:45-57 —
    * merge consecutive events per key until `ends_when` matches; the
    * matching event closes its session). Batch analog: session index =
    * count of closers among strictly-preceding rows, then a hash aggregate
    * on (key, session). One window pass + one shuffle.
    */
  def reduceSessionsEndsWhen(df: DataFrame, key: Column, order: Seq[Column],
                             endsWhen: Column, ts: Column, value: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_sess",
      coalesce(sum(when(endsWhen, 1L).otherwise(0L)).over(w), lit(0L)))
      .groupBy(key.as("key"), col("_sess").as("session"))
      .agg(count(lit(1)).as("n"), min(ts).as("first_ts"), max(ts).as("last_ts"),
        round(sum(value), 2).as("sum_v"))
  }

  /** `reduce` with `starts_when` (reference: reduce/config.rs:52-57 — a
    * matching event OPENS a new session, i.e. increments at the row itself).
    */
  def reduceSessionsStartsWhen(df: DataFrame, key: Column, order: Seq[Column],
                               startsWhen: Column, ts: Column, value: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_sess", sum(when(startsWhen, 1L).otherwise(0L)).over(w))
      .groupBy(key.as("key"), col("_sess").as("session"))
      .agg(count(lit(1)).as("n"), min(ts).as("first_ts"), max(ts).as("last_ts"),
        round(sum(value), 2).as("sum_v"))
  }

  /** Idle-gap sessionization (reference: reduce/config.rs `expire_after_ms`
    * — a key's open session flushes once no event arrives within the gap;
    * the streaming twin is `StreamOps`' event-time-timeout reduce). Batch
    * analog: a session opens where the event-time gap from the key's
    * previous row exceeds `gapSec`; session index = running count of such
    * boundaries. One window pass + one hash aggregate on the SAME key
    * partitioning — a single shuffle end to end, and per-key timelines
    * stay partition-local at any corpus width.
    */
  def sessionizeByGap(df: DataFrame, key: Column, ts: Column,
                      order: Seq[Column], gapSec: Long,
                      value: Column): DataFrame = {
    val wLag = Window.partitionBy(key).orderBy(order: _*)
    val prev = lag(ts, 1).over(wLag)
    // ntz-safe epoch seconds (TIMESTAMP_NTZ has no direct long cast)
    def secs(c: Column) = c.cast("timestamp").cast("long")
    val opens = when(prev.isNull ||
      secs(ts) - secs(prev) > gapSec, 1L).otherwise(0L)
    val wRun = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_new", opens)
      .withColumn("_sess", sum(col("_new")).over(wRun))
      .groupBy(key.as("key"), col("_sess").as("session"))
      .agg(count(lit(1)).as("n"),
        min(ts).as("first_ts"), max(ts).as("last_ts"),
        round(sum(value), 2).as("sum_v"),
        (max(ts).cast("timestamp").cast("long") -
          min(ts).cast("timestamp").cast("long")).as("duration_s"))
  }

  /** First-touch event funnel — per key, the FIRST occurrence time of each
    * named step, kept left-to-right only while those first occurrences are
    * strictly ordered (the first-touch conversion funnel over event logs;
    * the stricter "next occurrence after the previous step" variant needs
    * a per-key ordered scan — use the reduce/session family for that).
    *
    * ONE hash aggregate: conditional `min(ts)` per step (map-side
    * combinable — each partition folds its own rows, merge is min), then
    * a narrow projection nulls out-of-order steps left-to-right. No
    * window, no self-join (the naive k-way self-join on a 10^12-row log
    * is k shuffles of the full table; this is one).
    */
  def funnel(df: DataFrame, key: Column, ts: Column,
             steps: Seq[(String, Column)]): DataFrame = {
    val agged = df.groupBy(key.as("key"))
      .agg(steps.map { case (name, cond) =>
        min(when(cond, ts)).as(s"_t_$name")
      }.head, steps.tail.map { case (name, cond) =>
        min(when(cond, ts)).as(s"_t_$name")
      }: _*)
    // left-to-right: step i survives only if its ts > step i-1's kept ts
    val kept = steps.zipWithIndex.foldLeft(agged) {
      case (d, ((name, _), 0)) =>
        d.withColumn(s"t_$name", col(s"_t_$name"))
      case (d, ((name, _), i)) =>
        val prev = s"t_${steps(i - 1)._1}"
        d.withColumn(s"t_$name",
          when(col(prev).isNotNull && col(s"_t_$name") > col(prev),
            col(s"_t_$name")))
    }
    kept.select(col("key") +: steps.map { case (n, _) => col(s"t_$n") }: _*)
  }

  /** Robust series anomaly flags — per (series, time-bucket) event counts
    * judged against the series' own median via MAD (median absolute
    * deviation): a bucket is anomalous when |n − median| > k·MAD. The
    * median/MAD pair is the robust z-score every log-monitoring stack
    * runs on ingest volumes (outlier-proof where mean/stddev is not).
    *
    * Scale shape: the corpus collapses FIRST into the (series, bucket)
    * count table — one map-side-combinable shuffle, output cardinality =
    * series × buckets, tiny vs the log. Both median passes and the flag
    * run on that table with broadcast joins back. The classic MAD caveat
    * holds: a series with MAD = 0 flags every deviating bucket.
    */
  def anomalyMad(df: DataFrame, series: Column, ts: Column, bucket: String,
                 k: Double = 3.0): DataFrame = {
    val counts = df.groupBy(series.as("series"),
      date_trunc(bucket, ts).as("window_start"))
      .agg(count(lit(1)).as("n"))
    val med = counts.groupBy(col("series"))
      .agg(expr("percentile(n, 0.5)").as("med"))
    val dev = counts.join(broadcast(med), "series")
      .withColumn("dev", abs(col("n") - col("med")))
    val mad = dev.groupBy(col("series"))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "series")
      .select(col("series"), col("window_start"), col("n"),
        round(col("med"), 2).as("med"), round(col("mad"), 2).as("mad"),
        (col("dev") > lit(k) * col("mad")).as("is_anomaly"))
  }

  /** Cohort retention matrix — users grouped by the bucket of their FIRST
    * event (the cohort), counted distinct in every later bucket they
    * reappear in; the (cohort, period) activity matrix behind every
    * retention curve.
    *
    * Scale shape: pass 1 computes each key's cohort with a
    * map-side-combinable `min` (one shuffle on the key); pass 2 counts
    * distinct keys per (cohort, activity-bucket) — Spark plans
    * count-distinct as a two-phase partial/final aggregate, and the
    * matrix output is bucket² rows, metadata-sized. The key's cohort
    * rides along from pass 1 via the same-key join (co-partitioned with
    * pass 1's shuffle — AQE reuses the exchange).
    */
  def cohortRetention(df: DataFrame, key: Column, ts: Column,
                      bucket: String): DataFrame = {
    val events = df.select(key.as("key"), date_trunc(bucket, ts).as("b"))
    val cohorts = events.groupBy(col("key")).agg(min(col("b")).as("cohort"))
    events.join(cohorts, "key")
      .groupBy(col("cohort"), col("b").as("period"))
      .agg(countDistinct(col("key")).cast("long").as("n_active"))
  }

  /** Trailing sliding-window rate — for every event, how many same-key
    * events (itself included) fall in the trailing `windowSec` seconds:
    * the exact quantity a GCRA throttle consults (reference:
    * src/transforms/throttle/transform.rs:42-67 enforces it online; this
    * is the batch audit view, e.g. "how close did each tenant run to its
    * limit").
    *
    * A RANGE-frame window over integer epoch seconds — per key one
    * shuffle, partition-local ordered scan, O(1) frame updates (Spark's
    * range frame slides two pointers; it never re-counts). Ties within a
    * second are frame-symmetric, so the count is order-independent and
    * cross-engine deterministic.
    */
  def slidingRate(df: DataFrame, key: Column, ts: Column,
                  windowSec: Long): DataFrame = {
    val sec = ts.cast("timestamp").cast("long")
    val w = Window.partitionBy(key).orderBy(sec)
      .rangeBetween(-windowSec, 0)
    df.withColumn("rate_n", count(lit(1)).over(w))
  }

  /** Level-shift change-point — single binary segmentation over each
    * series' bucket counts: the split maximizing |mean(left) − mean(right)|
    * (the first step of the classic binary-segmentation change-point
    * family; MAD flags spikes, this finds sustained shifts — "ingest
    * volume stepped up at 14:00").
    *
    * Scale shape: the corpus collapses FIRST to (series, bucket) counts —
    * one combinable shuffle; prefix sums, candidate split deltas, and the
    * per-series argmax are windows over that metadata-sized table.
    * Deterministic: integer prefix sums, IEEE-exact mean division, ties
    * broken by bucket.
    */
  def changePoint(df: DataFrame, series: Column, ts: Column,
                  bucket: String): DataFrame = {
    val counts = df.groupBy(series.as("series"),
      date_trunc(bucket, ts).as("b"))
      .agg(count(lit(1)).as("n"))
    val wOrd = Window.partitionBy(col("series")).orderBy(col("b"))
    val wAll = Window.partitionBy(col("series"))
    val staged = counts
      .withColumn("idx", row_number().over(wOrd).cast("long"))
      .withColumn("cum", sum(col("n")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("n")).over(wAll))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .filter(col("idx") < col("cnt")) // split AFTER this bucket
      .withColumn("mean_left", col("cum").cast("double") / col("idx"))
      .withColumn("mean_right",
        (col("tot") - col("cum")).cast("double") / (col("cnt") - col("idx")))
      .withColumn("delta", abs(col("mean_left") - col("mean_right")))
    val wBest = Window.partitionBy(col("series"))
      .orderBy(col("delta").desc, col("b"))
    staged.withColumn("_rk", row_number().over(wBest))
      .filter(col("_rk") === 1)
      .select(col("series"), col("b").as("split_after"),
        // +1e-9: decimal-lattice halfway points round differently per
        // engine (BENCH.md methodology; the repo-wide average convention)
        round(col("mean_left") + lit(1e-9), 4).as("mean_left"),
        round(col("mean_right") + lit(1e-9), 4).as("mean_right"),
        round(col("delta") + lit(1e-9), 4).as("delta"))
  }

  /** SLO burn rate — the multi-window error-budget alert (Google SRE
    * workbook ch. 5): per (series, hour), the error rate and its
    * trailing-6h counterpart in integer ppm, plus the fast/slow burn
    * flags (hourly rate > 14.4× budget / 6-h rate > 6× budget — page
    * only when BOTH windows burn, which this emits as columns so the
    * caller ANDs them).
    *
    * The corpus collapses once into hourly (n, errors) pairs —
    * combinable shuffle; trailing sums are a RANGE frame over the
    * collapsed table's integer epoch hours. All-integer rates (`div`,
    * ppm) — no float drift anywhere.
    */
  def burnRate(df: DataFrame, series: Column, ts: Column, isError: Column,
               budgetPpm: Long): DataFrame = {
    require(budgetPpm > 0, "budgetPpm must be positive")
    val hourly = df.groupBy(series.as("series"),
      date_trunc("hour", ts).as("h"))
      .agg(count(lit(1)).as("n"),
        sum(when(coalesce(isError, lit(false)), 1L).otherwise(0L)).as("errs"))
    val hEpoch = col("h").cast("timestamp").cast("long")
    val w6 = Window.partitionBy(col("series")).orderBy(hEpoch)
      .rangeBetween(-5 * 3600L, 0)
    hourly
      .withColumn("n6", sum(col("n")).over(w6))
      .withColumn("errs6", sum(col("errs")).over(w6))
      .select(col("series"), col("h"), col("n"), col("errs"),
        expr("errs * 1000000L div n").as("rate_ppm"),
        expr("errs6 * 1000000L div n6").as("rate6_ppm"),
        (expr("errs * 1000000L div n") > lit(budgetPpm * 144L / 10L))
          .as("burn_fast"),
        (expr("errs6 * 1000000L div n6") > lit(budgetPpm * 6L))
          .as("burn_slow"))
  }

  /** Join-key skew audit — the diagnostic run BEFORE picking a join
    * strategy: the top-k heaviest keys with their integer-ppm share of
    * the table. A key above ~1/parallelism ppm means a flat shuffle
    * join serializes through one reducer → reach for
    * [[graft.enrich.Enrich.saltedJoin]] (and size `salts` from the share).
    *
    * One combinable count + a TakeOrdered top-k; shares in integer ppm
    * (exact `div`, no float drift).
    */
  def skewAudit(df: DataFrame, key: Column, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    // total as a broadcast 1-row join, NOT a partitionBy() window — an
    // empty-partition window would drag every distinct key through one
    // task, the exact pathology this audit exists to catch
    val tot = counts.agg(sum(col("n")).as("tot"))
    counts.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("n * 1000000L div tot"))
      .orderBy(col("n").desc, col("key"))
      .limit(topK)
      .select(col("key"), col("n"), col("share_ppm"))
  }

  /** Winsorization — clamp a value column to its series' [lo, hi]
    * percentile band (outlier trimming before any mean/sum aggregation;
    * the metric-hygiene step between log_to_metric and aggregate when a
    * buggy client emits 1e12 ms latencies).
    *
    * The percentile pair collapses per series (one combinable-input
    * aggregate; interpolation matches DuckDB's `quantile_cont` — the
    * proven cross-engine pair from the summary-mode oracle) and
    * broadcasts back; the clamp itself is a narrow `least/greatest`.
    */
  def winsorize(df: DataFrame, series: Column, value: Column,
                lo: Double = 0.01, hi: Double = 0.99,
                out: String = "value_w"): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "need 0 <= lo < hi <= 1")
    val base = df.withColumn("_wv", value)
    val q = base.groupBy(series.as("_ws"))
      .agg(expr(s"percentile(_wv, $lo)").as("_lo"),
        expr(s"percentile(_wv, $hi)").as("_hi"))
    base.join(broadcast(q), series === col("_ws"))
      .withColumn(out, least(greatest(col("_wv"), col("_lo")), col("_hi")))
      .drop("_ws", "_wv", "_lo", "_hi")
  }

  /** k-anonymity suppression — drop every row whose quasi-identifier
    * combination has fewer than k occurrences (the release gate privacy
    * reviews run on training corpora: a (lang, source, ...) cell with 2
    * members re-identifies them). One combinable count per cell +
    * a same-key join back; rows never shuffle twice.
    */
  def kAnonymize(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame = {
    val cells = df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("_cell_n"))
      .filter(col("_cell_n") >= k)
    df.join(cells, quasiIds).drop("_cell_n")
  }

  /** Multiline aggregation (reference: file source `multiline` mode,
    * src/sources/file.rs:64-245 — continuation lines are appended to the
    * record opened by the last start-marker line). Batch analog of
    * `starts_when` sessionization with an ordered string_agg.
    */
  def multilineAggregate(df: DataFrame, fileKey: Column, order: Seq[Column],
                         startsWhen: Column, line: Column): DataFrame = {
    val w = Window.partitionBy(fileKey).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ordStruct = struct(order.map(o => o) :+ line.as("l"): _*)
    df.withColumn("_rec", sum(when(startsWhen, 1L).otherwise(0L)).over(w))
      .groupBy(fileKey.as("key"), col("_rec").as("record"))
      .agg(count(lit(1)).as("n_lines"),
        array_join(transform(sort_array(collect_list(ordStruct)),
          x => x.getField("l")), "\n").as("message"))
  }

  /** `reduce` with `max_events` (reference: reduce/config.rs — a group
    * flushes once it has merged N events). Batch analog: arrival-ordered
    * chunks of `maxEvents` per key, each merged independently.
    */
  def reduceMaxEvents(df: DataFrame, keys: Seq[Column], ts: Column, tie: Column,
                      value: Column, maxEvents: Int): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ts, tie)
    df.withColumn("_chunk", floor((row_number().over(w) - 1) / maxEvents))
      .groupBy(keys :+ col("_chunk"): _*)
      .agg(count(lit(1)).as("n_merged"), min(ts).as("first_ts"),
        max(ts).as("last_ts"), round(sum(value), 2).as("sum_value"))
      .withColumnRenamed("_chunk", "chunk")
  }

  /** `window` with `forward_when` bypass (reference: window/config.rs:44-50
    * — matching events always pass, independent of the ring buffer).
    */
  def contextWindowForward(df: DataFrame, key: Column, order: Seq[Column],
                           flushWhen: Column, before: Int, after: Int,
                           forwardWhen: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*).rowsBetween(-after, before)
    df.withColumn("_keep",
      coalesce(forwardWhen, lit(false)) || max(flushWhen.cast("int")).over(w) === 1)
      .filter(col("_keep")).drop("_keep")
  }

  /** `tag_cardinality_limit` with `action = drop_tag` (reference:
    * tag_cardinality_limit/config.rs:90-96 — the event survives, the
    * over-limit tag value is nulled out).
    */
  def tagCardinalityDropTag(df: DataFrame, tag: String, ts: Column, limit: Int): DataFrame = {
    val allowed = acceptedTags(df, tag, ts, limit)
      .select(col(tag).as("_allowed_tag"))
    df.join(broadcast(allowed), col(tag) === col("_allowed_tag"), "left")
      .withColumn(tag, when(col("_allowed_tag").isNull, lit(null: String)).otherwise(col(tag)))
      .drop("_allowed_tag")
  }

  /** `tag_cardinality_limit` in PROBABILISTIC mode (reference:
    * src/transforms/tag_cardinality_limit/config.rs:56-83 and
    * tag_value_set.rs:60-137 — a Bloom filter tracks seen tag values
    * instead of an exact HashSet; the mode deployments pick when exact
    * tracking would blow memory at high cardinality). Batch analog, fully
    * DETERMINISTIC so the oracle reproduces every accept/reject decision:
    * the accepted set is the first `limit` values by first-seen time, and
    * the Bloom filter is the k md5-derived bit positions of those accepted
    * values in an m-bit table. A value passes if it is accepted OR all k
    * of its bit positions collide with accepted bits — the Bloom FALSE
    * POSITIVE, exactly the bounded over-admission the reference mode
    * trades for O(m) memory. Scale shape: the accepted set (`limit` rows)
    * and the bit table (≤ m rows) broadcast; the fact table never
    * shuffles.
    */
  def tagCardinalityLimitBloom(df: DataFrame, tag: String, ts: Column,
                               limit: Int, mBits: Int = 64, k: Int = 2): DataFrame = {
    import graft.text.Hashing
    def pos(j: Int, c: Column): Column =
      pmod(Hashing.h15(concat(lit(s"$j|"), c)), lit(mBits.toLong))
    val accepted = acceptedTags(df, tag, ts, limit)
    val bits = (0 until k).map(j => accepted.select(pos(j, col(tag)).as("_b")))
      .reduce(_ unionByName _).distinct()
    val withAcc = df.join(broadcast(accepted.select(col(tag).as("_acc_v"))),
      col(tag) === col("_acc_v"), "left")
    val withHits = (0 until k).foldLeft(withAcc) { (d, j) =>
      d.join(broadcast(bits.select(col("_b").as(s"_hit$j"))),
        pos(j, col(tag)) === col(s"_hit$j"), "left")
    }
    val falsePositive = (0 until k).map(j => col(s"_hit$j").isNotNull).reduce(_ && _)
    withHits.filter(col("_acc_v").isNotNull || falsePositive)
      .drop(("_acc_v" +: (0 until k).map(j => s"_hit$j")): _*)
  }

  /** `log_to_metric` histogram mode (reference: log_to_metric.rs:101-123 —
    * derive an AggregatedHistogram: cumulative bucket counts + count + sum).
    */
  def logToMetricHistogram(df: DataFrame, tags: Seq[String], value: Column,
                           buckets: Seq[Double]): DataFrame = {
    val bucketAggs = buckets.map(b =>
      sum(when(value <= b, 1L).otherwise(0L)).as(s"le_${b.toString.replace('.', '_')}"))
    df.groupBy(tags.map(col): _*)
      .agg(bucketAggs.head, bucketAggs.tail ++ Seq(
        count(lit(1)).as("count"), round(sum(value), 2).as("sum")): _*)
  }
}
