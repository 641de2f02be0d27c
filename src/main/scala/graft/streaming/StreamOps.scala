package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Gen
import graft.pipeline.TokenPipeline

/** Structured Streaming surface — Vector is a streaming engine
  * (SURVEY.md §1.5: unbounded streams between components), and every
  * stage of the batch rebuild that is stateless-per-row or
  * broadcast-joined runs unchanged on a streaming DataFrame. This module
  * adds the genuinely stateful stream semantics:
  *
  *  - event-time tumbling aggregation with a watermark — the `aggregate`
  *    transform's `interval_ms` windows (src/transforms/aggregate.rs:26-44;
  *    the reference uses processing-time timers, watermarks are the
  *    event-time upgrade Spark gives for free);
  *  - streaming dedupe with state TTL — the `dedupe` transform's LRU/
  *    `max_age_ms` cache (src/transforms/dedupe/transform.rs:47-85,
  *    timed_transform.rs);
  *  - keyed throttle via `flatMapGroupsWithState` — the `throttle`
  *    transform's per-key GCRA quota (src/transforms/throttle/
  *    transform.rs:42-67), re-expressed as at-most-N-per-key-per-
  *    event-time-window with timeout-evicted state.
  *
  * Scale notes: all state is keyed → partitioned by the shuffle on the
  * grouping key; watermarks bound state size; the stateless pipeline
  * prefix stays whole-stage codegen'd exactly as in batch.
  */
object StreamOps {

  /** The batch dataflow's stateless prefix (parse → enrich → remap →
    * route flags) applied to a STREAMING tokenseq frame — identical code
    * path, proving the stages are execution-mode-agnostic.
    */
  def routedStream(stream: DataFrame, attrs: DataFrame, longMin: Int = 1024): DataFrame = {
    val (flagged, _) = TokenPipeline.dataflow(stream, attrs, longMin)
    flagged
  }

  /** Event-time tumbling per-sink counters with watermark (the streaming
    * form of TokenPipeline.countersOnly / the aggregate transform).
    */
  def windowedCounters(stream: DataFrame, attrs: DataFrame, ts: Column,
                       windowLen: String, watermark: String,
                       longMin: Int = 1024): DataFrame = {
    val flagged = routedStream(stream.withColumn("_ts", ts), attrs, longMin)
    val names = TokenPipeline.routes(longMin).map(_._1) :+ graft.route.Route.Unmatched
    val arms = names.map(n => when(col(s"_route_$n"), lit(n)).otherwise(lit(null: String)))
    flagged
      .withColumn("sink", explode(array_compact(array(arms: _*))))
      .withWatermark("_ts", watermark)
      .groupBy(window(col("_ts"), windowLen), col("sink"), col("source"))
      .agg(count(lit(1)).as("row_count"), sum(col("n_tok")).as("sum_n_tok"))
  }

  /** Windowed distinct-count stream via the mergeable [[graft.sketch.Hll]]
    * aggregate: per (event-time window, group) the HLL register array and
    * its cardinality estimate. The sketch makes streaming distinct counts
    * viable at all — exact `count(distinct)` state grows with the key
    * cardinality per window, while HLL state is a CONSTANT 2^p bytes per
    * group, and the emitted sketches re-merge downstream ([[Hll.merge]] —
    * elementwise max, idempotent) for cross-window/cross-shard rollups
    * without double-counting.
    */
  def cardinalityStream(stream: DataFrame, key: Column, group: Column,
                        ts: Column, windowLen: String, watermark: String,
                        p: Int = 8): DataFrame =
    stream.withColumn("_ts", ts)
      .withWatermark("_ts", watermark)
      .groupBy(window(col("_ts"), windowLen), group.as("grp"))
      .agg(graft.sketch.Hll.agg(key, p).as("sk"))
      .select(col("window"), col("grp"), col("sk"),
        graft.sketch.Hll.estimate(col("sk"), p).as("est_n"))

  /** Streaming dedupe bounded by watermark — state is evicted once the
    * watermark passes (the `max_age_ms` analog; unbounded-cache dedupe
    * would OOM any real stream).
    */
  def dedupeStream(stream: DataFrame, keys: Seq[String], eventTime: String,
                   watermark: String): DataFrame =
    stream.withWatermark(eventTime, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Ingest-time dedupe of a token stream against the COMMITTED corpus:
    * the streaming face of [[graft.tokens.TokenOps.incrementalDedupe]].
    * The corpus Bloom sketch (built once per snapshot commit,
    * [[graft.tokens.TokenOps.bloomSketchValue]]) ships as a broadcast
    * variable; each arriving row pays one narrow codegen'd k-bit probe —
    * no per-batch join against the corpus, no state store. Bloom has no
    * false negatives, so `maybe_seen = false` rows are PROVABLY new and
    * flow through; the surviving maybe-lane (true dups + bounded false
    * positives) is tagged for the downstream exact check (or dropped
    * when `dropMaybe`). Composes with [[dedupeStream]] for WITHIN-stream
    * dups — sketch probe handles stream-vs-corpus, the watermark state
    * handles stream-vs-stream.
    */
  def dedupeAgainstCorpus(stream: DataFrame, sketch: Array[Byte], k: Int = 3,
                          dropMaybe: Boolean = false): DataFrame = {
    val bc = stream.sparkSession.sparkContext.broadcast(sketch)
    val flagged = stream.withColumn("maybe_seen",
      graft.sketch.BloomSketch.probe(bc,
        graft.tokens.TokenOps.contentHash(col("tokens")), k))
    if (dropMaybe) flagged.filter(!col("maybe_seen")) else flagged
  }

  final case class Keyed(key: String, ts: java.sql.Timestamp, payload: String)
  final case class ThrottleState(windowStartMs: Long, count: Int)

  /** Keyed throttle: at most `threshold` rows per key per `windowMs`
    * event-time window; state times out after inactivity (the GCRA
    * quota + periodic key flush of the reference). Emission order within
    * a micro-batch follows arrival order per group — the same
    * arrival-order semantic the reference has.
    *
    * State bound: with `watermarkDelay` set, keys idle for a full window
    * past the watermark are EVICTED via event-time timeout — state is
    * O(active keys), the reference's periodic key flush, and the mode any
    * long-running deployment must use (unbounded key spaces would
    * otherwise grow state forever). `None` keeps `NoTimeout` for ad-hoc
    * runs without an event-time column contract (Spark's processing-time
    * timeout re-triggers endlessly under a drained test harness).
    */
  def throttleStream(ds: Dataset[Keyed], threshold: Int, windowMs: Long,
                     watermarkDelay: Option[String] = None): Dataset[Keyed] = {
    import ds.sparkSession.implicits._
    val src = watermarkDelay.fold(ds)(d => ds.withWatermark("ts", d))
    val timeoutConf =
      if (watermarkDelay.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    src.groupByKey(_.key)
      .flatMapGroupsWithState[ThrottleState, Keyed](
        OutputMode.Append(), timeoutConf) {
        case (_, rows, state: GroupState[ThrottleState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle key: evict quota state
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(ThrottleState(-1L, 0))
            // Deterministic time-order processing needs the full group
            // slice (a later row can sort before an earlier one), so the
            // memory bound is O(rows per key per micro-batch) — but the
            // common case (sources emit per-key time-ordered) is detected
            // in the fill pass and skips the O(n log n) sort; max-ts for
            // eviction rides the same pass instead of a second scan.
            val buf = new scala.collection.mutable.ArrayBuffer[Keyed]()
            var ordered = true
            var prevTs = Long.MinValue
            var maxTs = Long.MinValue
            rows.foreach { r =>
              val t = r.ts.getTime
              if (t < prevTs) ordered = false
              prevTs = t
              if (t > maxTs) maxTs = t
              buf += r
            }
            val rs = if (ordered) buf else buf.sortInPlace()(Ordering.by(_.ts.getTime))
            val out = rs.flatMap { r =>
              val w = r.ts.getTime / windowMs
              if (w != st.windowStartMs) st = ThrottleState(w, 0)
              if (st.count < threshold) { st = st.copy(count = st.count + 1); Some(r) }
              else None
            }
            state.update(st)
            if (watermarkDelay.isDefined && buf.nonEmpty) {
              // evict once the watermark passes a full window beyond the
              // key's last event (clamped above the current watermark, as
              // the API requires)
              state.setTimeoutTimestamp(
                math.max(maxTs + windowMs, state.getCurrentWatermarkMs + 1))
            }
            out.iterator
          }
      }
  }

  final case class SessEvent(key: String, ts: java.sql.Timestamp,
                             value: Double, ends: Boolean)
  final case class SessState(n: Long, firstMs: Long, lastMs: Long, sumV: Double)
  final case class Session(key: String, n: Long, first_ts: java.sql.Timestamp,
                           last_ts: java.sql.Timestamp, sum_v: Double)

  /** STREAMING `reduce` with `ends_when` sessions (reference:
    * src/transforms/reduce/config.rs:45-57 + `expire_after_ms` —
    * merge consecutive per-key events until the closer matches, which
    * joins its session; stale open sessions flush after the expiry gap).
    * The streaming face of [[graft.ops.Transforms.reduceSessionsEndsWhen]]:
    * same session aggregate `(n, first_ts, last_ts, sum_v)`, emitted when
    * the closer arrives or when the watermark passes `expireMs` beyond the
    * session's last event (event-time timeout → state is O(open sessions),
    * the reference's periodic flush).
    *
    * Caller must `withWatermark` the source; rows process in event-time
    * order per micro-batch (ordered-input fast path, sort only on detected
    * disorder — same memory note as [[throttleStream]]).
    */
  def reduceSessionsStream(ds: Dataset[SessEvent],
                           expireMs: Long): Dataset[Session] = {
    import ds.sparkSession.implicits._
    def emit(key: String, st: SessState): Session =
      Session(key, st.n, new java.sql.Timestamp(st.firstMs),
        new java.sql.Timestamp(st.lastMs), math.rint(st.sumV * 100) / 100)
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, rows, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(st => emit(key, st))
            state.remove()
            out.iterator
          } else {
            val buf = new scala.collection.mutable.ArrayBuffer[SessEvent]()
            var ordered = true
            var prevTs = Long.MinValue
            rows.foreach { r =>
              val t = r.ts.getTime
              if (t < prevTs) ordered = false
              prevTs = t
              buf += r
            }
            val rs = if (ordered) buf else buf.sortInPlace()(Ordering.by(_.ts.getTime))
            val out = new scala.collection.mutable.ArrayBuffer[Session]()
            var st = state.getOption.orNull
            rs.foreach { r =>
              val t = r.ts.getTime
              st =
                if (st == null) SessState(1L, t, t, r.value)
                else SessState(st.n + 1, math.min(st.firstMs, t),
                  math.max(st.lastMs, t), st.sumV + r.value)
              if (r.ends) { out += emit(key, st); st = null }
            }
            if (st == null) state.remove()
            else {
              state.update(st)
              state.setTimeoutTimestamp(
                math.max(st.lastMs + expireMs, state.getCurrentWatermarkMs + 1))
            }
            out.iterator
          }
      }
  }

  final case class GelfChunk(msg_id: String, seq: Int, cnt: Int,
                             payload: Array[Byte], ts: java.sql.Timestamp)
  final case class GelfPart(seq: Int, payload: Array[Byte])
  final case class GelfAsmState(cnt: Int, firstMs: Long, parts: List[GelfPart])
  final case class GelfMessage(msg_id: String, message: Array[Byte], error: String)

  /** STREAMING chunked-GELF reassembly — the true form of the
    * reference's decoder (lib/codecs/src/decoding/framing/
    * chunked_gelf.rs): chunks of one message arrive interleaved over
    * time, buffered per message id, and a message that stays incomplete
    * for `timeoutMs` past its FIRST chunk (rs:23-24 — 5 s default) is
    * flushed to the error lane instead of leaking state forever. This is
    * the semantics the batch [[graft.functions.Framing
    * .reassembleGelfWithErrors]] cannot express (a batch job sees the
    * whole capture, so "too late" has no meaning there).
    *
    * Same malformed-stream contract as batch: duplicate (id, seq) chunks
    * ignored keeping the first arrival (rs:424), chunks disagreeing on
    * the total count fail the message immediately with
    * `inconsistent_count` (state dropped — bounded even under a
    * hostile stream), completion emits the seq-ordered concatenation
    * with a null error. Parse-level bounds (count 1..128, seq < count)
    * live in [[graft.functions.GelfChunkParse]] upstream.
    *
    * Scale: state is keyed by msg_id → partitioned by the shuffle;
    * per-message state is ≤128 payloads and lives at most `timeoutMs`
    * past the watermark, so total state is O(in-flight messages) —
    * exactly the reference's `pending` map + tokio timeout task, minus
    * the per-message task spawn. Caller must `withWatermark` the source.
    */
  def reassembleGelfStream(ds: Dataset[GelfChunk],
                           timeoutMs: Long = 5000L): Dataset[GelfMessage] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.msg_id)
      .flatMapGroupsWithState[GelfAsmState, GelfMessage](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (id, rows, state: GroupState[GelfAsmState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(_ => GelfMessage(id, null, "timeout"))
            state.remove()
            out.iterator
          } else {
            // event-time order with the ordered-input fast path (same
            // memory note as throttleStream): "first arrival wins" for
            // duplicate seqs must be deterministic in a batch replay.
            val buf = new scala.collection.mutable.ArrayBuffer[GelfChunk]()
            var ordered = true
            var prevTs = Long.MinValue
            rows.foreach { r =>
              if (r.ts.getTime < prevTs) ordered = false
              prevTs = r.ts.getTime
              buf += r
            }
            val rs = if (ordered) buf else buf.sortInPlace()(Ordering.by(_.ts.getTime))
            var st = state.getOption.orNull
            var verdict: GelfMessage = null
            val it = rs.iterator
            while (verdict == null && it.hasNext) {
              val r = it.next()
              if (st == null) st = GelfAsmState(r.cnt, r.ts.getTime, Nil)
              if (r.cnt != st.cnt)
                verdict = GelfMessage(id, null, "inconsistent_count")
              else if (!st.parts.exists(_.seq == r.seq)) {
                st = st.copy(parts = GelfPart(r.seq, r.payload) :: st.parts)
                if (st.parts.length == st.cnt) {
                  val whole = st.parts.sortBy(_.seq).iterator
                    .map(_.payload).reduce(_ ++ _)
                  verdict = GelfMessage(id, whole, null)
                }
              } // else: duplicate chunk, ignore (rs:424)
            }
            if (verdict != null) { state.remove(); Iterator.single(verdict) }
            else {
              state.update(st)
              state.setTimeoutTimestamp(
                math.max(st.firstMs + timeoutMs, state.getCurrentWatermarkMs + 1))
              Iterator.empty
            }
          }
      }
  }

  /** Exactly-once streaming sink into a [[graft.table.SnapshotTable]]:
    * `foreachBatch` with the micro-batch id as the commit jobId — a
    * replayed batch (failure/restart) hits the idempotent-commit guard and
    * writes nothing twice. This is the streaming face of the same
    * commit protocol the batch pipeline uses (the reference's end-to-end
    * acks + checkpointing, lib/vector-common/src/finalization.rs:284-362).
    */
  def writeToSnapshot(stream: DataFrame, table: graft.table.SnapshotTable,
                      queryName: String,
                      partitionBy: Seq[String] = Nil): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        table.append(batch.toDF(), s"$queryName-batch-$batchId", partitionBy)
        ()
      }
      .start()

  /** Deterministic rate-style demo source: a streaming tokenseq frame built
    * from the `rate` source (the `demo_logs` source analog,
    * src/sources/demo_logs.rs) — content is a pure function of the rate
    * source's monotonically increasing `value`.
    */
  def demoTokenStream(spark: org.apache.spark.sql.SparkSession, rowsPerSec: Int): DataFrame = {
    import spark.implicits._
    val raw = spark.readStream.format("rate").option("rowsPerSecond", rowsPerSec).load()
    val rowEnc = org.apache.spark.sql.Encoders.product[StreamRow]
    raw.select(col("timestamp"), col("value")).as[(java.sql.Timestamp, Long)]
      .map { case (ts, v) =>
        val r = Gen.rowOf(v, graft.core.GenConfig(rows = Long.MaxValue, maxTok = 64))
        StreamRow(ts, r.doc_id, r.tokens, r.n_tok, r.source)
      }(rowEnc).toDF()
  }

  final case class StreamRow(ts: java.sql.Timestamp, doc_id: String,
                             tokens: Array[Int], n_tok: Int, source: String)
}
