package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Gen
import graft.streaming.StreamOps._

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
                          mode: String = "append"): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
  }

  test("stateless pipeline prefix runs unchanged on a stream") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[StreamRow]
    val rows = (0L until 200L).map { i =>
      val r = Gen.rowOf(i, graft.core.GenConfig(rows = 1000, maxTok = 32))
      StreamRow(ts(i.toInt), r.doc_id, r.tokens, r.n_tok, r.source)
    }
    in.addData(rows: _*)
    runToMemory(routedStream(in.toDF(), Gen.sourceAttrs(spark), longMin = 16)
      .select("doc_id", "source", "_route_sink_hot"), "routed")
    val got = spark.table("routed").count()
    assert(got > 0 && got <= 200) // parse/enrich drops the ghost/abort lanes
  }

  test("windowed counters with watermark aggregate per (window, sink, source)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[StreamRow]
    val rows = (0L until 300L).map { i =>
      val r = Gen.rowOf(i, graft.core.GenConfig(rows = 1000, maxTok = 2048))
      StreamRow(ts((i / 10).toInt), r.doc_id, r.tokens, r.n_tok, r.source)
    }
    in.addData(rows: _*)
    // complete mode: every window emitted — lets us compare totals exactly
    runToMemory(windowedCounters(in.toDF(), Gen.sourceAttrs(spark), col("ts"),
      "10 seconds", "5 seconds"), "wc", mode = "complete")
    val df = spark.table("wc")
    assert(df.columns.toSet == Set("window", "sink", "source", "row_count", "sum_n_tok"))
    // streaming totals across windows == batch pipeline counters over the
    // same rows (stream/batch unification check)
    val streamed = df.groupBy("sink", "source")
      .agg(sum("row_count").as("rc"), sum("sum_n_tok").as("st"))
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val batch = graft.pipeline.TokenPipeline.countersOnly(
      in.toDF().sparkSession.createDataFrame(rows.map(r =>
        (r.doc_id, r.tokens, r.n_tok, r.source)))
        .toDF("doc_id", "tokens", "n_tok", "source"), Gen.sourceAttrs(spark))
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(streamed == batch)
  }

  test("streaming HLL cardinality: per-window sketches re-merge to the batch sketch") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[StreamRow]
    val rows = (0L until 400L).map { i =>
      val r = Gen.rowOf(i, graft.core.GenConfig(rows = 1000, maxTok = 32))
      StreamRow(ts((i / 20).toInt), r.doc_id, r.tokens, r.n_tok, r.source)
    }
    in.addData(rows: _*)
    runToMemory(cardinalityStream(in.toDF(),
      key = xxhash64(col("doc_id")), group = col("source"),
      ts = col("ts"), windowLen = "10 seconds", watermark = "5 seconds"),
      "card", mode = "complete")
    val got = spark.table("card")
      .select("grp", "sk", "est_n")
      .as[(String, Array[Byte], Double)].collect()
    assert(got.nonEmpty)
    // merging every window's sketch per group == ONE batch sketch over the
    // same rows (the cross-window rollup contract: max-merge, idempotent)
    val merged = got.groupBy(_._1).view
      .mapValues(_.map(_._2).reduce(graft.sketch.Hll.merge)).toMap
    val batch = rows.toDF()
      .groupBy(col("source"))
      .agg(graft.sketch.Hll.agg(xxhash64(col("doc_id")), 8).as("sk"))
      .as[(String, Array[Byte])].collect().toMap
    assert(merged.keySet == batch.keySet)
    merged.foreach { case (g, sk) =>
      assert(java.util.Arrays.equals(sk, batch(g)), s"group $g sketch diverged")
    }
    // per-window estimates are sane for the window's true distinct count
    val exact = rows.groupBy(r => (r.source, r.ts.getTime / 10000))
      .map { case ((s, w), rs) => (s, w) -> rs.map(_.doc_id).distinct.size }
    assert(exact.values.sum > 0)
  }

  test("streaming dedupe drops duplicate keys within the watermark") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Keyed]
    in.addData(
      Keyed("a", ts(1), "p1"), Keyed("a", ts(2), "p2"),
      Keyed("b", ts(3), "p3"), Keyed("a", ts(4), "p4"))
    runToMemory(dedupeStream(in.toDF(), Seq("key"), "ts", "10 seconds"), "dd")
    val got = spark.table("dd").select("key").as[String].collect().sorted
    assert(got.toSeq == Seq("a", "b"))
  }

  test("keyed throttle: at most N per key per event-time window") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Keyed]
    // 6 events for key a in one 10s window, 2 for b; threshold 3
    in.addData(
      (1 to 6).map(i => Keyed("a", ts(i), s"a$i")) ++
        Seq(Keyed("b", ts(1), "b1"), Keyed("b", ts(2), "b2")): _*)
    val out = throttleStream(in.toDS(), threshold = 3, windowMs = 10000L)
    runToMemory(out.toDF(), "th")
    val got = spark.table("th").as[Keyed].collect()
    assert(got.count(_.key == "a") == 3)
    assert(got.count(_.key == "b") == 2)
    // earliest-first within the window
    assert(got.filter(_.key == "a").map(_.payload).sorted.toSeq == Seq("a1", "a2", "a3"))
  }

  test("streaming reduce sessions: closer joins its session; expiry flushes open ones") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[SessEvent]
    val out = reduceSessionsStream(
      in.toDS().withWatermark("ts", "2 seconds").as[SessEvent], expireMs = 3000L)
    val q = out.toDF().writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // key a: [1,2,3-closer] then [4,5] left open; key b: [1-closer]
      in.addData(
        SessEvent("a", ts(1), 1.0, ends = false),
        SessEvent("a", ts(2), 2.0, ends = false),
        SessEvent("a", ts(3), 3.0, ends = true),
        SessEvent("a", ts(4), 4.0, ends = false),
        SessEvent("a", ts(5), 5.0, ends = false),
        SessEvent("b", ts(1), 9.0, ends = true))
      q.processAllAvailable()
      val first = spark.table("sess").as[Session].collect()
      // closers emit immediately; the open session is held in state
      assert(first.map(s => (s.key, s.n, s.sum_v)).toSet ==
        Set(("a", 3L, 6.0), ("b", 1L, 9.0)), first.mkString(","))
      // advance the watermark far past last(open session) + expire
      in.addData(SessEvent("c", ts(60), 0.0, ends = true))
      q.processAllAvailable()
      val all = spark.table("sess").as[Session].collect()
      assert(all.map(s => (s.key, s.n, s.sum_v)).toSet ==
        Set(("a", 3L, 6.0), ("b", 1L, 9.0), ("a", 2L, 9.0), ("c", 1L, 0.0)),
        all.mkString(","))
      // the flushed open session carries its event-time span
      val flushed = all.find(s => s.key == "a" && s.n == 2).get
      assert(flushed.first_ts == ts(4) && flushed.last_ts == ts(5))
    } finally q.stop()
  }

  test("streaming exactly-once sink: replayed batch writes nothing twice") {
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("streamsink").toString
    val table = new graft.table.SnapshotTable(s"$root/t")
    val in = MemoryStream[Keyed]
    in.addData(Keyed("a", ts(1), "p1"), Keyed("b", ts(2), "p2"))
    val q = writeToSnapshot(in.toDF(), table, "ss")
    try { q.processAllAvailable() } finally q.stop()
    assert(table.read(spark).get.count() == 2)
    val v = table.currentVersion
    // simulate a replay of the same micro-batch id: idempotent no-op
    assert(!table.append(Seq(("a", ts(1), "p1")).toDF("key", "ts", "payload"),
      s"ss-batch-0"))
    assert(table.currentVersion == v && table.read(spark).get.count() == 2)
    table.destroy()
  }

  test("throttle event-time timeout evicts idle keys, output unchanged") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Keyed]
    in.addData((1 to 5).map(i => Keyed("a", ts(i), s"a$i")): _*)
    val out = throttleStream(in.toDS(), threshold = 2, windowMs = 10000L,
      watermarkDelay = Some("5 seconds"))
    val q = out.toDF().writeStream.format("memory").queryName("th3")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // push the watermark far past key a's eviction point with another key
      in.addData(Keyed("b", ts(1000), "b1"))
      q.processAllAvailable()
      in.addData(Keyed("b", ts(2000), "b2"))
      q.processAllAvailable()
      // throttling semantics unchanged by the timeout mode
      val got = spark.table("th3").as[Keyed].collect().map(_.payload).sorted
      assert(got.toSeq == Seq("a1", "a2", "b1", "b2"))
      // state is bounded to active keys: a was evicted, only b remains
      val lastState = q.recentProgress.reverse
        .flatMap(_.stateOperators.headOption).headOption
      assert(lastState.exists(_.numRowsTotal <= 1L),
        s"state not evicted: ${lastState.map(_.numRowsTotal)}")
    } finally q.stop()
  }

  test("throttle state resets in a new window") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Keyed]
    in.addData((1 to 5).map(i => Keyed("a", ts(i), s"w1-$i")): _*)
    val out = throttleStream(in.toDS(), threshold = 2, windowMs = 10000L)
    val q = out.toDF().writeStream.format("memory").queryName("th2").outputMode("append").start()
    try {
      q.processAllAvailable()
      in.addData((11 to 15).map(i => Keyed("a", ts(i), s"w2-$i")): _*) // next 10s window
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("th2").as[Keyed].collect().map(_.payload).sorted
    assert(got.toSeq == Seq("w1-1", "w1-2", "w2-11", "w2-12"))
  }

  private def chunk(id: String, seq: Int, cnt: Int, p: String, t: Int) =
    GelfChunk(id, seq, cnt, p.getBytes("UTF-8"), ts(t))

  test("streaming gelf: interleaved chunks reassemble across batches; dup seq keeps first arrival") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[GelfChunk]
    val out = reassembleGelfStream(in.toDS().withWatermark("ts", "0 seconds"))
    val q = out.toDF().writeStream.format("memory").queryName("gelf1")
      .outputMode("append").start()
    try {
      // two messages interleaved, m1's chunks out of order and split
      // across micro-batches; a duplicate (m1, seq 0) with different
      // bytes arrives later and must be ignored
      in.addData(chunk("m1", 1, 3, "BB", 1), chunk("m2", 0, 2, "xx", 1))
      q.processAllAvailable()
      in.addData(chunk("m1", 0, 3, "AA", 2), chunk("m1", 0, 3, "ZZ", 3),
        chunk("m2", 1, 2, "yy", 2), chunk("m1", 2, 3, "CC", 4))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("gelf1").as[GelfMessage].collect()
      .map(m => m.msg_id -> (new String(m.message, "UTF-8"), m.error)).toMap
    assert(got == Map("m1" -> ("AABBCC", null), "m2" -> ("xxyy", null)))
  }

  test("streaming gelf: inconsistent total fails fast; incomplete message times out to the error lane") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[GelfChunk]
    val out = reassembleGelfStream(in.toDS().withWatermark("ts", "0 seconds"),
      timeoutMs = 5000L)
    val q = out.toDF().writeStream.format("memory").queryName("gelf2")
      .outputMode("append").start()
    try {
      in.addData(chunk("bad", 0, 3, "aa", 1), chunk("bad", 1, 4, "bb", 2), // count disagrees
        chunk("slow", 0, 2, "s0", 1)) // never completed
      q.processAllAvailable()
      // advance the watermark past slow's firstMs + 5s with a
      // self-contained single-chunk message (completes + clears state)
      in.addData(chunk("late", 0, 1, "ok", 10))
      q.processAllAvailable()
      in.addData(chunk("late2", 0, 1, "ok", 12)) // one more batch to fire the timeout
      q.processAllAvailable()
      val got = spark.table("gelf2").as[GelfMessage].collect()
        .map(m => m.msg_id -> m.error).toMap
      assert(got("bad") == "inconsistent_count")
      assert(got("slow") == "timeout")
      assert(got("late") == null && got("late2") == null)
      // failed/timed-out messages leave no state behind
      val lastState = q.recentProgress.reverse
        .flatMap(_.stateOperators.headOption).headOption
      assert(lastState.exists(_.numRowsTotal == 0L),
        s"state not cleared: ${lastState.map(_.numRowsTotal)}")
    } finally q.stop()
  }

  test("corpus-sketch dedupe on a stream: no false negatives, dups flagged") {
    implicit val sq = spark.sqlContext
    // committed corpus = ids 0..999; the stream replays ids 500..1499 with
    // NEW doc_ids — first half are content-dups, second half genuinely new
    val cfg = graft.core.GenConfig(rows = 2000, maxTok = 64)
    val corpus = spark.range(0, 1000, 1, 4).as[Long]
      .map(i => Gen.rowOf(i, cfg)).toDF()
    val sketch = graft.tokens.TokenOps.bloomSketchValue(corpus, mBits = 1L << 16)
    val in = MemoryStream[StreamRow]
    in.addData((500L until 1500L).map { i =>
      val r = Gen.rowOf(i, cfg)
      StreamRow(ts((i - 500).toInt), s"stream-$i", r.tokens, r.n_tok, r.source)
    }: _*)
    runToMemory(StreamOps.dedupeAgainstCorpus(in.toDF(), sketch)
      .select("doc_id", "maybe_seen"), "sketchdedupe")
    val got = spark.table("sketchdedupe").as[(String, Boolean)].collect().toMap
    assert(got.size == 1000)
    // Bloom law: every true dup (500..999 replay corpus content) IS flagged
    (500L until 1000L).foreach(i => assert(got(s"stream-$i"), s"false negative at $i"))
    // and the genuinely-new lane mostly passes (false positives bounded)
    val fp = (1000L until 1500L).count(i => got(s"stream-$i"))
    assert(fp < 50, s"false-positive rate too high: $fp/500")
  }
}
