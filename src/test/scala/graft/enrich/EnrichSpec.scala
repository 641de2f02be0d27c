package graft.enrich

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EnrichSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  test("lookupBetween: date-range enrichment (BetweenDates condition)") {
    val facts = Seq(
      ("web", ts(5), 1L), ("web", ts(15), 2L), ("web", ts(25), 3L), ("code", ts(5), 4L)
    ).toDF("src", "ts", "id")
    // versioned attributes: web priced 10 in [0,10), 20 in [10,20)
    val attrs = Seq(
      ("web", ts(0), ts(10), 10), ("web", ts(10), ts(20), 20), ("code", ts(0), ts(100), 7)
    ).toDF("src", "from_ts", "to_ts", "price")
    val out = Enrich.lookupBetween(facts, attrs, Seq("src"),
      facts("ts"), col("from_ts"), col("to_ts"))
      .select(col("id"), col("price")).as[(Long, Option[Int])].collect().toMap
    assert(out(1L).contains(10)) // ts 5 → first window
    assert(out(2L).contains(20)) // ts 15 → second window
    assert(out(3L).isEmpty)      // ts 25 → no window matches (left join null)
    assert(out(4L).contains(7))
  }

  test("cidrLookup: longest prefix wins, misses stay null, broadcast-only") {
    val facts = Seq(
      (1L, "10.0.3.7"),    // /16 dc-a (beats the /8)
      (2L, "10.1.200.9"),  // /16 dc-b
      (3L, "10.2.0.1"),    // /15 dc-c
      (4L, "10.3.255.254"),// /15 dc-c (second half of the /15)
      (5L, "10.200.0.1"),  // only the /8 default
      (6L, "192.168.1.1")  // no match → null
    ).toDF("id", "ip")
    val table = Seq(
      ("10.0.0.0/16", "dc-a"), ("10.1.0.0/16", "dc-b"),
      ("10.2.0.0/15", "dc-c"), ("10.0.0.0/8", "dc-default")).toDF("cidr", "dc")
    val out = Enrich.cidrLookup(facts, table, col("ip"))
    val got = out.select(col("id"), col("dc")).as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("dc-a") && got(2L).contains("dc-b"))
    assert(got(3L).contains("dc-c") && got(4L).contains("dc-c"))
    assert(got(5L).contains("dc-default") && got(6L).isEmpty)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
  }

  test("findRecords: all matches as a sorted JSON array, [] on miss, case-insensitive option") {
    val facts = Seq((1L, "Smith"), (2L, "jones"), (3L, "nobody")).toDF("id", "surname")
    val people = Seq(
      (1L, "Bob", "smith"), (2L, "Fred", "smith"), (3L, "Ann", "Jones")
    ).toDF("pid", "firstname", "surname")
    // case-sensitive: "Smith" misses the lowercase table rows
    val cs = Enrich.findRecords(facts, people, Seq("surname"),
      Seq("pid", "firstname"))
      .select(col("id"), col("records_json")).as[(Long, String)].collect().toMap
    assert(cs(1L) == "[]")
    assert(cs(2L) == "[]") // table has "Jones", fact has "jones"
    // case-insensitive: multi-row match, sorted deterministically
    val ci = Enrich.findRecords(facts, people, Seq("surname"),
      Seq("pid", "firstname"), caseSensitive = false)
      .select(col("id"), col("records_json")).as[(Long, String)].collect().toMap
    assert(ci(1L) == """[{"pid":1,"firstname":"Bob"},{"pid":2,"firstname":"Fred"}]""")
    assert(ci(2L) == """[{"pid":3,"firstname":"Ann"}]""")
    assert(ci(3L) == "[]")
    // scale shape: dim-side pre-agg + broadcast, fact side never shuffles
    val plan = Enrich.findRecords(facts, people, Seq("surname"),
      Seq("pid", "firstname")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("lookupBetween stays a broadcast join") {
    val facts = Seq(("web", ts(5), 1L)).toDF("src", "ts", "id")
    val attrs = Seq(("web", ts(0), ts(10), 10)).toDF("src", "from_ts", "to_ts", "price")
    val plan = Enrich.lookupBetween(facts, attrs, Seq("src"),
      facts("ts"), col("from_ts"), col("to_ts"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("asofJoin: latest state <= fact ts, inclusive ties, null before first version") {
    val facts = Seq(
      (1L, "a", ts(5)),   // before a's first state → null
      (2L, "a", ts(10)),  // exactly at v1 → inclusive, v1
      (3L, "a", ts(15)),  // between v1 and v2 → v1
      (4L, "a", ts(25)),  // after v2 → v2 (whose attr is NULL — must override v1)
      (5L, "b", ts(50)),  // b has one state at 0
      (6L, "c", ts(50))   // c has no states at all → null
    ).toDF("id", "k", "ts")
    val dims = Seq(
      ("a", ts(10), Option("v1")), ("a", ts(20), None), ("b", ts(0), Option("bv"))
    ).toDF("k", "sts", "tag")
    val out = Enrich.asofJoin(facts, dims, "k", "ts", "sts", Seq("tag"))
      .select(col("id"), col("tag"), col("state_ts"))
      .collect().map(r => r.getLong(0) -> ((Option(r.getString(1)), Option(r.getTimestamp(2)))))
      .toMap
    assert(out(1L) === ((None, None)))
    assert(out(2L) === ((Some("v1"), Some(ts(10)))))
    assert(out(3L) === ((Some("v1"), Some(ts(10)))))
    // row-atomic semantics: v2's null attribute wins over v1's non-null
    assert(out(4L) === ((None, Some(ts(20)))))
    assert(out(5L) === ((Some("bv"), Some(ts(0)))))
    assert(out(6L) === ((None, None)))
  }

  test("saltedJoin: row-identical to the plain join, including misses") {
    // 80% of facts share one hot key; one fact key has no dim row
    val facts = (1 to 500).map(i =>
      (i.toLong, if (i % 5 == 0) s"k${i % 3}" else "hot")).toDF("id", "k")
    val dims = Seq(("hot", 1), ("k0", 2), ("k1", 3), ("nodim", 9)).toDF("k", "w")
    for (salts <- Seq(1, 8)) {
      val out = Enrich.saltedJoin(facts, dims, "k", col("id"), salts)
        .select("id", "k", "w").as[(Long, String, Option[Int])].collect().sorted
      val plain = facts.join(dims, Seq("k"), "left")
        .select("id", "k", "w").as[(Long, String, Option[Int])].collect().sorted
      assert(out.length === 500, s"salts=$salts row count")
      assert(out.toSeq === plain.toSeq, s"salts=$salts")
    }
  }

  test("saltedJoin: hot key's rows spread over many partitions post-join") {
    val facts = (1 to 2000).map(i => (i.toLong, "hot")).toDF("id", "k")
    val dims = Seq(("hot", 1)).toDF("k", "w")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
                "spark.sql.adaptive.enabled" -> "false") {
      val parts = Enrich.saltedJoin(facts, dims, "k", col("id"), salts = 8)
        .withColumn("p", org.apache.spark.sql.functions.spark_partition_id())
        .select("p").distinct().count()
      // flat shuffle join puts ALL hot rows in 1 partition; salted ≈ 8
      assert(parts >= 4, s"hot key only spread over $parts partitions")
    }
  }

  private def withSQLConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bloomPrunedJoin: exactly the plain inner join; prefilter actually prunes") {
    val facts = (1 to 1000).map(i => (i.toLong, i.toLong % 97)).toDF("k", "v")
    val dims = (1 to 1000).filter(_ % 50 == 0).map(i => (i.toLong, s"d$i")).toDF("k", "tag")
    val out = Enrich.bloomPrunedJoin(facts, dims, "k")
      .select("k", "v", "tag").as[(Long, Long, String)].collect().sorted
    val plain = facts.join(dims, Seq("k"), "inner")
      .select("k", "v", "tag").as[(Long, Long, String)].collect().sorted
    assert(out.toSeq === plain.toSeq)
    assert(out.length === 20)
    // the probe itself prunes: at mBits=2^22 over 20 keys, FPs ≈ 0
    val sketch = dims.agg(graft.sketch.BloomSketch.agg(
      graft.text.Hashing.h15(col("k")), 1L << 22, 3)).head().getAs[Array[Byte]](0)
    val bc = spark.sparkContext.broadcast(sketch)
    val kept = facts.filter(graft.sketch.BloomSketch.probe(
      bc, graft.text.Hashing.h15(col("k")), 3)).count()
    assert(kept >= 20 && kept < 60, s"prefilter kept $kept of 1000")
  }

  test("asofJoin plan: one exchange on the key, no join explosion") {
    val facts = (1 to 100).map(i => (i.toLong, s"k${i % 5}", ts(i))).toDF("id", "k", "ts")
    val dims = (0 to 4).flatMap(k => (0 to 3).map(v => (s"k$k", ts(v * 25), s"s$v")))
      .toDF("k", "sts", "tag")
    val df = Enrich.asofJoin(facts, dims, "k", "ts", "sts", Seq("tag"))
    val plan = df.queryExecution.executedPlan.toString
    // union-window shape: a Window over one hashpartitioning exchange, no join operator
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
    assert(df.count() === 100)
  }
}
