package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  test("sessionizeByGap: sessions split exactly where the idle gap exceeds the threshold") {
    // key A: rows at 0s, 100s, 2000s (gap 1900 > 1800 → new session), 2100s
    // key B: single row
    val df = Seq(
      ("A", ts(0), 1L, 1.0), ("A", ts(100), 2L, 2.0),
      ("A", ts(2000), 3L, 4.0), ("A", ts(2100), 4L, 8.0),
      ("B", ts(50), 5L, 16.0)
    ).toDF("k", "ts", "id", "v")
    val out = Transforms.sessionizeByGap(df, col("k"), col("ts"),
      Seq(col("ts"), col("id")), gapSec = 1800, col("v"))
      .select("key", "session", "n", "sum_v", "duration_s")
      .as[(String, Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq === Seq(
      ("A", 1L, 2L, 3.0, 100L),
      ("A", 2L, 2L, 12.0, 100L),
      ("B", 1L, 1L, 16.0, 0L)))
  }

  test("funnel: left-to-right strict ordering of first occurrences") {
    val df = Seq(
      ("u1", ts(0), "a"), ("u1", ts(10), "b"), ("u1", ts(20), "c"), // full funnel
      ("u2", ts(10), "b"), ("u2", ts(20), "a"),                     // b before a → stops at a
      ("u3", ts(0), "a"), ("u3", ts(0), "b"),                       // tie is NOT strictly after
      ("u4", ts(5), "c")                                            // never entered
    ).toDF("k", "ts", "e")
    val out = Transforms.funnel(df, col("k"), col("ts"), Seq(
      "a" -> (col("e") === "a"), "b" -> (col("e") === "b"), "c" -> (col("e") === "c")))
      .collect().map(r => r.getString(0) ->
        ((r.isNullAt(1), r.isNullAt(2), r.isNullAt(3)))).toMap
    assert(out("u1") === ((false, false, false)))
    assert(out("u2") === ((false, true, true)))  // a found, b's first occ precedes it
    assert(out("u3") === ((false, true, true)))  // equal ts: strict > fails
    assert(out("u4") === ((true, true, true)))
  }

  test("anomalyMad: flags exactly the spiked bucket; robust to the spike itself") {
    // series X: 9 calm hours at ~10 events, 1 spiked hour at 60
    val rows = (0 until 10).flatMap { h =>
      val n = if (h == 7) 60 else 10 + (h % 3) // 10/11/12 background
      (0 until n).map(i => ("X", ts(h * 3600L + i), i.toLong))
    }
    val out = Transforms.anomalyMad(rows.toDF("e", "ts", "id"),
      col("e"), col("ts"), "hour")
      .select("n", "is_anomaly").as[(Long, Boolean)].collect()
    assert(out.length === 10)
    val flagged = out.filter(_._2)
    assert(flagged.toSeq === Seq((60L, true)), s"flags: ${flagged.toSeq}")
  }

  test("slidingRate: trailing inclusive frame, boundary at exactly windowSec in") {
    val df = Seq(
      ("A", ts(0), 1L), ("A", ts(100), 2L),
      ("A", ts(3600), 3L),  // 3600s after t0: still IN t0's 3600 trailing frame
      ("A", ts(3701), 4L),  // t=100+3601: 100 drops out, 3600 stays
      ("B", ts(0), 5L)
    ).toDF("k", "ts", "id")
    val out = Transforms.slidingRate(df, col("k"), col("ts"), 3600L)
      .select("id", "rate_n").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 1L))
  }

  test("burnRate: integer rates exact; flags fire at the SRE thresholds") {
    // hour 0: 2/10 errors (200000 ppm > 14.4% fast threshold at 1% budget)
    // hours 1-5: 0/10 -> trailing-6h at hour 5 = 2/60 = 33333 ppm
    val rows = (0 until 6).flatMap { h =>
      (0 until 10).map(i => ("api", ts(h * 3600L + i), h == 0 && i < 2))
    }
    val out = Transforms.burnRate(rows.toDF("svc", "ts", "err"),
      col("svc"), col("ts"), col("err"), budgetPpm = 10000L)
      .select("n", "errs", "rate_ppm", "rate6_ppm", "burn_fast", "burn_slow")
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect()
      .sortBy(_._4)(Ordering[Long].reverse)
    assert(out.length === 6)
    val h0 = out.find(_._2 == 2L).get
    assert(h0 === ((10L, 2L, 200000L, 200000L, true, true)))
    // the last hour still carries hour 0 in its trailing window
    assert(out.exists(r => r._2 == 0L && r._4 == 2000000L / 60L))
    // quiet hours never burn fast
    assert(out.filter(_._2 == 0L).forall(!_._5))
  }

  test("winsorize: clamps both tails, leaves the body untouched") {
    // 100 values 1..100 per series; p1=1.99, p99=99.01 (linear interp)
    val df = (1 to 100).map(i => ("A", i.toLong, i.toDouble)).toDF("k", "id", "v")
    val out = Transforms.winsorize(df, col("k"), col("v"))
      .select("id", "value_w").as[(Long, Double)].collect().toMap
    assert(out(1L) === 1.99) // low tail raised to p1
    assert(out(100L) === 99.01) // high tail lowered to p99
    assert(out(50L) === 50.0) // body untouched
    assert(out.size === 100)
  }

  test("changePoint: finds the level shift; means exact") {
    // series X: hours 0-2 at 10 events, hours 3-4 at 30 events
    val rows = (0 until 5).flatMap { h =>
      val n = if (h < 3) 10 else 30
      (0 until n).map(i => ("X", ts(h * 3600L + i)))
    }
    val out = Transforms.changePoint(rows.toDF("e", "ts"), col("e"), col("ts"), "hour")
      .select("mean_left", "mean_right", "delta")
      .as[(Double, Double, Double)].collect()
    assert(out.length === 1)
    assert(out.head === ((10.0, 30.0, 20.0)))
  }

  test("kAnonymize: cells under k vanish entirely, cells at k survive whole") {
    val df = (1 to 10).map(i => (i.toLong, "big")) ++
      (11 to 13).map(i => (i.toLong, "small"))
    val out = Transforms.kAnonymize(df.toDF("id", "cell"), Seq("cell"), k = 5)
      .select("id").as[Long].collect().sorted
    assert(out.toSeq === (1L to 10L))
  }

  test("allocateBudget: exact total, proportional bases, deterministic remainders") {
    import graft.tokens.TokenOps
    // weights 5:3:2 over budget 103 -> exact 51.5/30.9/20.6,
    // bases 51/30/20 (sum 101), two spares -> remainders .9 (b) and .6 (c)
    val rows = (1 to 50).map(i => (i, "a")) ++ (1 to 30).map(i => (i, "b")) ++
      (1 to 20).map(i => (i, "c"))
    val out = TokenOps.allocateBudget(rows.toDF("id", "source"),
      col("source"), budget = 103L)
      .select("source", "budget").as[(String, Long)].collect().toMap
    assert(out.values.sum === 103L)
    assert(out === Map("a" -> 51L, "b" -> 31L, "c" -> 21L))
  }

  test("cohortRetention: first-bucket cohorts, later activity counted distinct") {
    val day = 86400L
    val df = Seq(
      ("u1", ts(0)), ("u1", ts(10)),          // day 0 cohort, active day 0 only
      ("u1", ts(2 * day)),                    // ... and day 2
      ("u2", ts(day)), ("u2", ts(2 * day)),   // day 1 cohort
      ("u3", ts(0))                           // day 0 cohort, day 0 only
    ).toDF("k", "ts")
    val out = Transforms.cohortRetention(df, col("k"), col("ts"), "day")
      .select("cohort", "period", "n_active")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
      .map(r => (r._1.getTime, r._2.getTime, r._3)).toSet
    val d0 = ts(0).getTime / (day * 1000) * (day * 1000)
    assert(out === Set(
      (d0, d0, 2L),                       // u1+u3 on their cohort day
      (d0, d0 + 2 * day * 1000, 1L),      // u1 returns day 2
      (d0 + day * 1000, d0 + day * 1000, 1L),
      (d0 + day * 1000, d0 + 2 * day * 1000, 1L)))
  }

  test("sessionizeByGap: a gap of exactly gapSec does NOT split (strict >)") {
    val df = Seq(("A", ts(0), 1L, 1.0), ("A", ts(1800), 2L, 2.0))
      .toDF("k", "ts", "id", "v")
    val out = Transforms.sessionizeByGap(df, col("k"), col("ts"),
      Seq(col("ts"), col("id")), gapSec = 1800, col("v"))
    assert(out.count() === 1)
  }
}
