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

  test("lookupBetween stays a broadcast join") {
    val facts = Seq(("web", ts(5), 1L)).toDF("src", "ts", "id")
    val attrs = Seq(("web", ts(0), ts(10), 10)).toDF("src", "from_ts", "to_ts", "price")
    val plan = Enrich.lookupBetween(facts, attrs, Seq("src"),
      facts("ts"), col("from_ts"), col("to_ts"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
