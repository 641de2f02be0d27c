package graft.conditions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DatadogSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "error", 190.0, "disk full on node-3"),
    (2L, "click", 10.0, "user clicked buy"),
    (3L, "signup", 55.0, "new user signup"),
    (4L, "purchase", 120.0, "order placed"),
    (5L, "purchase", 15.0, "order placed small"),
    (6L, "error", 5.0, null)
  ).toDF("id", "event_type", "value", "message")

  private def ids(q: String): Set[Long] =
    df.filter(DatadogSearch.compile(q, col, col("message")))
      .select("id").as[Long].collect().toSet

  test("field equality, wildcard, phrase") {
    assert(ids("event_type:error") == Set(1L, 6L))
    assert(ids("event_type:sign*") == Set(3L))
    assert(ids("event_type:\"purchase\"") == Set(4L, 5L))
  }

  test("numeric comparison and range") {
    assert(ids("value:>100") == Set(1L, 4L))
    assert(ids("value:<=10") == Set(2L, 6L))
    assert(ids("value:[10 TO 60]") == Set(2L, 3L, 5L))
  }

  test("boolean operators, implicit AND, parens, negation") {
    assert(ids("event_type:error AND value:>100") == Set(1L))
    assert(ids("event_type:error value:>100") == Set(1L)) // adjacency = AND
    assert(ids("event_type:error OR event_type:signup") == Set(1L, 3L, 6L))
    assert(ids("(event_type:error OR event_type:click) AND value:<50") == Set(2L, 6L))
    assert(ids("NOT event_type:error") == Set(2L, 3L, 4L, 5L))
    assert(ids("-event_type:error value:>0") == Set(2L, 3L, 4L, 5L))
  }

  test("bare terms hit the default field; null-safe") {
    assert(ids("order") == Set(4L, 5L))
    assert(ids("\"disk full\"") == Set(1L))
    assert(ids("order AND value:<20") == Set(5L))
    // row 6 has null message: bare term must be false, not null-poisoned
    assert(ids("NOT disk") == Set(2L, 3L, 4L, 5L, 6L))
  }

  test("existence wildcard and field presence") {
    assert(ids("message:*") == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("compiled predicate pushes down to a parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("ddsearch").toString + "/t"
    df.write.parquet(dir)
    val p = spark.read.parquet(dir)
      .filter(DatadogSearch.compile("event_type:error", col, col("message")))
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("EqualTo(event_type,error)"), p)
  }
}
