package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PiiSpec extends SparkSpec {

  private lazy val docs = Pii.genPiiDocs(spark, rows = 2000, parts = 8).toDF()
  private lazy val out = Pii.scrub(docs, col("text"), col("doc_id"))

  test("planted counts are exact: one hit per planted category") {
    // the generator plants exactly one item per category on its id-modulus
    val agg = out.agg(
      sum("n_email").as("e"), sum("n_ip").as("i"),
      sum("n_ssn").as("s"), sum("n_phone").as("p")).head()
    assert(agg.getAs[Long]("e") === (0 until 2000).count(_ % 3 == 0))
    assert(agg.getAs[Long]("i") === (0 until 2000).count(_ % 4 == 0))
    assert(agg.getAs[Long]("s") === (0 until 2000).count(_ % 7 == 0))
    assert(agg.getAs[Long]("p") === (0 until 2000).count(_ % 5 == 0))
  }

  test("per-row flags follow the plant schedule") {
    val rows = out.select("doc_id", "n_email", "n_ip", "n_ssn", "n_phone")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for (id <- 0L until 2000L) {
      val (e, i, s, p) = rows(id)
      assert(e === (if (id % 3 == 0) 1 else 0), s"email id=$id")
      assert(i === (if (id % 4 == 0) 1 else 0), s"ip id=$id")
      assert(s === (if (id % 7 == 0) 1 else 0), s"ssn id=$id")
      assert(p === (if (id % 5 == 0) 1 else 0), s"phone id=$id")
    }
  }

  test("scrub removes every match and is idempotent") {
    // no category pattern matches scrubbed output (replacement tokens
    // carry no digits or @), so a second pass is the identity
    val rescored = Pii.scrub(out.select(col("doc_id"), col("scrubbed").as("text")),
      col("text"), col("doc_id"))
    val agg = rescored.agg(
      sum("n_email").as("e"), sum("n_ip").as("i"),
      sum("n_ssn").as("s"), sum("n_phone").as("p")).head()
    assert(agg.getAs[Long]("e") === 0L)
    assert(agg.getAs[Long]("i") === 0L)
    assert(agg.getAs[Long]("s") === 0L)
    assert(agg.getAs[Long]("p") === 0L)
    val again = rescored.select(col("doc_id"), col("scrubbed"))
    assert(out.select("doc_id", "scrubbed").exceptAll(again).isEmpty)
  }

  test("generator is parallelism-invariant") {
    val a = Pii.genPiiDocs(spark, rows = 500, parts = 1).toDF()
    val b = Pii.genPiiDocs(spark, rows = 500, parts = 7).toDF()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("replacement tokens land in place (spot row)") {
    // id 0 plants all four categories (0 mod everything)
    val t = out.filter(col("doc_id") === 0L).head().getAs[String]("scrubbed")
    assert(t.contains("<EMAIL>") && t.contains("<IP>") &&
      t.contains("<SSN>") && t.contains("<PHONE>"), t)
    assert(!t.exists(_.isDigit), s"digits survived the scrub: $t")
  }
}
