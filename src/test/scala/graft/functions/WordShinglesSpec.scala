package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.SparkSpec

/** Pins the native [[WordShingles]] byte-slice expression to the original
  * higher-order-function formulation (array_distinct ∘ transform ∘ slice ∘
  * concat_ws) — first-occurrence order included, since array_distinct
  * preserves it and downstream MinHash folds iterate the array.
  */
class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  private def hof(text: org.apache.spark.sql.Column, n: Int) = {
    val toks = split(text, " ", -1)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          j => concat_ws(" ", slice(toks, j, lit(n)))))
        .otherwise(array()))
  }

  private def native(text: org.apache.spark.sql.Column, n: Int) =
    Bridge.column(WordShingles(Bridge.expression(text), n))

  test("native shingles equal the HOF formulation incl. order and edges") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a a",                       // heavy dedup
      "one two",                           // < n tokens
      "solo",
      "",                                  // empty text → [""] → < n
      "double  space  run",                // empty tokens from split
      " leading and trailing ",
      "καλημέρα κόσμε unicode δοκιμή εδώ", // multibyte
      "x y z x y z x y z"                  // repeated shingles, order matters
    ).toDF("t")
    for (n <- Seq(1, 2, 3, 5)) {
      val got = docs.select(native(col("t"), n)).as[Seq[String]].collect()
      val exp = docs.select(hof(col("t"), n)).as[Seq[String]].collect()
      assert(got.toSeq == exp.toSeq, s"n=$n: ${got.toSeq} vs ${exp.toSeq}")
    }
  }

  test("native shingles on the real documents table equal the HOF plan") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val joined = docs.select(col("doc_id"),
      native(col("text"), 3).as("a"), hof(col("text"), 3).as("b"))
      .filter(not(col("a") === col("b")))
    assert(joined.count() == 0)
  }
}
