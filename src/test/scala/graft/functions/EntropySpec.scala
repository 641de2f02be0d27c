package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native [[ShannonEntropy]] vs the higher-order-function formulation it
  * replaced (the cross-engine shape the f_entropy oracle checks at 6 dp).
  */
class EntropySpec extends SparkSpec {
  import spark.implicits._

  /** The original HOF formulation (kept here as the reference). */
  private def hofEntropy(c: org.apache.spark.sql.Column) = {
    val chars = split(c, "", -1)
    val n = size(chars).cast("double")
    -aggregate(array_distinct(chars), lit(0.0), (acc, ch) => {
      val p = size(filter(chars, x => x === ch)).cast("double") / n
      acc + p * log(2.0, p)
    })
  }

  private val samples = Seq("", "a", "aa", "ab", "abab", "error", "signup",
    "the quick brown fox", "aaaaaaaaab", "προφίλ ✓ mixed", "0123456789" * 10)

  test("native expression matches the HOF formulation at 6 dp") {
    val got = samples.toDF("s").select(col("s"),
      round(Vrl.shannonEntropy(col("s")), 6).as("native"),
      round(hofEntropy(col("s")), 6).as("hof"))
      .as[(String, Double, Double)].collect()
    got.foreach { case (s, n, h) => assert(n == h, s"input='$s'") }
  }

  test("known values") {
    val m = samples.toDF("s")
      .select(col("s"), round(Vrl.shannonEntropy(col("s")), 6).as("e"))
      .as[(String, Double)].collect().toMap
    assert(m("a") == 0.0 && m("aa") == 0.0)
    assert(m("ab") == 1.0 && m("abab") == 1.0) // two equiprobable symbols
    assert(math.abs(m("aaaaaaaaab") - 0.468996) < 1e-6)
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(100).select(Vrl.shannonEntropy(col("id").cast("string")).as("e"))
    df.collect() // exercises the generated code path
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("codegen id"), formatted)
  }
}
