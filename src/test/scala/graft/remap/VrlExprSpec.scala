package graft.remap

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VrlExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "error", 190.5, 2000, "web"),
    (2L, "click", 10.0, 100, "books"),
    (3L, "signup", 55.25, 1500, "web")
  ).toDF("id", "kind", "v", "n_tok", "source")

  private def evalD(e: String): Seq[Double] =
    df.select(VrlExpr.compile(e).cast("double")).as[Double].collect().toSeq
  private def evalS(e: String): Seq[String] =
    df.select(VrlExpr.compile(e).cast("string")).as[String].collect().toSeq

  test("arithmetic, precedence, comparison, boolean") {
    assert(evalD(".id + 2 * 3") == Seq(7.0, 8.0, 9.0))
    assert(evalD("(.id + 2) * 3") == Seq(9.0, 12.0, 15.0))
    assert(evalD(".n_tok % 7") == Seq(5.0, 2.0, 2.0))
    assert(evalS(".v >= 55 && .kind != 'click'") == Seq("true", "false", "true"))
    assert(evalS("!(.source == 'web') || .id == 1") == Seq("true", "true", "false"))
  }

  test("if / string functions / casts") {
    assert(evalS("if(.n_tok >= 1024, 'long', if(.n_tok >= 256, 'mid', 'short'))")
      == Seq("long", "short", "long"))
    assert(evalS("upcase(.kind)") == Seq("ERROR", "CLICK", "SIGNUP"))
    assert(evalS("concat(.kind, '-', .id)") == Seq("error-1", "click-2", "signup-3"))
    assert(evalD("length(.kind)") == Seq(5.0, 5.0, 6.0))
    assert(evalS("starts_with(.kind, 'sign')") == Seq("false", "false", "true"))
    assert(evalD("round(.v, 1)") == Seq(190.5, 10.0, 55.3))
    assert(evalD("to_int(.v)") == Seq(190.0, 10.0, 55.0))
  }

  test("null literal, coalesce, unary minus") {
    assert(evalS("coalesce(null, .kind)") == Seq("error", "click", "signup"))
    assert(evalD("-.id") == Seq(-1.0, -2.0, -3.0))
  }

  test("parse errors are clear") {
    intercept[IllegalArgumentException](VrlExpr.compile(".a +"))
    intercept[IllegalArgumentException](VrlExpr.compile("nope(1)"))
    intercept[IllegalArgumentException](VrlExpr.compile(".a ?? .b"))
  }

  test("compiles into plain codegen'd projections (no UDF)") {
    val out = df.select(VrlExpr.compile("if(.v > 50, concat(.source, '/hot'), .source)").as("x"))
    out.collect()
    assert(!out.queryExecution.executedPlan.toString.toLowerCase.contains("udf"))
  }
}
