package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Wave-8 JSON-shape functions against the reference cue examples
  * (tag_types_externally.cue, validate_json_schema.cue,
  * replace_with.cue, is_nullish.cue, to_syslog_facility.cue).
  */
class JsonShapeSpec extends AnyFunSuite with graft.SparkSpec {

  // ---- tag_types_externally ----

  test("tag_types_externally cue examples") {
    // scalar: 123 → {"integer": 123}
    assert(TagTypesExternally.run("123") == "{\"integer\":123}")
    // object example from the cue, nested float
    assert(TagTypesExternally.run(
      """{"message":"Hello world","request":{"duration_ms":67.9}}""") ==
      """{"message":{"string":"Hello world"},"request":{"duration_ms":{"float":67.9}}}""")
    // arrays recurse element-wise; null stays null; bool tagged
    assert(TagTypesExternally.run("""{"a":[1,"x",true,null]}""") ==
      """{"a":[{"integer":1},{"string":"x"},{"boolean":true},null]}""")
    assert(TagTypesExternally.run("{nope") == null)
  }

  // ---- validate_json_schema ----

  private val emailSchema =
    """{"type":"object","required":["productUser"],
      |"properties":{"productUser":{"type":"string","format":"email"}}}""".stripMargin
  private val customFmtSchema =
    """{"properties":{"productUser":{"format":"custom-thing"}}}"""

  test("validate_json_schema cue example quartet") {
    def v(json: String, schema: String, ig: Boolean = false) =
      ValidateJsonSchema.run(json, schema, ig)
    assert(v("""{ "productUser": "valid@email.com" }""", emailSchema) ==
      java.lang.Boolean.TRUE)
    assert(v("""{ "productUser": "invalidEmail" }""", emailSchema) ==
      java.lang.Boolean.FALSE)
    // unknown format: strict fails, ignore_unknown_formats passes
    assert(v("""{ "productUser": "a-custom-formatted-string" }""",
      customFmtSchema) == java.lang.Boolean.FALSE)
    assert(v("""{ "productUser": "a-custom-formatted-string" }""",
      customFmtSchema, ig = true) == java.lang.Boolean.TRUE)
  }

  test("validate_json_schema core keywords") {
    def v(json: String, schema: String) =
      ValidateJsonSchema.run(json, schema, false)
    val s = """{"type":"object","required":["n"],
              |"properties":{"n":{"type":"integer","minimum":0,"maximum":10},
              |"tags":{"type":"array","items":{"type":"string","maxLength":3}},
              |"lvl":{"enum":["lo","hi"]}}}""".stripMargin
    assert(v("""{"n":5}""", s) == java.lang.Boolean.TRUE)
    assert(v("""{"n":11}""", s) == java.lang.Boolean.FALSE)
    assert(v("""{"n":5,"tags":["ab","cde"]}""", s) == java.lang.Boolean.TRUE)
    assert(v("""{"n":5,"tags":["abcd"]}""", s) == java.lang.Boolean.FALSE)
    assert(v("""{"n":5,"lvl":"hi"}""", s) == java.lang.Boolean.TRUE)
    assert(v("""{"n":5,"lvl":"mid"}""", s) == java.lang.Boolean.FALSE)
    assert(v("""{}""", s) == java.lang.Boolean.FALSE) // required
    assert(v("""{"n":"x"}""", s) == java.lang.Boolean.FALSE) // type
    assert(v("{broken", s) == null) // malformed payload → null lane
  }

  // ---- replace_with ----

  private def rw(in: String, re: String, count: Int = -1)(
      fn: (String, Seq[String]) => String): String =
    RegexReplaceWith.run(in, java.util.regex.Pattern.compile(re), fn, count)

  test("replace_with cue examples") {
    // "Capitalize words"
    assert(rw("apples and bananas", "\\b(\\w)(\\w*)") {
      (_, caps) => caps(0).toUpperCase + caps(1)
    } == "Apples And Bananas")
    // "Replace first instance" (count = 1)
    assert(rw("Apples and Apples", "(?i)apples|cones", count = 1) {
      (m, _) => "Pine" + m.toLowerCase
    } == "Pineapples and Apples")
    // non-participating capture group arrives as null, as in VRL
    assert(rw("ab", "(a)(x)?") { (_, caps) =>
      assert(caps(1) == null); caps(0).toUpperCase
    } == "Ab")
    // zero-width matches must not loop forever
    assert(rw("abc", "x*") { (_, _) => "." } == ".a.b.c.")
  }

  // ---- is_nullish / to_syslog_facility / random_bytes via Spark ----

  test("column wrappers: nullish, facility, random_bytes determinism") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(("", 0L), ("-", 4L), (" \n \n ", 23L), ("ok", 24L))
      .toDF("s", "code")
    val out = df.select(
      Vrl.isNullish(col("s")).as("n"),
      Vrl.toSyslogFacilityName(col("code")).as("f"),
      hex(Vrl.randomBytesSeeded(col("code"), 20)).as("r")).collect()
    assert(out.map(_.getBoolean(0)).toSeq == Seq(true, true, true, false))
    assert(out.map(_.getString(1)).toSeq ==
      Seq("kern", "auth", "local7", null))
    // 20 bytes → 40 hex chars, deterministic across evaluations
    assert(out.forall(_.getString(2).length == 40))
    val again = df.select(hex(Vrl.randomBytesSeeded(col("code"), 20))).collect()
    assert(out.map(_.getString(2)).toSeq == again.map(_.getString(0)).toSeq)
  }

  // ---- wave 9: jsonTypeOf / isType / to_regex ----

  test("jsonTypeOf names the VRL type of a JSON-variant value") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cases = Seq(
      "123" -> "integer", "-45" -> "integer", "12.5" -> "float",
      "1e3" -> "float", "\"abc\"" -> "string", "true" -> "boolean",
      "false" -> "boolean", "null" -> "null", "[1,2]" -> "array",
      "{\"a\":1}" -> "object", "{nope" -> null, "\"unterminated" -> null)
    val got = cases.map(_._1).toDF("v")
      .select(col("v"), Vrl.jsonTypeOf(col("v")).as("t"),
        Vrl.isType(col("v"), "integer").as("i"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) == want, s"jsonTypeOf($in)") }
  }

  test("to_regex keeps compiling patterns and nulls the rest (cue fallback shape)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Seq("^foo$", "([", "a+b", "(?<name>x)", "*bad")
      .toDF("p").select(Vrl.toRegex(col("p"))).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(out == Seq("^foo$", null, "a+b", "(?<name>x)", null))
  }
}
