package graft.parse

import org.scalatest.funsuite.AnyFunSuite

class GrokSpec extends AnyFunSuite {
  test("compile doc_id pattern") {
    val c = Grok.compile("%{WORD:src_tag}/%{WORD:tenant}/%{INT:shard:int}/%{INT:date_str}/%{INT:seq:int}")
    assert(c.fields.map(_.name) == Seq("src_tag", "tenant", "shard", "date_str", "seq"))
    assert(c.fields.map(_.group) == Seq(1, 2, 3, 4, 5))
    val m = c.extract("web/t42/0003/20260115/000000000017")
    assert(m.contains(Map("src_tag" -> "web", "tenant" -> "t42", "shard" -> "0003",
      "date_str" -> "20260115", "seq" -> "000000000017")))
    assert(c.extract("not a doc id").isEmpty)
    assert(c.extract("web/t42/0003/20260115").isEmpty) // missing segment
  }

  test("literal quoting and unnamed refs") {
    val c = Grok.compile("%{IP:ip} - %{WORD}: code=%{INT:code:int}")
    assert(c.fields.map(_.name) == Seq("ip", "code"))
    val m = c.extract("10.0.0.1 - GET: code=200")
    assert(m.contains(Map("ip" -> "10.0.0.1", "code" -> "200")))
    // literal "code=" must be matched literally (regex-quoted)
    assert(c.extract("10.0.0.1 - GET: codeX200").isEmpty)
  }

  test("unknown pattern rejected") {
    intercept[IllegalArgumentException](Grok.compile("%{NOPE:x}"))
  }

  test("anchoring: partial matches rejected") {
    val c = Grok.compile("%{INT:n:int}")
    assert(c.extract("123").isDefined)
    assert(c.extract("123abc").isEmpty)
    assert(c.extract("abc123").isEmpty)
  }
}
