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

  test("apache combined: parse_apache_log.cue reference example") {
    val line = "127.0.0.1 bob frank [10/Oct/2000:13:55:36 -0700] " +
      "\"GET /apache_pb.gif HTTP/1.0\" 200 2326 " +
      "\"http://www.example.com/start.html\" \"Mozilla/5.0 (X11; Linux i686)\""
    val m = Grok.ApacheCombinedGrok.extract(line).get
    assert(m("host") == "127.0.0.1" && m("identity") == "bob" && m("user") == "frank")
    assert(m("method") == "GET" && m("path") == "/apache_pb.gif" &&
      m("protocol") == "HTTP/1.0")
    assert(m("status") == "200" && m("size") == "2326")
    assert(m("referrer") == "http://www.example.com/start.html")
    assert(m("agent") == "Mozilla/5.0 (X11; Linux i686)")
    // common = combined minus the two quoted tails
    val common = line.substring(0, line.indexOf(" \"http://"))
    assert(Grok.ApacheCommonGrok.extract(common).get("status") == "200")
  }

  test("apache error format") {
    val m = Grok.ApacheErrorGrok.extract(
      "[Fri Sep 09 10:42:29.902022 2011] [core:error] [pid 35708:tid 4328636416] " +
        "[client 72.15.99.187:52416] File does not exist: /usr/local/apache2/htdocs/favicon.ico").get
    assert(m("module") == "core" && m("severity") == "error")
    assert(m("pid") == "35708" && m("tid") == "4328636416")
    assert(m("client") == "72.15.99.187" && m("port") == "52416")
    assert(m("message") == "File does not exist: /usr/local/apache2/htdocs/favicon.ico")
    intercept[IllegalArgumentException](
      Grok.parseApacheLog(null, null, "nope"))
  }

  test("aws alb: parse_aws_alb_log.cue reference example") {
    val line = "http 2018-11-30T22:23:00.186641Z app/my-loadbalancer/50dc6c495c0c9188 " +
      "192.168.131.39:2817 - 0.000 0.001 0.000 200 200 34 366 " +
      "\"GET http://www.example.com:80/ HTTP/1.1\" \"curl/7.46.0\" - - " +
      "arn:aws:elasticloadbalancing:us-east-2:123456789012:targetgroup/my-targets/73e2d6bc24d8a067 " +
      "\"Root=1-58337364-23a8c76965a2ef7629b185e3\" \"-\" \"-\" 0 " +
      "2018-11-30T22:22:48.364000Z \"forward\" \"-\" \"-\""
    val m = Grok.AwsAlbGrok.extract(line).get
    assert(m("type") == "http" && m("elb") == "app/my-loadbalancer/50dc6c495c0c9188")
    assert(m("client_host") == "192.168.131.39:2817" && m("target_host") == "-")
    assert(m("request") == "GET http://www.example.com:80/ HTTP/1.1")
    assert(m("user_agent") == "curl/7.46.0")
    assert(m("trace_id") == "Root=1-58337364-23a8c76965a2ef7629b185e3")
    assert(m("received_bytes") == "34" && m("sent_bytes") == "366")
    assert(m("matched_rule_priority") == "0" && m("actions_executed") == "forward")
  }
}
