package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{Vrl => V}

/** Per-category coverage queries for the VRL stdlib surface (SURVEY.md
  * §2.5), each with a DuckDB twin. Inputs are constructed from the events
  * table's own columns (integers only are embedded in strings — double
  * formatting differs across engines) so every function is exercised on
  * 10k+ distinct values, not one literal.
  */
object FunctionQueries {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  // a logfmt line built from integer-safe fields
  private def logfmtLine = V.encodeLogfmt(Seq(
    "ev" -> col("event_type"), "user" -> col("user_id"), "id" -> col("event_id")))
  private val duckLogfmtLine =
    "('ev=' || event_type || ' user=' || user_id || ' id=' || event_id)"

  private def urlCol = concat(lit("https://api.example.com:8443/v1/"), col("event_type"),
    lit("?user="), col("user_id"), lit("&page="), pmod(col("event_id"), lit(7)))
  private val duckUrl =
    "('https://api.example.com:8443/v1/' || event_type || '?user=' || user_id || '&page=' || (event_id % 7))"

  private def ipCol = concat_ws(".",
    lit(10), pmod(col("user_id"), lit(256)), pmod(col("event_id"), lit(256)), lit(7))
  private val duckIp = "('10.' || (user_id % 256) || '.' || (event_id % 256) || '.7')"

  // Apache common-log line built from integer-safe fields (for the
  // parse_common_log / parse_nginx_log named wrappers)
  private def clfLine = concat(
    ipCol, lit(" - u"), col("user_id"), lit(" ["),
    date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000] \""),
    element_at(array(lit("GET"), lit("POST"), lit("PUT")),
      (pmod(col("event_id"), lit(3)) + 1).cast("int")),
    lit(" /api/"), col("event_type"), lit(" HTTP/1.1\" "),
    lit(200) + pmod(col("event_id"), lit(4)) * 100, lit(" "),
    pmod(col("user_id"), lit(10000)))
  private val duckClf =
    s"""($duckIp || ' - u' || user_id || ' [' ||
       | strftime(ts, '%d/%b/%Y:%H:%M:%S') || ' +0000] "' ||
       | (CASE (event_id % 3) WHEN 0 THEN 'GET' WHEN 1 THEN 'POST' ELSE 'PUT' END) ||
       | ' /api/' || event_type || ' HTTP/1.1" ' ||
       | (200 + (event_id % 4) * 100) || ' ' || (user_id % 10000))""".stripMargin

  // fixed browser population for parse_user_agent (picked by event_id % 7)
  private val UAs = Seq(
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 16_5 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.5 Mobile/15E148 Safari/604.1",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
    "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
    "curl/8.4.0",
    "Mozilla/5.0 (Linux; Android 13; Pixel 7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.6045.163 Mobile Safari/537.36")
  private def uaCol = element_at(array(UAs.map(lit): _*),
    (pmod(col("event_id"), lit(7)) + 1).cast("int"))
  /** Expected-value CASE over the fixed population (independent oracle). */
  private def duckUaCase(vals: Seq[String]): String =
    "(CASE (event_id % 7) " + vals.zipWithIndex.map { case (v, i) =>
      s"WHEN $i THEN " + (if (v == null) "NULL" else s"'$v'")
    }.mkString(" ") + " END)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- parse_key_value / parse_logfmt + encode_logfmt round trip ----
    "f_parse_kv" -> ((s, dir) => {
      val m = V.parseKeyValue(logfmtLine)
      ev(s, dir).select(col("event_id"),
        logfmtLine.as("line"),
        element_at(m, "ev").as("kv_ev"),
        element_at(m, "user").cast("long").as("kv_user"))
    }),

    // ---- parse_url family ----
    "f_parse_url" -> ((s, dir) => {
      ev(s, dir).select(col("event_id"),
        V.urlScheme(urlCol).as("scheme"),
        V.urlHost(urlCol).as("host"),
        V.urlPort(urlCol).as("port"),
        V.urlPath(urlCol).as("path"),
        V.urlQueryParam(urlCol, "page").cast("int").as("q_page"))
    }),

    // ---- parse_csv + encode_csv round trip ----
    "f_parse_csv" -> ((s, dir) => {
      val line = V.encodeCsv(Seq(col("event_id"), col("event_type"), pmod(col("user_id"), lit(97))))
      val f = V.parseCsv(line)
      ev(s, dir).select(col("event_id"),
        f.getItem(1).as("c1"), f.getItem(2).cast("long").as("c2"))
    }),

    // ---- parse_timestamp / parse_duration / unix round trips ----
    "f_parse_time" -> ((s, dir) => {
      val fmtd = date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")
      ev(s, dir).select(col("event_id"),
        V.parseTimestamp(fmtd, "yyyy-MM-dd HH:mm:ss").as("ts_rt"),
        V.toUnix(col("ts")).as("epoch_s"),
        V.fromUnix(V.toUnix(col("ts"))).as("ts_unix_rt"),
        V.parseDurationSecs(concat(pmod(col("event_id"), lit(500)),
          element_at(array(lit("ms"), lit("s"), lit("m"), lit("h")),
            (pmod(col("event_id"), lit(4)) + 1).cast("int")))).as("dur_s"))
    }),

    // ---- string family ----
    "f_string_ops" -> ((s, dir) => {
      val t = col("event_type")
      ev(s, dir).select(col("event_id"),
        V.upcase(t).as("up"), V.strlen(t).cast("long").as("len"),
        V.truncate(t, 3).as("trunc3"),
        V.replaceAll(t, "[aeiou]", "_").as("devoweled"),
        V.sieve(concat(t, lit("!#"), col("user_id")), "a-z0-9").as("sieved"),
        V.redact(concat(lit("user="), col("user_id")), "\\d+").as("redacted"),
        V.matchRe(t, "^(error|signup)$").as("is_alert"),
        V.snakecase(concat(t, lit(" case"))).as("snake"),
        V.camelcase(concat(t, lit("_case_x"))).as("camel"),
        levenshtein(t, lit("error")).cast("long").as("lev_err"))
    }),

    // ---- codec / hash family ----
    "f_codec" -> ((s, dir) => {
      val t = col("event_type")
      ev(s, dir).select(col("event_id"),
        V.encodeBase64(t).as("b64"),
        (V.decodeBase64(V.encodeBase64(t)) === t).as("b64_rt"),
        V.encodeBase16(t).as("hexs"),
        V.md5Hex(t).as("md5s"),
        V.sha256Hex(t).as("sha256s"))
    }),

    // ---- number / math family ----
    "f_number" -> ((s, dir) => {
      val v = col("value")
      ev(s, dir).select(col("event_id"),
        abs(v - 100).as("abs_v"), ceil(v).as("ceil_v"), floor(v).as("floor_v"),
        round(v, 1).as("round_v"),
        V.mod(col("event_id"), lit(13)).as("mod_v"),
        round(V.haversineKm(
          pmod(col("user_id"), lit(180)) - 90, pmod(col("event_id"), lit(360)) - 180,
          lit(48.8566), lit(2.3522)), 4).as("hav_km"))
    }),

    // ---- IP family ----
    "f_ip" -> ((s, dir) => {
      ev(s, dir).select(col("event_id"),
        ipCol.as("ip"),
        V.ipAton(ipCol).as("ip_n"),
        (V.ipNtoa(V.ipAton(ipCol)) === ipCol).as("ntoa_rt"),
        V.ipCidrContains(lit("10.0.0.0"), 8, ipCol).as("in_10slash8"),
        V.ipCidrContains(lit("10.42.0.0"), 16, ipCol).as("in_10_42slash16"))
    }),

    // ---- syslog helpers ----
    "f_syslog" -> ((s, dir) => {
      val pri = pmod(col("event_id"), lit(192)).cast("int")
      ev(s, dir).select(col("event_id"),
        V.toSyslogLevel(pri % 8).as("level"),
        V.toSyslogSeverity(V.toSyslogLevel(pri % 8)).cast("int").as("sev_rt"),
        V.syslogFacility(pri).as("facility"))
    }),

    // ---- grok parse of an apache-common-log-style line (parse_apache_log /
    //      parse_common_log family) via the native single-pass expression ----
    "f_parse_grok_log" -> ((s, dir) => {
      val line = concat(
        lit("10."), pmod(col("user_id"), lit(256)), lit(".0.7 - "),
        upper(substring(col("event_type"), 1, 3)), lit(" /"), col("event_type"),
        lit("/"), pmod(col("event_id"), lit(100)),
        lit(" "), element_at(array(lit(200), lit(404), lit(500)),
          (pmod(col("event_id"), lit(3)) + 1).cast("int")),
        lit(" "), pmod(col("event_id"), lit(4096)))
      val pat = graft.parse.Grok.compile(
        "%{IP:clientip} - %{WORD:verb} %{NOTSPACE:path} %{INT:status:int} %{INT:bytes:int}")
      graft.parse.Grok.parse(ev(s, dir).withColumn("_line", line), col("_line"), pat)
        .select(col("event_id"), col("_parse_ok").as("parse_ok"),
          col("clientip"), col("verb"), col("path"), col("status"), col("bytes"))
    }),

    // ---- percent-encoding codec + uuid format (encode/decode_percent,
    //      uuid_v4 — format-checked, value is random by design) ----
    "f_url_codec" -> ((s, dir) => {
      val raw = concat(col("event_type"), lit(" "), col("user_id"),
        lit("&x="), pmod(col("event_id"), lit(50)))
      ev(s, dir).select(col("event_id"),
        url_encode(raw).as("enc"),
        (url_decode(url_encode(raw)) === raw).as("dec_rt"),
        expr("uuid()").rlike(
          "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$")
          .as("uuid_ok"))
    }),

    // ---- array chunks (VRL chunks) + ip_subnet / is_ipv4 ----
    "f_chunks_ip" -> ((s, dir) => {
      val arr = split(concat_ws(",", col("event_type"), col("user_id"),
        col("event_id"), lit("a"), lit("b")), ",", -1)
      val chunkSize = 2
      val nChunks = ceil(size(arr).cast("double") / chunkSize).cast("int")
      val chunks = transform(sequence(lit(0), nChunks - 1),
        i => slice(arr, i * chunkSize + 1, lit(chunkSize)))
      ev(s, dir).select(col("event_id"),
        size(chunks).cast("long").as("n_chunks"),
        array_join(element_at(chunks, 1), "|").as("chunk1"),
        ipCol.rlike("^(\\d{1,3}\\.){3}\\d{1,3}$").as("is_ipv4"),
        V.ipNtoa(V.ipAton(ipCol).bitwiseAND(lit(0xFFFF0000L))).as("subnet16"))
    }),

    // ---- syslog RFC3164 line parse via grok (parse_syslog family) ----
    "f_parse_syslog" -> ((s, dir) => {
      val line = concat(
        lit("<"), pmod(col("event_id"), lit(192)), lit(">Jan "),
        (pmod(col("user_id"), lit(19)) + 10), lit(" 12:00:"),
        lpad(pmod(col("event_id"), lit(60)).cast("string"), 2, "0"),
        lit(" h"), pmod(col("user_id"), lit(50)), lit(" "), col("event_type"),
        lit("["), pmod(col("event_id"), lit(30000)), lit("]: login from 10.0.0."),
        pmod(col("event_id"), lit(256)))
      val pat = graft.parse.Grok.compile(
        "<%{POSINT:pri:int}>%{SYSLOGTIMESTAMP:ts_txt} %{HOSTNAME:host} %{PROG:prog}[%{POSINT:pid:int}]: %{GREEDYDATA:msg}")
      graft.parse.Grok.parse(ev(s, dir).withColumn("_line", line), col("_line"), pat)
        .select(col("event_id"), col("_parse_ok").as("parse_ok"),
          col("pri"), col("ts_txt"), col("host"), col("prog"), col("pid"), col("msg"))
    }),

    // ---- shannon_entropy ----
    "f_entropy" -> ((s, dir) => {
      ev(s, dir).select(col("event_id"),
        round(V.shannonEntropy(col("event_type")), 6).as("ent"))
    }),

    // ---- parse_xml subset via XPath ----
    "f_parse_xml" -> ((s, dir) => {
      val xml = concat(lit("<e id=\""), pmod(col("event_id"), lit(100)),
        lit("\"><k>"), col("event_type"), lit("</k><v>"),
        pmod(col("user_id"), lit(977)), lit("</v></e>"))
      ev(s, dir).select(col("event_id"),
        V.xpathStr(xml, "e/k/text()").as("xk"),
        V.xpathLong(xml, "e/v/text()").as("xv"),
        V.xpathStr(xml, "e/@id").cast("long").as("xid"))
    }),

    // ---- encode_cef ----
    "f_encode_cef" -> ((s, dir) => {
      ev(s, dir).select(col("event_id"),
        V.encodeCef("graft", "pipeline", "1.0",
          signature = pmod(col("event_id"), lit(1000)).cast("string"),
          name = col("event_type"), severity = pmod(col("user_id"), lit(10)),
          ext = Seq("user" -> col("user_id"), "val" -> pmod(col("event_id"), lit(50))))
          .as("cef"))
    }),

    // ---- map functions (VRL map_keys/map_values/merge over parsed kv) ----
    "f_maps" -> ((s, dir) => {
      val m = V.parseKeyValue(logfmtLine)
      ev(s, dir).select(col("event_id"),
        element_at(transform_keys(m, (k, _) => upper(k)), "EV").as("mk_up"),
        element_at(transform_values(m, (_, v) => concat(v, lit("!"))), "ev").as("mv_bang"),
        element_at(map_concat(m, map(lit("extra"), lit("z"))), "extra").as("merged"),
        size(map_keys(m)).cast("long").as("n_keys"),
        array_join(array_sort(map_keys(m)), ",").as("keys_sorted"),
        size(flatten(array(split(col("event_type"), "i", -1), array(lit("x"))))).cast("long")
          .as("flat_n"),
        aggregate(zip_with(array(lit(1), lit(2), lit(3)),
          array(pmod(col("event_id"), lit(5)), lit(0), lit(1)),
          (x, y) => x * y), lit(0L), (a, x) => a + x).as("zip_dot"))
    }),

    // ---- collections (higher-order fns over split arrays) ----
    "f_collections" -> ((s, dir) => {
      val arr = split(concat_ws(" ", col("event_type"), col("event_type"), lit("x"),
        pmod(col("user_id"), lit(5))), " ", -1)
      ev(s, dir).select(col("event_id"),
        size(arr).cast("long").as("n"),
        size(array_distinct(arr)).cast("long").as("n_uniq"),
        array_contains(arr, "x").as("has_x"),
        aggregate(arr, lit(0L), (acc, t) => acc + length(t)).as("total_len"),
        array_join(reverse(arr), "|").as("rev_joined"))
    }),

    // ---- parse_common_log (named grok wrapper) ----
    "f_parse_clf" -> ((s, dir) => {
      graft.parse.Grok.parseCommonLog(ev(s, dir).withColumn("line", clfLine), col("line"))
        .filter(col("_parse_ok"))
        .select(col("event_id"), col("client"), col("auth"), col("ts_str"),
          col("method"), col("path"), col("status"), col("bytes"))
    }),

    // ---- parse_nginx_log (combined format: CLF + referrer + agent) ----
    "f_parse_nginx" -> ((s, dir) => {
      val line = concat(clfLine, lit(" \"https://ref.example.com/"), col("event_type"),
        lit("\" \""), uaCol, lit("\""))
      graft.parse.Grok.parseNginxLog(ev(s, dir).withColumn("line", line), col("line"))
        .filter(col("_parse_ok"))
        .select(col("event_id"), col("client"), col("method"), col("status"),
          col("referrer"), col("agent"))
    }),

    // ---- parse_user_agent (regex-heuristic family) ----
    "f_user_agent" -> ((s, dir) => {
      ev(s, dir).select(col("event_id"),
        V.uaBrowserFamily(uaCol).as("browser"),
        V.uaBrowserVersion(uaCol).as("browser_version"),
        V.uaOsFamily(uaCol).as("os"),
        V.uaDeviceCategory(uaCol).as("device"))
    }),

    // ---- parse_cef (decode side; encode_cef builds the line) ----
    "f_parse_cef" -> ((s, dir) => {
      val cef = V.encodeCef("graft", "engine", "1.0",
        concat(lit("sig-"), pmod(col("event_id"), lit(5))), col("event_type"),
        pmod(col("event_id"), lit(10)),
        Seq("user" -> col("user_id"), "id" -> col("event_id")))
      ev(s, dir).select(col("event_id"),
        V.cefVendor(cef).as("vendor"),
        V.cefProduct(cef).as("product"),
        V.cefDeviceVersion(cef).as("dev_version"),
        V.cefSignature(cef).as("sig"),
        V.cefName(cef).as("name"),
        V.cefSeverity(cef).as("severity"),
        element_at(V.cefExtension(cef), "user").cast("long").as("ext_user"),
        element_at(V.cefExtension(cef), "id").cast("long").as("ext_id"))
    }),

    // ---- format family: format_timestamp, unix ms, format_number,
    //      strip_ansi_escape_codes, parse_query_string, parse_int radix ----
    "f_format" -> ((s, dir) => {
      val qs = concat(lit("a="), col("user_id"), lit("&b="), col("event_type"))
      ev(s, dir).select(col("event_id"),
        V.formatTimestamp(col("ts"), "yyyy/MM/dd HH").as("fmt_ts"),
        V.toUnixMs(col("ts").cast("timestamp")).as("ts_ms"), // events.ts is NTZ
        format_number(col("event_id"), 0).as("fmt_n"),
        V.stripAnsi(concat(lit("\u001b[31m"), col("event_type"),
          lit("\u001b[0m plain"))).as("no_ansi"),
        element_at(V.parseQueryString(qs), "b").as("qs_b"),
        V.parseBin(bin(pmod(col("event_id"), lit(1024)))).as("bin_rt"),
        V.parseOct(conv(pmod(col("event_id"), lit(1024)), 10, 8)).as("oct_rt"))
    }),

    // ---- parse_glog (Google log format; glog grok patterns) ----
    "f_parse_glog" -> ((s, dir) => {
      val line = concat(
        element_at(array(lit("I"), lit("W"), lit("E"), lit("F")),
          (pmod(col("event_id"), lit(4)) + 1).cast("int")),
        date_format(col("ts"), "MMdd"), lit(" "),
        date_format(col("ts"), "HH:mm:ss.SSSSSS"), lit(" "),
        pmod(col("user_id"), lit(10000)), lit(" srv.cc:"),
        pmod(col("event_id"), lit(1000)), lit("] op "), col("event_type"))
      graft.parse.Grok.parse(ev(s, dir).withColumn("line", line), col("line"),
        graft.parse.Grok.compile(
          "%{GLOGLEVEL:level}%{GLOGDATE:mmdd} %{NOTSPACE:time} " +
            "%{POSINT:tid:int} %{NOTSPACE:srcfile}:%{POSINT:lineno:int}] %{GREEDYDATA:msg}"))
        .filter(col("_parse_ok"))
        .select(col("event_id"), col("level"), col("mmdd"), col("time"),
          col("tid"), col("srcfile"), col("lineno"), col("msg"))
    }),

    // ---- parse_etld / eTLD+1 over the embedded public-suffix subset ----
    "f_etld" -> ((s, dir) => {
      val picks = Seq("example.com", "example.co.uk", "test.github.io",
        "foo.org.uk", "bar.com.au", "baz.net")
      val host = concat(lit("h"), pmod(col("user_id"), lit(50)), lit("."),
        element_at(array(picks.map(lit): _*), (pmod(col("event_id"), lit(6)) + 1).cast("int")))
      ev(s, dir).select(col("event_id"), host.as("host"),
        V.parseEtld(host).as("etld"),
        V.parseEtldPlusOne(host).as("etld1"))
    }),

    // ---- encrypt / decrypt (aes builtins) + sha3 (native expression) ----
    // AES proves itself by roundtrip (DuckDB has no AES); sha3 by
    // known-answer: the oracle's expected hex digests are generated at
    // query-build time from the same JVM MessageDigest the expression calls.
    "f_crypto" -> ((s, dir) => {
      val msg = concat(lit("msg-"), col("event_id"))
      val enc = V.encryptAes(msg, CryptoKey)
      val word = element_at(array(Sha3Words.map(lit): _*),
        (pmod(col("event_id"), lit(Sha3Words.length)) + 1).cast("int"))
      ev(s, dir).select(col("event_id"),
        V.decryptAes(enc, CryptoKey).as("roundtrip"),
        (V.decryptAes(enc, CryptoKey) === msg).as("aes_ok"),
        V.sha3Hex(word, 256).as("sha3_256"),
        V.sha3Hex(word, 512).as("sha3_512"))
    }),

    // ---- parse_aws_vpc_flow_log (v2 default format, grok-compiled) ----
    "f_parse_vpcflow" -> ((s, dir) => {
      val line = concat_ws(" ",
        lit("2"), lit("123456789012"),
        concat(lit("eni-"), pmod(col("event_id"), lit(99))),
        concat(lit("10.0."), pmod(col("user_id"), lit(5)), lit(".4")),
        lit("10.0.1.5"),
        pmod(col("event_id"), lit(65535)),
        lit("443"), lit("6"),
        pmod(col("event_id"), lit(100)) + 1,
        (pmod(col("event_id"), lit(100)) + 1) * 40,
        lit("1600000000"), lit("1600000060"),
        when(pmod(col("event_id"), lit(4)) === 0, "REJECT").otherwise("ACCEPT"),
        lit("OK"))
      graft.parse.Grok.parseAwsVpcFlowLog(
        ev(s, dir).withColumn("line", line), col("line"))
        .filter(col("_parse_ok"))
        .select(col("event_id"), col("interface_id"), col("srcaddr"),
          col("srcport"), col("packets"), col("bytes"), col("action"))
    }),

    // ---- parse_linux_authorization (auth.log lines, grok-compiled) ----
    "f_parse_auth" -> ((s, dir) => {
      val line = concat(
        lit("Feb  3 07:"), lpad(pmod(col("event_id"), lit(60)).cast("string"), 2, "0"),
        lit(":"), lpad(pmod(col("user_id"), lit(60)).cast("string"), 2, "0"),
        lit(" host-"), pmod(col("user_id"), lit(10)),
        lit(" sshd["), pmod(col("event_id"), lit(9000)) + 1000,
        lit("]: Failed password for user"), pmod(col("user_id"), lit(50)),
        lit(" from 10.1.2.3 port 22 ssh2"))
      graft.parse.Grok.parseLinuxAuthorization(
        ev(s, dir).withColumn("line", line), col("line"))
        .filter(col("_parse_ok"))
        .select(col("event_id"), col("ts_str"), col("host"), col("appname"),
          col("pid"), col("message"))
    }),

    // ---- parse_bytes ("1.5MiB" → byte count; binary + decimal units) ----
    "f_parse_bytes" -> ((s, dir) => {
      val sel = element_at(array(ByteInputs.map(p => lit(p._1)): _*),
        (pmod(col("event_id"), lit(ByteInputs.length)) + 1).cast("int"))
      ev(s, dir).select(col("event_id"), sel.as("raw"),
        V.parseBytes(sel).as("n_bytes"))
    }),

    // ---- encode/decode gzip + zlib (native Deflater expressions) ----
    // roundtrip oracle: DuckDB has no gzip, but decode(encode(x)) == x and
    // compression shrinking a repetitive payload are engine-checkable facts
    "f_compress" -> ((s, dir) => {
      val msg = repeat(concat(col("event_type"), lit(" ")), 50)
      val gz = V.encodeGzip(msg)
      val zl = V.encodeZlib(msg)
      ev(s, dir).select(col("event_id"),
        substring(V.decodeGzip(gz), 1, 20).as("gz_head"),
        (V.decodeGzip(gz) === msg).as("gz_ok"),
        (V.decodeZlib(zl) === msg).as("zl_ok"),
        (length(gz) < length(msg)).as("gz_smaller"),
        (length(zl) < length(gz)).as("zl_tighter"),
        (V.decodeZstd(V.encodeZstd(msg)) === msg).as("zstd_ok"),
        (V.decodeSnappy(V.encodeSnappy(msg)) === msg).as("snappy_ok"),
        (V.decodeLz4(V.encodeLz4(msg)) === msg).as("lz4_ok"),
        (length(V.encodeZstd(msg)) < length(msg)).as("zstd_smaller"),
        // fallible decode: corrupt payload → NULL, not a task failure
        V.decodeGzip(msg.cast("binary")).isNull.as("corrupt_gz_null"),
        V.decodeZstd(msg.cast("binary")).isNull.as("corrupt_zstd_null"))
    }),

    // ---- avro binary codec (lib/codecs/src/decoding/format/avro.rs) over
    //      the classpath avro-1.12 core: encode→decode roundtrip is the
    //      oracle-checkable identity; corrupt datums decode to NULL ----
    "f_avro" -> ((s, dir) => {
      val enc = V.encodeAvro(
        struct(col("event_id"), col("event_type"), col("value")), AvroEvSchema)
      val dec = V.decodeAvro(enc, AvroEvSchema)
      ev(s, dir).select(col("event_id"),
        dec.getField("event_type").as("a_type"),
        dec.getField("value").as("a_value"),
        (length(enc) > lit(0)).as("nonempty"),
        V.decodeAvro(lit("x".getBytes("UTF-8")), AvroEvSchema).isNull.as("corrupt_null"))
    }),

    // ---- wave-4 VRL long tail: parse_tokens, strip_ansi_escape_codes,
    //      seeded uuid_v4/v7, ip_to_ipv6/ipv6_to_ipv4 ----
    "f_vrl_wave4" -> ((s, dir) => {
      val line = concat(lit("GET /api ["), col("event_type"), lit("] \"agent "),
        col("user_id"), lit("\" done"))
      val ip4 = concat(lit("10."), (col("user_id") % 200).cast("string"),
        lit(".0."), (col("event_id") % 250).cast("string"))
      ev(s, dir).select(col("event_id"),
        array_join(V.parseTokens(line), "|").as("tokens"),
        V.uuidV4Seeded(col("event_id")).as("uuid4"),
        V.uuidV7Seeded(col("ts"), col("event_id")).as("uuid7"),
        V.ipToIpv6(ip4).as("v6"),
        V.ipv6ToIpv4(V.ipToIpv6(ip4)).as("v4_back"),
        V.ipv6ToIpv4(lit("2001:db8::1")).as("not_mapped"))
    }),

    // ---- wave-5: parse_ruby_hash + parse_influxdb line protocol ----
    "f_parse_wave5" -> ((s, dir) => {
      val ruby = concat(lit("{\"ev\" => \""), col("event_type"),
        lit("\", \"n\" => "), col("user_id"), lit("}"))
      val influx = concat(lit("cpu,host=h"), (col("user_id") % 5).cast("string"),
        lit(",region=eu usage="), col("value"), lit(",idle=0.25 "),
        (col("event_id") * 1000000L + 100L).cast("string"))
      ev(s, dir).select(col("event_id"),
        get_json_object(V.rubyHashToJson(ruby), "$.ev").as("rb_ev"),
        get_json_object(V.rubyHashToJson(ruby), "$.n").cast("long").as("rb_n"),
        V.parseInfluxMeasurement(influx).as("ix_m"),
        element_at(V.parseInfluxTags(influx), "host").as("ix_host"),
        element_at(V.parseInfluxFields(influx), "usage").cast("double").as("ix_usage"),
        V.parseInfluxTimestamp(influx).as("ix_ts"))
    }),

    // ---- wave-6: parse_apache_log (combined + error), parse_aws_alb_log,
    //      parse_regex_all, pascalcase / screamingsnakecase,
    //      parse_aws_cloudwatch_log_subscription_message ----
    "f_parse_wave6" -> ((s, dir) => {
      import graft.parse.Grok
      val e = ev(s, dir)
      val stat = (lit(200) + (col("event_id") % 4) * 100).cast("long")
      val sz = (col("event_id") % 5000).cast("long")
      val apache = concat(
        lit("10."), col("user_id") % 200, lit(".0."), col("event_id") % 250,
        lit(" - user"), col("user_id"),
        lit(" [10/Oct/2000:13:55:36 -0700] \"GET /page/"),
        col("event_id") % 50, lit(" HTTP/1.1\" "), stat, lit(" "), sz,
        lit(" \"http://ref.example/"), col("user_id") % 7,
        lit("\" \"agent-"), col("user_id") % 9, lit("\""))
      val alb = concat(
        lit("http 2018-11-30T22:23:00.186641Z app/lb/1 192.168."),
        col("user_id") % 200, lit("."), col("event_id") % 250,
        lit(":2817 - 0.000 0.001 0.000 "), stat, lit(" "), stat, lit(" "),
        col("event_id") % 900 + 34, lit(" "), col("event_id") % 4000 + 366,
        lit(" \"GET http://www.example.com:80/p"), col("event_id") % 10,
        lit(" HTTP/1.1\" \"curl/7.46.0\" - - arn:tg \"Root=1-"), col("event_id"),
        lit("\" \"-\" \"-\" 0 2018-11-30T22:22:48.364000Z \"forward\" \"-\" \"-\""))
      val errLine = concat(
        lit("[Fri Sep 09 10:42:29.902022 2011] [core:error] [pid "),
        col("user_id"), lit(":tid "), col("event_id") % 100000,
        lit("] [client 72.15.99."), col("event_id") % 200, lit(":"),
        col("event_id") % 30000 + 1024, lit("] File does not exist: /x/"),
        col("event_id") % 10)
      val keep = Seq("event_id", "user_id", "event_type", "_apache", "_alb", "_err")
      val base = e.select(col("event_id"), col("user_id"), col("event_type"),
        apache.as("_apache"), alb.as("_alb"), errLine.as("_err"))
      val withAp = Grok.parseApacheLog(base, col("_apache"))
        .select(keep.map(col) ++ Seq(
          col("host").as("ap_host"), col("user").as("ap_user"),
          col("method").as("ap_method"), col("path").as("ap_path"),
          col("status").as("ap_status"), col("size").as("ap_size"),
          col("referrer").as("ap_ref"), col("agent").as("ap_agent")): _*)
      val apCols = Seq("ap_host", "ap_user", "ap_method", "ap_path",
        "ap_status", "ap_size", "ap_ref", "ap_agent")
      val withAlb = Grok.parseAwsAlbLog(withAp, col("_alb"))
        .select((keep ++ apCols).map(col) ++ Seq(
          col("type").as("alb_type"), col("elb_status_code").as("alb_status"),
          col("received_bytes").as("alb_rb"),
          col("request_method").as("alb_method"),
          col("request_url").as("alb_url"), col("user_agent").as("alb_agent"),
          col("target_host").isNull.as("alb_target_null"),
          col("request_processing_time").as("alb_rpt")): _*)
      val albCols = Seq("alb_type", "alb_status", "alb_rb", "alb_method",
        "alb_url", "alb_agent", "alb_target_null", "alb_rpt")
      val cw = V.parseCloudwatchSubscription(concat(
        lit("{\"messageType\":\"DATA_MESSAGE\",\"owner\":\"123\",\"logGroup\":\"g"),
        col("user_id") % 5,
        lit("\",\"logStream\":\"s\",\"subscriptionFilters\":[\"f\"],\"logEvents\":[{\"id\":\""),
        col("event_id"), lit("\",\"timestamp\":"), col("event_id") * 1000,
        lit(",\"message\":\"m"), col("event_id"), lit("\"}]}")))
      val ev1 = element_at(cw.getField("logEvents"), 1)
      Grok.parseApacheLog(withAlb, col("_err"), "error")
        .select((Seq("event_id") ++ apCols ++ albCols).map(col) ++ Seq(
          col("module").as("er_module"), col("severity").as("er_sev"),
          col("pid").as("er_pid"), col("client").as("er_client"),
          col("message").as("er_msg"),
          V.pascalcase(concat(col("event_type"), lit("_main_page"))).as("pascal"),
          V.screamingsnakecase(concat(col("event_type"), lit("-main page"))).as("scream"),
          array_join(V.parseRegexAll(col("_apache"), "\\d+"), ",").as("all_nums"),
          cw.getField("logGroup").as("cw_group"),
          ev1.getField("message").as("cw_msg"),
          ev1.getField("timestamp").as("cw_ts"),
          size(cw.getField("logEvents")).cast("long").as("cw_n")): _*)
    }),

    // ---- wave-6 codecs: seahash, decode_mime_q, encode/decode_charset,
    //      encrypt_ip/decrypt_ip (ipcrypt aes128 + pfx) ----
    "f_codec_wave6" -> ((s, dir) => {
      val t = col("event_type")
      val dynIp = concat(lit("10."), col("user_id") % 200, lit("."),
        col("event_id") % 250, lit(".7"))
      val mime = element_at(array(MimeInputs.map(lit): _*),
        (pmod(col("event_id"), lit(MimeInputs.length)) + 1).cast("int"))
      val ipPick = element_at(array(CryptIps.map(lit): _*),
        (pmod(col("event_id"), lit(CryptIps.length)) + 1).cast("int"))
      ev(s, dir).select(col("event_id"),
        V.seahash(t).as("sea_t"),
        V.seahash(concat(lit("u"), col("user_id") % 7)).as("sea_u"),
        V.decodeMimeQ(mime).as("mime_dec"),
        (V.decodeCharset(V.encodeCharset(t, "euc-kr"), "euc-kr") === t).as("cs_rt"),
        (base64(V.encodeCharset(lit("안녕하세요"), "euc-kr"))
          === lit("vsiz58fPvLy/5A==")).as("cs_vec"),
        V.encryptIp(ipPick, CryptoKey, "aes128").as("ip_enc"),
        (V.decryptIp(V.encryptIp(dynIp, CryptoKey), CryptoKey) === dynIp).as("ip_rt"),
        (V.decryptIp(V.encryptIp(dynIp, PfxKey, "pfx"), PfxKey, "pfx") === dynIp).as("ip_rt_pfx"))
    }),

    // ---- encode_punycode / decode_punycode (native IDN expression) ----
    "f_punycode" -> ((s, dir) => {
      val dom = element_at(array(PunyDomains.map(lit): _*),
        (pmod(col("event_id"), lit(PunyDomains.length)) + 1).cast("int"))
      ev(s, dir).select(col("event_id"),
        V.encodePunycode(dom).as("ascii"),
        V.decodePunycode(V.encodePunycode(dom)).as("unicode_back"))
    }),

    // ---- wave-7 VRL long tail: path fns, predicates, format_int,
    //      encode_key_value, ip_pton/ntop, seeded random_* ----
    "f_vrl_wave7" -> ((s, dir) => {
      val path = concat(lit("/var/log/app"), col("user_id") % 5,
        lit("/part"), col("event_id") % 3, lit("/file"), col("event_id") % 7,
        lit(".log"))
      val rel = concat(lit("data/"), col("event_type"), lit(".json"))
      val ip4 = concat(lit("10."), (col("user_id") % 200).cast("string"),
        lit(".0."), (col("event_id") % 250).cast("string"))
      val n = (col("event_id") % 7919) * when(col("event_id") % 2 === 0, -1).otherwise(1)
      ev(s, dir).select(col("event_id"),
        V.basenameP(path).as("base"),
        V.dirnameP(path).as("dir"),
        V.basenameP(rel).as("rel_base"),
        V.dirnameP(rel).as("rel_dir"),
        array_join(V.splitPath(path), "|").as("parts"),
        V.containsAll(path, Seq("/var", ".log")).as("has_all"),
        V.matchAny(col("event_type"), Seq("^cl", "^pu")).as("m_any"),
        V.matchArraySome(split(path, "/"), "^file").as("m_some"),
        V.formatInt(n, 16).as("hex16"),
        V.formatInt(n, 2).as("bin2"),
        V.parseIntRadix(V.formatInt(col("event_id"), 16), 16).as("rt_int"),
        V.parseFloat(concat((col("event_id") % 100).cast("string"), lit(".25")))
          .as("pf"),
        V.toBoolV(element_at(array(lit("true"), lit("NO"), lit("1"), lit("wat")),
          (pmod(col("event_id"), lit(4)) + 1).cast("int"))).as("tb"),
        V.decodeBase16(V.encodeBase16(col("event_type"))).as("b16_rt"),
        V.encodeKeyValue(Seq("ts" -> col("event_id"), "lvl" -> col("event_type"),
          "msg" -> concat(lit("user "), col("user_id")))).as("kv"),
        V.ipNtop(V.ipPton(ip4)).as("ip_rt"),
        V.ipNtop(V.ipPton(lit("2001:db8::7"))).as("ip6_rt"),
        V.isIpv6(lit("2001:db8::7")).as("is6"),
        V.isIpv6(ip4).as("is6_v4"),
        V.randomBoolSeeded(col("event_id")).as("rb"),
        V.randomIntSeeded(col("event_id"), 10, 20).as("ri"),
        round(V.randomFloatSeeded(col("event_id"), 0.0, 1.0), 6).as("rf"))
    }),

    // ---- parse_cbor roundtrip (RFC 8949 from scratch) + unflatten +
    //      uuid_from_friendly_id + is_json ----
    "f_cbor" -> ((s, dir) => {
      val doc = to_json(struct(col("event_id").as("id"),
        col("event_type").as("ty"), col("value").as("v"),
        struct((col("user_id") % 50).as("u")).as("nest")))
      val dec = V.parseCbor(V.encodeCbor(doc))
      val flatJson = concat(lit("{\"a.b\":"), col("user_id"),
        lit(",\"a.c\":\""), col("event_type"), lit("\",\"top\":1}"))
      val fid = element_at(array(FriendlyIds.map(p => lit(p._1)): _*),
        (pmod(col("event_id"), lit(FriendlyIds.length)) + 1).cast("int"))
      ev(s, dir).select(col("event_id"),
        get_json_object(dec, "$.ty").as("c_ty"),
        get_json_object(dec, "$.v").cast("double").as("c_v"),
        get_json_object(dec, "$.nest.u").cast("long").as("c_u"),
        // cue example: a1 65 "field" 65 "value" → {"field":"value"}
        V.parseCbor(unhex(lit("a1656669656c646576616c7565"))).as("c_cue"),
        V.parseCbor(unhex(lit("ff"))).isNull.as("c_bad"),
        V.unflattenJson(flatJson).as("unflat"),
        V.uuidFromFriendlyId(fid).as("fid_uuid"),
        V.uuidFromFriendlyId(lit("not valid!")).isNull.as("fid_bad"),
        V.isJson(doc).as("ij_ok"),
        V.isJson(concat(lit("{"), col("event_type"))).as("ij_bad"))
    }),

    // ---- parse_proto/encode_proto roundtrip (wire format from scratch) ----
    "f_proto" -> ((s, dir) => {
      val doc = to_json(struct(col("event_id").as("id"),
        col("event_type").as("ty"), col("value").as("v"),
        array(col("user_id") % 7, col("event_id") % 11).as("flags"),
        struct((col("user_id") % 50).as("u"),
          (-col("event_id") % 13).as("z")).as("nest")))
      val dec = V.parseProto(V.encodeProto(doc, ProtoEvSchema), ProtoEvSchema)
      ev(s, dir).select(col("event_id"),
        get_json_object(dec, "$.id").cast("long").as("p_id"),
        get_json_object(dec, "$.ty").as("p_ty"),
        get_json_object(dec, "$.v").cast("double").as("p_v"),
        get_json_object(dec, "$.flags[0]").cast("long").as("p_f0"),
        get_json_object(dec, "$.flags[1]").cast("long").as("p_f1"),
        get_json_object(dec, "$.nest.u").cast("long").as("p_u"),
        get_json_object(dec, "$.nest.z").cast("long").as("p_z"),
        // docs example: field-1 varint 150 → 08 96 01
        V.parseProto(unhex(lit("089601")),
          Seq(ProtoField(1, "a", "int64"))).as("p_docs"),
        V.parseProto(unhex(lit("08")), ProtoEvSchema).isNull.as("p_bad"))
    }),

    // ---- wave 8: to_syslog_facility, is_nullish, random_bytes,
    //      tag_types_externally, validate_json_schema, replace_with ----
    "f_wave8" -> ((s, dir) => {
      val code = pmod(col("event_id"), lit(30L))
      val nullishProbe = when(col("event_id") % 4 === 0, lit(""))
        .when(col("event_id") % 4 === 1, lit("-"))
        .when(col("event_id") % 4 === 2, lit(" \n\t "))
        .otherwise(col("event_type"))
      val doc = concat(lit("{\"id\":"), col("event_id").cast("string"),
        lit(",\"ty\":\""), col("event_type"),
        lit("\",\"nest\":{\"u\":"), col("user_id").cast("string"), lit("}}"))
      val payload = concat(lit("{\"ty\":\""), col("event_type"),
        lit("\",\"v\":"), col("user_id").cast("string"), lit("}"))
      val capWords = V.replaceWith(
        concat(col("event_type"), lit(" and "), col("event_type")),
        "\\b(\\w)(\\w*)", (_, caps) => caps(0).toUpperCase + caps(1))
      val capFirst = V.replaceWith(
        concat(col("event_type"), lit(" and "), col("event_type")),
        "\\b(\\w)(\\w*)", (_, caps) => caps(0).toUpperCase + caps(1), count = 1)
      ev(s, dir).select(col("event_id"),
        V.toSyslogFacilityName(code).as("w_fac"),
        V.isNullish(nullishProbe).as("w_nullish"),
        lower(hex(V.randomBytesSeeded(col("event_id"), 20))).as("w_rand"),
        V.tagTypesExternally(doc).as("w_tagged"),
        V.validateJsonSchema(payload, Wave8Schema).as("w_valid"),
        V.validateJsonSchema(payload, Wave8FmtSchema).as("w_fmt_strict"),
        V.validateJsonSchema(payload, Wave8FmtSchema,
          ignoreUnknownFormats = true).as("w_fmt_loose"),
        V.validateJsonSchema(concat(lit("{"), col("event_type")),
          Wave8Schema).isNull.as("w_malformed"),
        capWords.as("w_capwords"),
        capFirst.as("w_capfirst"))
    }),

    // ---- parse_dnstap: per-row synthesized frame (envelope + DNS query
    //      with the row's id) plus the cue golden frame's EDE path ----
    "f_parse_dnstap" -> ((s, dir) => {
      // dnstap envelope: identity "t1", version "v1", ClientQuery over
      // INET/UDP, query_message = DNS A query for www.example.com with
      // header id = event_id % 65536 (the only varying bytes)
      val frame = unhex(concat(
        lit("0a0274311202763172290805100118015221"),
        lpad(hex(pmod(col("event_id"), lit(65536L))), 4, "0"),
        lit("0000000100000000000003777777076578616d706c6503636f6d0000010001"),
        lit("7801")))
      val parsed = V.parseDnstap(frame)
      val golden = V.parseDnstap(unbase64(lit(
        "ChVqYW1lcy1WaXJ0dWFsLU1hY2hpbmUSC0JJTkQgOS4xNi4zGgBy5wEIAxACGAEiEA" +
        "AAAAAAAAAAAAAAAAAAAAAqECABBQJwlAAAAAAAAAAAADAw8+0CODVA7+zq9wVNMU3W" +
        "NlI2kwIAAAABAAAAAAABCWZhY2Vib29rMQNjb20AAAEAAQAAKQIAAACAAAAMAAoACO" +
        "xjCAG9zVgzWgUDY29tAGAAbQAAAAByZLM4AAAAAQAAAAAAAQJoNQdleGFtcGxlA2Nv" +
        "bQAABgABAAApBNABAUAAADkADwA1AAlubyBTRVAgbWF0Y2hpbmcgdGhlIERTIGZvdW" +
        "5kIGZvciBkbnNzZWMtZmFpbGVkLm9yZy54AQ==")))
      ev(s, dir).select(col("event_id"),
        get_json_object(parsed, "$.requestData.header.id").cast("long").as("d_id"),
        get_json_object(parsed, "$.messageType").as("d_type"),
        get_json_object(parsed, "$.requestData.question[0].domainName").as("d_q"),
        get_json_object(parsed, "$.requestData.question[0].questionType").as("d_qt"),
        get_json_object(parsed, "$.requestData.rcodeName").as("d_rcode"),
        get_json_object(parsed, "$.socketFamily").as("d_family"),
        get_json_object(golden, "$.queryZone").as("d_g_zone"),
        get_json_object(golden, "$.responseData.rcodeName").as("d_g_rcode"),
        get_json_object(golden, "$.responseData.opt.ede[0].purpose").as("d_g_ede"),
        get_json_object(golden, "$.sourcePort").cast("long").as("d_g_port"),
        V.parseDnstap(unhex(lit("0a7f"))).isNull.as("d_bad"))
    }),

    // ---- OTLP logs roundtrip (public opentelemetry-proto schema over
    //      the wire-format codec) ----
    "f_otlp" -> ((s, dir) => {
      val sevNum = when(col("event_type") === "error", lit(17))
        .when(col("event_type") === "purchase", lit(13)).otherwise(lit(9))
      val q = "\""
      val logsJson = concat(
        lit("{" + q + "resourceLogs" + q + ":[{" + q + "resource" + q + ":{" +
          q + "attributes" + q + ":[{" + q + "key" + q + ":" + q + "service.name" + q +
          "," + q + "value" + q + ":{" + q + "stringValue" + q + ":" + q + "svc-"),
        pmod(col("user_id"), lit(5L)).cast("string"),
        lit(q + "}}]}," + q + "scopeLogs" + q + ":[{" + q + "scope" + q + ":{" +
          q + "name" + q + ":" + q + "graft" + q + "}," + q + "logRecords" + q +
          ":[{" + q + "timeUnixNano" + q + ":"),
        (col("event_id") * 1000000L).cast("string"),
        lit("," + q + "severityNumber" + q + ":"), sevNum.cast("string"),
        lit("," + q + "severityText" + q + ":" + q), upper(col("event_type")),
        lit(q + "," + q + "body" + q + ":{" + q + "stringValue" + q + ":" + q),
        col("event_type"),
        lit(q + "}," + q + "attributes" + q + ":[{" + q + "key" + q + ":" + q +
          "user" + q + "," + q + "value" + q + ":{" + q + "intValue" + q + ":"),
        col("user_id").cast("string"),
        lit("}}]}]}]}]}"))
      val rt = V.parseOtlpLogs(V.encodeOtlpLogs(logsJson))
      val rec = "$.resourceLogs[0].scopeLogs[0].logRecords[0]"
      ev(s, dir).select(col("event_id"),
        get_json_object(rt, s"$rec.timeUnixNano").cast("long").as("o_time"),
        get_json_object(rt, s"$rec.severityNumber").cast("int").as("o_sevnum"),
        get_json_object(rt, s"$rec.severityText").as("o_sevtext"),
        get_json_object(rt, s"$rec.body.stringValue").as("o_body"),
        get_json_object(rt, s"$rec.attributes[0].value.intValue").cast("long").as("o_user"),
        get_json_object(rt, "$.resourceLogs[0].resource.attributes[0].value.stringValue").as("o_svc"),
        V.parseOtlpLogs(unhex(lit("0aff"))).isNull.as("o_bad"))
    }),

    // ---- byte-stream framing (newline/char/octet/length/varint) ----
    // ---- WARC record framing + parse (ISO 28500; content-length-aware
    //      split survives payloads embedding the header terminator) ----
    "f_warc" -> ((s, _) => {
      Warc.splitAndParse(
        Warc.genWarcRecords(s, rows = 4000, parts = 8).toDF(), perBlob = 50)
    }),

    "f_framing" -> ((s, dir) => {
      val a = col("event_type")
      val b2 = concat(lit("u"), col("user_id").cast("string"))
      val bin = (c: Column) => c.cast("binary")
      val str = (c: Column) => decode(c, "UTF-8")
      val lenAscii = (c: Column) => length(c).cast("string")
      val len4 = (c: Column) => unhex(lpad(hex(length(c)), 8, "0"))
      val len1 = (c: Column) => unhex(lpad(hex(length(c)), 2, "0"))
      val nlBlob = bin(concat(a, lit("\n"), b2, lit("\n")))
      val octBlob = bin(concat(lenAscii(a), lit(" "), a, lenAscii(b2), lit(" "), b2))
      val l4Blob = concat(len4(a), bin(a), len4(b2), bin(b2))
      val viBlob = concat(len1(a), bin(a), len1(b2), bin(b2))
      val nl = Framing.frames(nlBlob, "newline")
      val oct = Framing.frames(octBlob, "octet")
      val l4 = Framing.frames(l4Blob, "length4be")
      val vi = Framing.frames(viBlob, "varint")
      ev(s, dir).select(col("event_id"),
        size(nl).as("fr_nl_n"), str(element_at(nl, 1)).as("fr_nl_0"),
        str(element_at(nl, 2)).as("fr_nl_1"),
        size(oct).as("fr_oct_n"), str(element_at(oct, 2)).as("fr_oct_1"),
        size(l4).as("fr_l4_n"), str(element_at(l4, 1)).as("fr_l4_0"),
        size(vi).as("fr_vi_n"), str(element_at(vi, 2)).as("fr_vi_1"),
        Framing.frames(bin(concat(lit("x "), a)), "octet").isNull.as("fr_bad"),
        Framing.frames(bin(lit("a|b|c")), "char", '|'.toByte).getItem(2)
          .cast("string").as("fr_char_2"))
    }),

    // ---- chunked_gelf reassembly: header parse + id-keyed groupBy ----
    "v_gelf_reassembly" -> ((s, dir) => {
      val msgId = lpad(hex(col("event_id")), 16, "0")
      val hdr = (seq: String) => concat(lit("1e0f"), msgId, lit(seq), lit("02"))
      val part0 = col("event_type")
      val part1 = concat(lit(":"), col("user_id").cast("string"))
      val chunks = array(
        concat(unhex(hdr("00")), part0.cast("binary")),
        concat(unhex(hdr("01")), part1.cast("binary")))
      val datagrams = ev(s, dir)
        .select(explode(chunks).as("datagram"))
      Framing.reassembleGelf(datagrams, "datagram")
        .select(col("msg_id"), decode(col("message"), "UTF-8").as("message"))
    }),

    // ---- wave 9: type-introspection tail (is_integer/is_string over the
    //      JSON-variant form), fallible to_regex, match_datadog_query,
    //      and find_enrichment_table_records (multi-row enrich) ----
    "f_wave9" -> ((s, dir) => {
      val m = pmod(col("event_id"), lit(6L))
      val variant = when(m === 0, col("user_id").cast("string"))
        .when(m === 1, concat(col("user_id").cast("string"), lit("."),
          pmod(col("event_id"), lit(10L)).cast("string")))
        .when(m === 2, concat(lit("\""), col("event_type"), lit("\"")))
        .when(m === 3, when(col("user_id") % 2 === 0, lit("true")).otherwise(lit("false")))
        .when(m === 4, concat(lit("["), col("user_id").cast("string"), lit(","),
          pmod(col("event_id"), lit(100L)).cast("string"), lit("]")))
        .otherwise(concat(lit("{\"u\":"), col("user_id").cast("string"), lit("}")))
      val pm = pmod(col("event_id"), lit(3L))
      val pat = when(pm === 0, concat(lit("^"), col("event_type"), lit("$")))
        .when(pm === 1, lit("([")) // does not compile → null lane
        .otherwise(concat(col("event_type"), lit("+")))
      ev(s, dir).select(col("event_id"),
        V.jsonTypeOf(variant).as("w_type"),
        V.isType(variant, "integer").as("w_is_int"),
        V.isType(variant, "string").as("w_is_str"),
        V.toRegex(pat).as("w_regex"),
        V.matchDatadogQuery("event_type:sign* OR value:>190", "event_type").as("w_dd"))
    }),

    // ---- exact percent codec (encode/decode_percent with the WHATWG
    //      ascii-set lattice; url_encode stays the form codec) ----
    "f_percent" -> ((s, dir) => {
      val raw = concat(col("event_type"), lit(" /=&?~."),
        col("user_id").cast("string"))
      ev(s, dir).select(col("event_id"),
        V.encodePercent(raw).as("p_non"),
        V.encodePercent(raw, "QUERY").as("p_query"),
        V.encodePercent(raw, "USERINFO").as("p_userinfo"),
        V.encodePercent(raw, "WWW_FORM_URLENCODED").as("p_form"),
        (V.decodePercent(V.encodePercent(raw)) === raw).as("p_rt"),
        V.decodePercent(concat(col("event_type"), lit("+x%20"),
          col("user_id").cast("string"))).as("p_plus"))
    }),

    "f_enrich_multi" -> ((s, dir) => {
      import graft.enrich.Enrich
      val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
      val sup = Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey").as("n_nationkey"))
      Enrich.findRecords(n, sup, Seq("n_nationkey"), Seq("s_suppkey", "s_name"))
        .select(col("n_nationkey"), col("n_name"), col("records_json"))
    })
  )

  /** validate_json_schema subset schemas for f_wave8: the core keywords
    * plus the cue examples' unknown-`format` strict/loose pair.
    */
  private val Wave8Schema =
    """{"type":"object","required":["ty","v"],
      |"properties":{"ty":{"type":"string","minLength":5},
      |"v":{"type":"integer","maximum":500}}}""".stripMargin
  private val Wave8FmtSchema =
    """{"type":"object","properties":{"ty":{"type":"string","format":"a-custom-format"}}}""".stripMargin

  /** Proto schema for the f_proto roundtrip: varint + string + double +
    * repeated + zigzag + nested message.
    */
  private val ProtoEvSchema = Seq(
    ProtoField(1, "id", "int64"),
    ProtoField(2, "ty", "string"),
    ProtoField(3, "v", "double"),
    ProtoField(4, "flags", "int64", repeated = true),
    ProtoField(5, "nest", "message", message = Seq(
      ProtoField(1, "u", "int64"),
      ProtoField(2, "z", "sint64"))))

  /** Friendly-ID base62 vectors: (friendly, uuid) — first is the cue
    * example, others independently derived (python int→base62).
    */
  private val FriendlyIds = Seq(
    "3s87yEvnmkiPBMHsj8bwwc" -> "7f41deed-d5e2-8b5e-7a13-ab4ff93cfad2",
    "Sz97YMvJwe3LtpH1GzyXM" -> "0f5c7a2d-1b3e-4c8a-9f00-123456789abc",
    "7n42DGM5Tflk9n8mt7Fhc7" -> "ffffffff-ffff-ffff-ffff-ffffffffffff")

  /** 16-byte AES-128 key for the f_crypto roundtrip. */
  private val CryptoKey = "0123456789abcdef"

  /** 32-byte ipcrypt-pfx key (two distinct AES-128 halves). */
  private val PfxKey = "0123456789abcdefFEDCBA9876543210"

  /** decode_mime_q inputs (cue examples + plain passthrough). */
  private val MimeInputs = Seq(
    "=?utf-8?b?SGVsbG8sIFdvcmxkIQ==?=",
    "From: =?utf-8?b?SGVsbG8sIFdvcmxkIQ==?= <=?utf-8?q?hello=5Fworld=40example=2ecom?=>",
    "?b?SGVsbG8sIFdvcmxkIQ==",
    "plain text, no encoded words")

  /** encrypt_ip input population (cue vector IPs + extras). */
  private val CryptIps = Seq("192.168.1.1", "2001:db8::1", "10.20.30.40", "fd00::42")

  /** Known-answer inputs; oracle digests come from [[graft.functions.Sha3.hex]]. */
  private val Sha3Words = Seq("alpha", "bravo", "charlie", "delta")

  /** IDN test domains (mixed ASCII and internationalized). */
  private val PunyDomains =
    Seq("example.com", "bücher.example", "münchen.de", "café.fr")

  /** Flat avro record schema for the f_avro roundtrip. */
  private val AvroEvSchema =
    """{"type":"record","name":"Ev","fields":[
      |{"name":"event_id","type":"long"},
      |{"name":"event_type","type":"string"},
      |{"name":"value","type":"double"}]}""".stripMargin

  /** parse_bytes inputs with hand-derived expected byte counts (exact in
    * double arithmetic, so the JVM constants equal the column program).
    */
  private val ByteInputs = Seq(
    "512B" -> 512L, "1.5KiB" -> 1536L, "2MiB" -> 2097152L,
    "3GB" -> 3000000000L, "1TiB" -> 1099511627776L, "750KB" -> 750000L)

  def oracleSql: Map[String, String] = Map(

    "f_parse_clf" ->
      s"""SELECT event_id,
         | regexp_extract(line, '^(\\S+)', 1) AS client,
         | regexp_extract(line, '^\\S+ \\S+ (\\S+)', 1) AS auth,
         | regexp_extract(line, '\\[([^\\]]+)\\]', 1) AS ts_str,
         | regexp_extract(line, '"(GET|POST|PUT)', 1) AS method,
         | regexp_extract(line, '"(?:GET|POST|PUT) (\\S+)', 1) AS path,
         | CAST(regexp_extract(line, '" (\\d+)', 1) AS BIGINT) AS status,
         | CAST(regexp_extract(line, '(\\d+)$$', 1) AS BIGINT) AS bytes
         |FROM (SELECT event_id, $duckClf AS line FROM events)""".stripMargin,

    "f_parse_nginx" -> {
      val uaCase = duckUaCase(UAs)
      s"""SELECT event_id,
         | regexp_extract(line, '^(\\S+)', 1) AS client,
         | regexp_extract(line, '"(GET|POST|PUT)', 1) AS method,
         | CAST(regexp_extract(line, '" (\\d+)', 1) AS BIGINT) AS status,
         | regexp_extract(line, '"([^"]*)" "[^"]*"$$', 1) AS referrer,
         | regexp_extract(line, '"([^"]*)"$$', 1) AS agent
         |FROM (SELECT event_id,
         |  ($duckClf || ' "https://ref.example.com/' || event_type || '" "' || $uaCase || '"') AS line
         |  FROM events)""".stripMargin
    },

    "f_user_agent" ->
      s"""SELECT event_id,
         | ${duckUaCase(Seq("Chrome", "Firefox", "Safari", "Edge", "bot", "bot", "Chrome"))} AS browser,
         | ${duckUaCase(Seq("120.0.0.0", "115.0", "16.5", "120.0.2210.91", null, null, "119.0.6045.163"))} AS browser_version,
         | ${duckUaCase(Seq("Windows", "Linux", "iOS", "Windows", "other", "other", "Android"))} AS os,
         | ${duckUaCase(Seq("desktop", "desktop", "mobile", "desktop", "bot", "bot", "mobile"))} AS device
         |FROM events""".stripMargin,

    "f_parse_cef" -> {
      val line = "('CEF:0|graft|engine|1.0|sig-' || (event_id % 5) || '|' || event_type || " +
        "'|' || (event_id % 10) || '|user=' || user_id || ' id=' || event_id)"
      val hdr = "^CEF:(\\d+)\\|([^|]*)\\|([^|]*)\\|([^|]*)\\|([^|]*)\\|([^|]*)\\|([^|]*)\\|(.*)$"
      s"""SELECT event_id,
         | regexp_extract(line, '$hdr', 2) AS vendor,
         | regexp_extract(line, '$hdr', 3) AS product,
         | regexp_extract(line, '$hdr', 4) AS dev_version,
         | regexp_extract(line, '$hdr', 5) AS sig,
         | regexp_extract(line, '$hdr', 6) AS name,
         | CAST(regexp_extract(line, '$hdr', 7) AS INT) AS severity,
         | CAST(regexp_extract(line, 'user=(\\d+)', 1) AS BIGINT) AS ext_user,
         | CAST(regexp_extract(line, 'id=(\\d+)', 1) AS BIGINT) AS ext_id
         |FROM (SELECT event_id, $line AS line FROM events)""".stripMargin
    },

    "f_format" ->
      """SELECT event_id,
        | strftime(ts, '%Y/%m/%d %H') AS fmt_ts,
        | epoch_ms(ts) AS ts_ms,
        | format('{:,}', event_id) AS fmt_n,
        | (event_type || ' plain') AS no_ansi,
        | event_type AS qs_b,
        | CAST(event_id % 1024 AS BIGINT) AS bin_rt,
        | CAST(event_id % 1024 AS BIGINT) AS oct_rt
        |FROM events""".stripMargin,

    "f_parse_glog" -> {
      val line = "((CASE (event_id % 4) WHEN 0 THEN 'I' WHEN 1 THEN 'W' WHEN 2 THEN 'E' ELSE 'F' END)" +
        " || strftime(ts, '%m%d') || ' ' || strftime(ts, '%H:%M:%S.%f') || ' ' ||" +
        " (user_id % 10000) || ' srv.cc:' || (event_id % 1000) || '] op ' || event_type)"
      s"""SELECT event_id,
         | regexp_extract(line, '^([IWEF])', 1) AS level,
         | regexp_extract(line, '^[IWEF](\\d{4})', 1) AS mmdd,
         | regexp_extract(line, '^\\S+ (\\S+)', 1) AS time,
         | CAST(regexp_extract(line, '^\\S+ \\S+ (\\d+)', 1) AS BIGINT) AS tid,
         | regexp_extract(line, ' (\\S+):\\d+\\]', 1) AS srcfile,
         | CAST(regexp_extract(line, ':(\\d+)\\]', 1) AS BIGINT) AS lineno,
         | regexp_extract(line, '\\] (.*)$$', 1) AS msg
         |FROM (SELECT event_id, $line AS line FROM events)""".stripMargin
    },

    "f_etld" -> {
      def pick6(vals: Seq[String]): String =
        "(CASE (event_id % 6) " + vals.zipWithIndex.map { case (v, i) =>
          s"WHEN $i THEN '$v'" }.mkString(" ") + " END)"
      val suffix = pick6(Seq("example.com", "example.co.uk", "test.github.io",
        "foo.org.uk", "bar.com.au", "baz.net"))
      s"""SELECT event_id,
         | ('h' || (user_id % 50) || '.' || $suffix) AS host,
         | ${pick6(Seq("com", "co.uk", "github.io", "org.uk", "com.au", "net"))} AS etld,
         | $suffix AS etld1
         |FROM events""".stripMargin
    },


    "f_crypto" -> {
      def pick(vals: Seq[String]): String =
        s"(CASE (event_id % ${vals.length}) " + vals.zipWithIndex.map {
          case (v, i) => s"WHEN $i THEN '$v'" }.mkString(" ") + " END)"
      s"""SELECT event_id,
         | ('msg-' || event_id) AS roundtrip,
         | true AS aes_ok,
         | ${pick(Sha3Words.map(w => Sha3.hex(w, 256)))} AS sha3_256,
         | ${pick(Sha3Words.map(w => Sha3.hex(w, 512)))} AS sha3_512
         |FROM events""".stripMargin
    },

    "f_parse_vpcflow" ->
      """SELECT event_id,
        | ('eni-' || (event_id % 99)) AS interface_id,
        | ('10.0.' || (user_id % 5) || '.4') AS srcaddr,
        | (event_id % 65535) AS srcport,
        | ((event_id % 100) + 1) AS packets,
        | (((event_id % 100) + 1) * 40) AS bytes,
        | CASE WHEN event_id % 4 = 0 THEN 'REJECT' ELSE 'ACCEPT' END AS action
        |FROM events""".stripMargin,

    "f_parse_auth" ->
      """SELECT event_id,
        | ('Feb  3 07:' || lpad(CAST(event_id % 60 AS VARCHAR), 2, '0') || ':'
        |   || lpad(CAST(user_id % 60 AS VARCHAR), 2, '0')) AS ts_str,
        | ('host-' || (user_id % 10)) AS host,
        | 'sshd' AS appname,
        | ((event_id % 9000) + 1000) AS pid,
        | ('Failed password for user' || (user_id % 50)
        |   || ' from 10.1.2.3 port 22 ssh2') AS message
        |FROM events""".stripMargin,

    "f_parse_bytes" -> {
      def pickKv(vals: Seq[(String, Long)], f: ((String, Long)) => String): String =
        s"(CASE (event_id % ${vals.length}) " + vals.zipWithIndex.map {
          case (v, i) => s"WHEN $i THEN ${f(v)}" }.mkString(" ") + " END)"
      s"""SELECT event_id,
         | ${pickKv(ByteInputs, kv => s"'${kv._1}'")} AS raw,
         | ${pickKv(ByteInputs, kv => s"CAST(${kv._2} AS BIGINT)")} AS n_bytes
         |FROM events""".stripMargin
    },

    "f_compress" ->
      """SELECT event_id,
        | substr(repeat(event_type || ' ', 50), 1, 20) AS gz_head,
        | true AS gz_ok, true AS zl_ok, true AS gz_smaller, true AS zl_tighter,
        | true AS zstd_ok, true AS snappy_ok, true AS lz4_ok, true AS zstd_smaller,
        | true AS corrupt_gz_null, true AS corrupt_zstd_null
        |FROM events""".stripMargin,

    "f_avro" ->
      """SELECT event_id, event_type AS a_type, value AS a_value,
        | true AS nonempty, true AS corrupt_null
        |FROM events""".stripMargin,

    "f_vrl_wave4" -> {
      val line = """'GET /api [' || event_type || '] "agent ' || user_id || '" done'"""
      val ip4 = "'10.' || (user_id % 200) || '.0.' || (event_id % 250)"
      val h = "md5(CAST(event_id AS VARCHAR))"
      val vChar = s"CASE (CAST('0x' || substr($h,17,1) AS BIGINT) % 4) " +
        "WHEN 0 THEN '8' WHEN 1 THEN '9' WHEN 2 THEN 'a' ELSE 'b' END"
      s"""SELECT event_id,
         | array_to_string(regexp_extract_all($line,
         |   '"[^"]*"|\\[[^\\]]*\\]|[^\\s]+'), '|') AS tokens,
         | substr($h,1,8) || '-' || substr($h,9,4) || '-4' || substr($h,14,3)
         |   || '-' || $vChar || substr($h,18,3) || '-' || substr($h,21,12) AS uuid4,
         | lower(lpad(to_hex(epoch_ms(ts)),12,'0'))[1:8] || '-'
         |   || lower(lpad(to_hex(epoch_ms(ts)),12,'0'))[9:12]
         |   || '-7' || substr($h,1,3) || '-' || $vChar || substr($h,4,3)
         |   || '-' || substr($h,7,12) AS uuid7,
         | '::ffff:' || $ip4 AS v6,
         | $ip4 AS v4_back,
         | CAST(NULL AS VARCHAR) AS not_mapped
         |FROM events""".stripMargin
    },

    "f_parse_wave5" ->
      """SELECT event_id,
        | event_type AS rb_ev,
        | user_id AS rb_n,
        | 'cpu' AS ix_m,
        | 'h' || (user_id % 5) AS ix_host,
        | value AS ix_usage,
        | (event_id * 1000000 + 100) AS ix_ts
        |FROM events""".stripMargin,

    "f_parse_wave6" -> {
      // single line: this fragment is interpolated into a stripMargin
      // SQL template — inner newlines would lose one | of each ||
      val apacheLine =
        """('10.' || (user_id % 200) || '.0.' || (event_id % 250)""" +
        """ || ' - user' || user_id || ' [10/Oct/2000:13:55:36 -0700] "GET /page/'""" +
        """ || (event_id % 50) || ' HTTP/1.1" ' || (200 + (event_id % 4) * 100)""" +
        """ || ' ' || (event_id % 5000) || ' "http://ref.example/' || (user_id % 7)""" +
        """ || '" "agent-' || (user_id % 9) || '"')"""
      s"""SELECT event_id,
         | '10.' || (user_id % 200) || '.0.' || (event_id % 250) AS ap_host,
         | 'user' || user_id AS ap_user,
         | 'GET' AS ap_method,
         | '/page/' || (event_id % 50) AS ap_path,
         | CAST(200 + (event_id % 4) * 100 AS BIGINT) AS ap_status,
         | CAST(event_id % 5000 AS BIGINT) AS ap_size,
         | 'http://ref.example/' || (user_id % 7) AS ap_ref,
         | 'agent-' || (user_id % 9) AS ap_agent,
         | 'http' AS alb_type,
         | CAST(200 + (event_id % 4) * 100 AS VARCHAR) AS alb_status,
         | CAST(event_id % 900 + 34 AS BIGINT) AS alb_rb,
         | 'GET' AS alb_method,
         | 'http://www.example.com:80/p' || (event_id % 10) AS alb_url,
         | 'curl/7.46.0' AS alb_agent,
         | true AS alb_target_null,
         | CAST(0.0 AS DOUBLE) AS alb_rpt,
         | 'core' AS er_module,
         | 'error' AS er_sev,
         | CAST(user_id AS BIGINT) AS er_pid,
         | '72.15.99.' || (event_id % 200) AS er_client,
         | 'File does not exist: /x/' || (event_id % 10) AS er_msg,
         | CASE event_type WHEN 'click' THEN 'ClickMainPage'
         |   WHEN 'error' THEN 'ErrorMainPage'
         |   WHEN 'purchase' THEN 'PurchaseMainPage'
         |   WHEN 'signup' THEN 'SignupMainPage'
         |   ELSE 'ViewMainPage' END AS pascal,
         | upper(event_type) || '_MAIN_PAGE' AS scream,
         | array_to_string(regexp_extract_all($apacheLine, '\\d+'), ',') AS all_nums,
         | 'g' || (user_id % 5) AS cw_group,
         | 'm' || event_id AS cw_msg,
         | CAST(event_id * 1000 AS BIGINT) AS cw_ts,
         | CAST(1 AS BIGINT) AS cw_n
         |FROM events""".stripMargin
    },

    "f_codec_wave6" -> {
      val types = Seq("click", "error", "purchase", "signup", "view")
      def seaCase(key: String, f: String => Long): String =
        s"(CASE $key " + (key match {
          case "event_type" => types.map(t => s"WHEN '$t' THEN ${f(t)}")
          case _ => (0 until 7).map(i => s"WHEN $i THEN ${f(s"u$i")}")
        }).mkString(" ") + " END)"
      def pick(n: Int, vals: Seq[String]): String =
        s"(CASE (event_id % $n) " + vals.zipWithIndex.map { case (v, i) =>
          s"WHEN $i THEN " + (if (v == null) "NULL" else s"'$v'") }
          .mkString(" ") + " END)"
      val mimeExp = MimeInputs.map(Mime.mimeQ)
      val ipExp = CryptIps.map(IpCrypt(_, CryptoKey, "aes128", enc = true))
      s"""SELECT event_id,
         | CAST(${seaCase("event_type", Seahash.of)} AS BIGINT) AS sea_t,
         | CAST(${seaCase("(user_id % 7)", Seahash.of)} AS BIGINT) AS sea_u,
         | ${pick(MimeInputs.length, mimeExp)} AS mime_dec,
         | true AS cs_rt, true AS cs_vec,
         | ${pick(CryptIps.length, ipExp)} AS ip_enc,
         | true AS ip_rt, true AS ip_rt_pfx
         |FROM events""".stripMargin
    },

    "f_punycode" -> {
      def pick(vals: Seq[String]): String =
        s"(CASE (event_id % ${vals.length}) " + vals.zipWithIndex.map {
          case (v, i) => s"WHEN $i THEN '$v'" }.mkString(" ") + " END)"
      val ascii = PunyDomains.map(Punycode.ascii)
      s"""SELECT event_id,
         | ${pick(ascii)} AS ascii,
         | ${pick(ascii.map(Punycode.unicode))} AS unicode_back
         |FROM events""".stripMargin
    },

    "f_vrl_wave7" -> {
      val h = "CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)),1,15) AS BIGINT)"
      val n = "((event_id % 7919) * (CASE WHEN event_id % 2 = 0 THEN -1 ELSE 1 END))"
      s"""SELECT event_id,
         | 'file' || (event_id % 7) || '.log' AS base,
         | '/var/log/app' || (user_id % 5) || '/part' || (event_id % 3) AS dir,
         | event_type || '.json' AS rel_base,
         | 'data' AS rel_dir,
         | '/|var|log|app' || (user_id % 5) || '|part' || (event_id % 3)
         |   || '|file' || (event_id % 7) || '.log' AS parts,
         | true AS has_all,
         | (regexp_matches(event_type, '^cl') OR regexp_matches(event_type, '^pu'))
         |   AS m_any,
         | true AS m_some,
         | (CASE WHEN $n < 0 THEN '-' || printf('%x', -$n)
         |   ELSE printf('%x', $n) END) AS hex16,
         | (CASE WHEN $n < 0 THEN '-' || to_base(-$n, 2)
         |   ELSE to_base($n, 2) END) AS bin2,
         | event_id AS rt_int,
         | CAST((event_id % 100) + 0.25 AS DOUBLE) AS pf,
         | (CASE (event_id % 4) WHEN 0 THEN true WHEN 1 THEN false
         |   WHEN 2 THEN true ELSE NULL END) AS tb,
         | event_type AS b16_rt,
         | 'lvl=' || event_type || ' msg="user ' || user_id || '" ts=' || event_id
         |   AS kv,
         | '10.' || (user_id % 200) || '.0.' || (event_id % 250) AS ip_rt,
         | '2001:db8::7' AS ip6_rt,
         | true AS is6,
         | false AS is6_v4,
         | ($h % 2 = 1) AS rb,
         | (($h % 10) + 10) AS ri,
         | round(CAST($h AS DOUBLE) / 1.152921504606847e18, 6) AS rf
         |FROM events""".stripMargin
    },

    "f_cbor" -> {
      val fid = "(CASE (event_id % 3) " + FriendlyIds.zipWithIndex.map {
        case ((_, uuid), i) => s"WHEN $i THEN '$uuid'" }.mkString(" ") + " END)"
      s"""SELECT event_id,
         | event_type AS c_ty,
         | value AS c_v,
         | (user_id % 50) AS c_u,
         | '{"field":"value"}' AS c_cue,
         | true AS c_bad,
         | '{"a":{"b":' || user_id || ',"c":"' || event_type || '"},"top":1}'
         |   AS unflat,
         | $fid AS fid_uuid,
         | true AS fid_bad,
         | true AS ij_ok,
         | false AS ij_bad
         |FROM events""".stripMargin
    },

    "f_proto" ->
      """SELECT event_id,
        | event_id AS p_id,
        | event_type AS p_ty,
        | value AS p_v,
        | (user_id % 7) AS p_f0,
        | (event_id % 11) AS p_f1,
        | (user_id % 50) AS p_u,
        | (-event_id % 13) AS p_z,
        | '{"a":150}' AS p_docs,
        | true AS p_bad
        |FROM events""".stripMargin,

    "f_wave8" ->
      """SELECT event_id,
        | list_extract(['kern','user','mail','daemon','auth','syslog','lpr',
        |   'news','uucp','cron','authpriv','ftp','ntp','security','console',
        |   'solaris-cron','local0','local1','local2','local3','local4',
        |   'local5','local6','local7'], CAST(event_id % 30 AS INT) + 1) AS w_fac,
        | (event_id % 4) IN (0, 1, 2) AS w_nullish,
        | substr(md5(event_id || ':0') || md5(event_id || ':1'), 1, 40) AS w_rand,
        | '{"id":{"integer":' || event_id || '},"ty":{"string":"' || event_type ||
        |   '"},"nest":{"u":{"integer":' || user_id || '}}}' AS w_tagged,
        | (length(event_type) >= 5 AND user_id <= 500) AS w_valid,
        | false AS w_fmt_strict,
        | true AS w_fmt_loose,
        | true AS w_malformed,
        | upper(substr(event_type, 1, 1)) || substr(event_type, 2) ||
        |   ' And ' || upper(substr(event_type, 1, 1)) || substr(event_type, 2)
        |   AS w_capwords,
        | upper(substr(event_type, 1, 1)) || substr(event_type, 2) ||
        |   ' and ' || event_type AS w_capfirst
        |FROM events""".stripMargin,

    "f_parse_dnstap" ->
      """SELECT event_id,
        | event_id % 65536 AS d_id,
        | 'ClientQuery' AS d_type,
        | 'www.example.com.' AS d_q,
        | 'A' AS d_qt,
        | 'NoError' AS d_rcode,
        | 'INET' AS d_family,
        | 'com.' AS d_g_zone,
        | 'BADVERS' AS d_g_rcode,
        | 'DNSKEY Missing' AS d_g_ede,
        | 46835 AS d_g_port,
        | true AS d_bad
        |FROM events""".stripMargin,

    "f_otlp" ->
      """SELECT event_id,
        | event_id * 1000000 AS o_time,
        | CASE event_type WHEN 'error' THEN 17 WHEN 'purchase' THEN 13
        |   ELSE 9 END AS o_sevnum,
        | upper(event_type) AS o_sevtext,
        | event_type AS o_body,
        | user_id AS o_user,
        | 'svc-' || (user_id % 5) AS o_svc,
        | true AS o_bad
        |FROM events""".stripMargin,

    // WARC twin: parse the SAME fields straight from the per-record
    // materialized table — the Spark side must round-trip through the
    // concatenated blobs and the content-length splitter to match.
    "f_warc" ->
      s"""SELECT CAST(rec_id AS BIGINT) AS rec_id,
         |  ${Warc.duckFields}
         |FROM (SELECT rec_id, record AS rec
         |      FROM read_parquet('${graft.SparkEntry.OutDirToken}/_inputs/gen_warc/*.parquet'))""".stripMargin,

    "f_framing" ->
      """SELECT event_id,
        | 2 AS fr_nl_n, event_type AS fr_nl_0, 'u' || user_id AS fr_nl_1,
        | 2 AS fr_oct_n, 'u' || user_id AS fr_oct_1,
        | 2 AS fr_l4_n, event_type AS fr_l4_0,
        | 2 AS fr_vi_n, 'u' || user_id AS fr_vi_1,
        | true AS fr_bad,
        | 'c' AS fr_char_2
        |FROM events""".stripMargin,

    "v_gelf_reassembly" ->
      """SELECT lower(lpad(to_hex(event_id), 16, '0')) AS msg_id,
        | event_type || ':' || user_id AS message
        |FROM events""".stripMargin,

    "f_wave9" ->
      """SELECT event_id,
        | CASE event_id % 6 WHEN 0 THEN 'integer' WHEN 1 THEN 'float'
        |   WHEN 2 THEN 'string' WHEN 3 THEN 'boolean' WHEN 4 THEN 'array'
        |   ELSE 'object' END AS w_type,
        | (event_id % 6 = 0) AS w_is_int,
        | (event_id % 6 = 2) AS w_is_str,
        | CASE event_id % 3 WHEN 0 THEN '^' || event_type || '$'
        |   WHEN 1 THEN NULL ELSE event_type || '+' END AS w_regex,
        | (event_type LIKE 'sign%' OR value > 190) AS w_dd
        |FROM events""".stripMargin,

    "f_percent" ->
      """SELECT event_id,
        | replace(replace(replace(replace(replace(replace(replace(
        |   event_type || ' /=&?~.' || user_id,
        |   ' ','%20'),'/','%2F'),'=','%3D'),'&','%26'),'?','%3F'),'~','%7E'),'.','%2E') AS p_non,
        | replace(event_type || ' /=&?~.' || user_id, ' ', '%20') AS p_query,
        | replace(replace(replace(replace(
        |   event_type || ' /=&?~.' || user_id,
        |   ' ','%20'),'/','%2F'),'=','%3D'),'?','%3F') AS p_userinfo,
        | replace(replace(replace(replace(replace(replace(
        |   event_type || ' /=&?~.' || user_id,
        |   ' ','%20'),'/','%2F'),'=','%3D'),'&','%26'),'?','%3F'),'~','%7E') AS p_form,
        | true AS p_rt,
        | event_type || '+x ' || user_id AS p_plus
        |FROM events""".stripMargin,

    "f_enrich_multi" ->
      """SELECT n_nationkey, n_name,
        | coalesce('[' || string_agg(
        |     to_json(struct_pack(s_suppkey := s_suppkey, s_name := s_name)), ','
        |     ORDER BY to_json(struct_pack(s_suppkey := s_suppkey, s_name := s_name)))
        |   || ']', '[]') AS records_json
        |FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
        |GROUP BY n_nationkey, n_name""".stripMargin,

    "f_parse_kv" ->
      s"""SELECT event_id, $duckLogfmtLine AS line,
         | regexp_extract($duckLogfmtLine, 'ev=([^ ]*)', 1) AS kv_ev,
         | CAST(regexp_extract($duckLogfmtLine, 'user=([^ ]*)', 1) AS BIGINT) AS kv_user
         |FROM events""".stripMargin,

    "f_parse_url" ->
      s"""SELECT event_id,
         | regexp_extract($duckUrl, '^([a-z][a-z0-9+.-]*)://', 1) AS scheme,
         | regexp_extract($duckUrl, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS host,
         | CAST(nullif(regexp_extract($duckUrl, '^[a-z][a-z0-9+.-]*://[^/:?#]+:(\\d+)', 1), '') AS INT) AS port,
         | regexp_extract($duckUrl, '^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path,
         | CAST(nullif(regexp_extract($duckUrl, '[?&]page=([^&#]*)', 1), '') AS INT) AS q_page
         |FROM events""".stripMargin,

    "f_parse_csv" ->
      """SELECT event_id,
        | string_split(event_id || ',' || event_type || ',' || (user_id % 97), ',')[2] AS c1,
        | CAST(string_split(event_id || ',' || event_type || ',' || (user_id % 97), ',')[3] AS BIGINT) AS c2
        |FROM events""".stripMargin,

    "f_parse_time" ->
      """SELECT event_id,
        | strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS ts_rt,
        | CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        | timezone('UTC', to_timestamp(CAST(floor(epoch(ts)) AS BIGINT))) AS ts_unix_rt,
        | CAST(event_id % 500 AS DOUBLE) * (CASE (event_id % 4)
        |   WHEN 0 THEN 0.001 WHEN 1 THEN 1.0 WHEN 2 THEN 60.0 ELSE 3600.0 END) AS dur_s
        |FROM events""".stripMargin,

    "f_string_ops" ->
      """SELECT event_id,
        | upper(event_type) AS up, len(event_type) AS len,
        | substr(event_type, 1, 3) AS trunc3,
        | regexp_replace(event_type, '[aeiou]', '_', 'g') AS devoweled,
        | regexp_replace(event_type || '!#' || user_id, '[^a-z0-9]', '', 'g') AS sieved,
        | regexp_replace('user=' || user_id, '\d+', '[REDACTED]', 'g') AS redacted,
        | regexp_matches(event_type, '^(error|signup)$') AS is_alert,
        | lower(replace(event_type || ' case', ' ', '_')) AS snake,
        | list_aggregate(list_transform(string_split(lower(event_type || '_case_x'), '_'),
        |    w -> CASE WHEN w = string_split(lower(event_type || '_case_x'), '_')[1]
        |         THEN w ELSE upper(substr(w,1,1)) || substr(w,2) END), 'string_agg', '') AS camel,
        | CAST(levenshtein(event_type, 'error') AS BIGINT) AS lev_err
        |FROM events""".stripMargin,

    "f_codec" ->
      """SELECT event_id,
        | to_base64(CAST(event_type AS BLOB)) AS b64,
        | (CAST(from_base64(to_base64(CAST(event_type AS BLOB))) AS VARCHAR) = event_type) AS b64_rt,
        | lower(hex(event_type)) AS hexs,
        | md5(event_type) AS md5s,
        | sha256(event_type) AS sha256s
        |FROM events""".stripMargin,

    "f_number" ->
      """SELECT event_id,
        | abs(value - 100) AS abs_v,
        | CAST(ceil(value) AS BIGINT) AS ceil_v, CAST(floor(value) AS BIGINT) AS floor_v,
        | round(value, 1) AS round_v,
        | (event_id % 13) AS mod_v,
        | round(6371.0 * 2.0 * asin(sqrt(
        |    pow(sin(radians(48.8566 - ((user_id % 180) - 90)) / 2), 2) +
        |    cos(radians((user_id % 180) - 90)) * cos(radians(48.8566)) *
        |    pow(sin(radians(2.3522 - ((event_id % 360) - 180)) / 2), 2))), 4) AS hav_km
        |FROM events""".stripMargin,

    "f_ip" -> {
      val aton = s"(10*16777216 + (user_id % 256)*65536 + (event_id % 256)*256 + 7)"
      s"""SELECT event_id, $duckIp AS ip,
         | $aton AS ip_n,
         | true AS ntoa_rt,
         | ($aton // 16777216) = (10*16777216 // 16777216) AS in_10slash8,
         | ($aton // 65536) = ((10*16777216 + 42*65536) // 65536) AS in_10_42slash16
         |FROM events""".stripMargin
    },

    "f_syslog" ->
      """SELECT event_id,
        | (CASE (event_id % 192) % 8 WHEN 0 THEN 'emerg' WHEN 1 THEN 'alert'
        |   WHEN 2 THEN 'crit' WHEN 3 THEN 'err' WHEN 4 THEN 'warning'
        |   WHEN 5 THEN 'notice' WHEN 6 THEN 'info' ELSE 'debug' END) AS level,
        | CAST((event_id % 192) % 8 AS INT) AS sev_rt,
        | CAST((event_id % 192) // 8 AS INT) AS facility
        |FROM events""".stripMargin,

    "f_parse_grok_log" -> {
      val line = "('10.' || (user_id % 256) || '.0.7 - ' || upper(substr(event_type,1,3)) || ' /' " +
        "|| event_type || '/' || (event_id % 100) || ' ' || " +
        "(CASE (event_id % 3) WHEN 0 THEN 200 WHEN 1 THEN 404 ELSE 500 END) || ' ' || (event_id % 4096))"
      s"""SELECT event_id, true AS parse_ok,
         | regexp_extract($line, '^(\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}) ', 1) AS clientip,
         | upper(substr(event_type,1,3)) AS verb,
         | ('/' || event_type || '/' || (event_id % 100)) AS path,
         | CAST((CASE (event_id % 3) WHEN 0 THEN 200 WHEN 1 THEN 404 ELSE 500 END) AS BIGINT) AS status,
         | CAST((event_id % 4096) AS BIGINT) AS bytes
         |FROM events""".stripMargin
    },

    "f_entropy" -> {
      val p = "(len(list_filter(ch, y -> y = x))::DOUBLE / len(ch)::DOUBLE)"
      s"""SELECT event_id, round(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |  list_transform(list_distinct(ch), x -> $p * log2($p))), (a, b) -> a + b), 6) AS ent
         |FROM (SELECT event_id, string_split(event_type, '') AS ch FROM events)""".stripMargin
    },

    "f_parse_xml" ->
      """SELECT event_id,
        | event_type AS xk,
        | CAST(user_id % 977 AS BIGINT) AS xv,
        | CAST(event_id % 100 AS BIGINT) AS xid
        |FROM events""".stripMargin,

    "f_encode_cef" ->
      """SELECT event_id,
        | ('CEF:0|graft|pipeline|1.0|' || (event_id % 1000) || '|' || event_type || '|'
        |  || (user_id % 10) || '|' || 'user=' || user_id || ' val=' || (event_id % 50)) AS cef
        |FROM events""".stripMargin,

    "f_url_codec" ->
      """SELECT event_id,
        | replace(replace(replace(
        |    event_type || ' ' || user_id || '&x=' || (event_id % 50),
        |    '&', '%26'), '=', '%3D'), ' ', '+') AS enc,
        | true AS dec_rt,
        | true AS uuid_ok
        |FROM events""".stripMargin,

    "f_chunks_ip" ->
      """SELECT event_id,
        | CAST(3 AS BIGINT) AS n_chunks,
        | (event_type || '|' || user_id) AS chunk1,
        | true AS is_ipv4,
        | ('10.' || (user_id % 256) || '.0.0') AS subnet16
        |FROM events""".stripMargin,

    "f_parse_syslog" ->
      """SELECT event_id, true AS parse_ok,
        | CAST(event_id % 192 AS BIGINT) AS pri,
        | ('Jan ' || (user_id % 19 + 10) || ' 12:00:' || lpad(CAST(event_id % 60 AS VARCHAR), 2, '0')) AS ts_txt,
        | ('h' || (user_id % 50)) AS host,
        | event_type AS prog,
        | CAST(event_id % 30000 AS BIGINT) AS pid,
        | ('login from 10.0.0.' || (event_id % 256)) AS msg
        |FROM events""".stripMargin,

    "f_maps" ->
      """SELECT event_id,
        | event_type AS mk_up,
        | (event_type || '!') AS mv_bang,
        | 'z' AS merged,
        | CAST(3 AS BIGINT) AS n_keys,
        | 'ev,id,user' AS keys_sorted,
        | len(flatten([string_split(event_type, 'i'), ['x']])) AS flat_n,
        | CAST(1 * (event_id % 5) + 2 * 0 + 3 * 1 AS BIGINT) AS zip_dot
        |FROM events""".stripMargin,

    "f_collections" -> {
      val arr = "string_split(event_type || ' ' || event_type || ' x ' || (user_id % 5), ' ')"
      s"""SELECT event_id,
         | len($arr) AS n,
         | len(list_distinct($arr)) AS n_uniq,
         | list_contains($arr, 'x') AS has_x,
         | CAST(list_sum(list_transform($arr, t -> len(t))) AS BIGINT) AS total_len,
         | list_aggregate(list_reverse($arr), 'string_agg', '|') AS rev_joined
         |FROM events""".stripMargin
    }
  )
}
