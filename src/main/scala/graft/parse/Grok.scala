package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grok-pattern → regex compiler (VRL `parse_grok`/`parse_groks`,
  * SURVEY.md §2.5; reference wiring src/transforms/remap.rs:219-224).
  *
  * A grok pattern is a readable alias layer over regex:
  * `%{WORD:src_tag}/%{WORD:tenant}/%{INT:shard:int}` compiles to one
  * anchored regex with one capture group per named field. The compiler is
  * pure Scala (no Catalyst internals); extraction is expressed with
  * codegen'd `regexp_extract` columns so the parse stage stays inside
  * whole-stage codegen.
  *
  * Pattern library: the common public grok idioms (a subset — the
  * reference delegates to the `grok` crate's full library).
  */
object Grok {

  /** name → (regex fragment, default cast). */
  val Patterns: Map[String, String] = Map(
    "WORD" -> "\\w+",
    "NOTSPACE" -> "\\S+",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "INT" -> "[+-]?\\d+",
    "POSINT" -> "\\d+",
    "NUMBER" -> "[+-]?\\d+(?:\\.\\d+)?",
    "IP" -> "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}",
    "HOSTNAME" -> "[A-Za-z0-9._-]+",
    "USERNAME" -> "[A-Za-z0-9._-]+",
    "UUID" -> "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "TIMESTAMP_ISO8601" -> "\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}(?:\\.\\d+)?(?:Z|[+-]\\d{2}:?\\d{2})?",
    "LOGLEVEL" -> "(?i:TRACE|DEBUG|INFO|WARN(?:ING)?|ERROR|FATAL|CRITICAL)",
    "SYSLOGTIMESTAMP" -> "[A-Z][a-z]{2} {1,2}\\d{1,2} \\d{2}:\\d{2}:\\d{2}",
    "PROG" -> "[\\w._/-]+",
    "HTTPMETHOD" -> "(?:GET|POST|PUT|DELETE|PATCH|HEAD|OPTIONS)",
    "HTTPDATE" -> "\\d{2}/\\w{3}/\\d{4}:\\d{2}:\\d{2}:\\d{2} [+-]\\d{4}",
    "GLOGLEVEL" -> "[IWEF]",
    "GLOGDATE" -> "\\d{4}",
    "QS" -> "\"[^\"]*\"")

  /** VRL `parse_common_log` / `parse_nginx_log` named wrappers (reference:
    * website/cue/reference/remap/functions/parse_common_log.cue,
    * parse_nginx_log.cue) — the Apache CLF and nginx `combined` formats as
    * grok patterns over this compiler.
    */
  val CommonLogPattern: String =
    "%{IP:client} %{NOTSPACE:ident} %{NOTSPACE:auth} [%{HTTPDATE:ts_str}] " +
      "\"%{HTTPMETHOD:method} %{NOTSPACE:path} HTTP/%{NUMBER:http_version}\" " +
      "%{INT:status:int} %{INT:bytes:int}"
  val NginxCombinedPattern: String =
    CommonLogPattern + " \"%{DATA:referrer}\" \"%{DATA:agent}\""

  lazy val CommonLogGrok: Compiled = compile(CommonLogPattern)
  lazy val NginxCombinedGrok: Compiled = compile(NginxCombinedPattern)

  def parseCommonLog(df: DataFrame, src: Column): DataFrame =
    parse(df, src, CommonLogGrok)
  def parseNginxLog(df: DataFrame, src: Column): DataFrame =
    parse(df, src, NginxCombinedGrok)

  /** VRL `parse_aws_vpc_flow_log` (reference: website/cue/reference/remap/
    * functions/parse_aws_vpc_flow_log.cue) — the default v2 14-field
    * space-separated format.
    */
  val AwsVpcFlowPattern: String =
    "%{INT:version:int} %{NOTSPACE:account_id} %{NOTSPACE:interface_id} " +
      "%{NOTSPACE:srcaddr} %{NOTSPACE:dstaddr} %{INT:srcport:int} " +
      "%{INT:dstport:int} %{INT:protocol:int} %{INT:packets:int} " +
      "%{INT:bytes:int} %{INT:start_ts:int} %{INT:end_ts:int} " +
      "%{WORD:action} %{WORD:log_status}"
  lazy val AwsVpcFlowGrok: Compiled = compile(AwsVpcFlowPattern)
  def parseAwsVpcFlowLog(df: DataFrame, src: Column): DataFrame =
    parse(df, src, AwsVpcFlowGrok)

  /** VRL `parse_linux_authorization` (parse_linux_authorization.cue) —
    * auth.log / secure lines: syslog timestamp, host, program[pid], message.
    */
  val LinuxAuthPattern: String =
    "%{SYSLOGTIMESTAMP:ts_str} %{HOSTNAME:host} %{PROG:appname}[%{POSINT:pid:int}]: " +
      "%{GREEDYDATA:message}"
  lazy val LinuxAuthGrok: Compiled = compile(LinuxAuthPattern)
  def parseLinuxAuthorization(df: DataFrame, src: Column): DataFrame =
    parse(df, src, LinuxAuthGrok)

  /** VRL `parse_apache_log` (parse_apache_log.cue) — `common` is the CLF
    * shape with the reference's field names (`host`/`identity`/`user`/
    * `message` split into method+path+protocol), `combined` appends quoted
    * referrer and agent, `error` is the error-log line
    * `[ts] [module:severity] [pid N:tid M] [client ip:port] message`.
    * VRL `parse_klog` is the glog line format under a different entry
    * point (parse_klog.cue's example IS a glog line) — covered by the
    * existing `f_parse_glog` family.
    */
  val ApacheCommonPattern: String =
    "%{IP:host} %{NOTSPACE:identity} %{NOTSPACE:user} [%{HTTPDATE:ts_str}] " +
      "\"%{HTTPMETHOD:method} %{NOTSPACE:path} %{NOTSPACE:protocol}\" " +
      "%{INT:status:int} %{INT:size:int}"
  val ApacheCombinedPattern: String =
    ApacheCommonPattern + " \"%{DATA:referrer}\" \"%{DATA:agent}\""
  val ApacheErrorPattern: String =
    "[%{DATA:ts_str}] [%{WORD:module}:%{LOGLEVEL:severity}] " +
      "[pid %{POSINT:pid:int}:tid %{POSINT:tid:int}] " +
      "[client %{IP:client}:%{POSINT:port:int}] %{GREEDYDATA:message}"
  lazy val ApacheCommonGrok: Compiled = compile(ApacheCommonPattern)
  lazy val ApacheCombinedGrok: Compiled = compile(ApacheCombinedPattern)
  lazy val ApacheErrorGrok: Compiled = compile(ApacheErrorPattern)
  def parseApacheLog(df: DataFrame, src: Column,
                     format: String = "combined"): DataFrame = format match {
    case "common"   => parse(df, src, ApacheCommonGrok)
    case "combined" => parse(df, src, ApacheCombinedGrok)
    case "error"    => parse(df, src, ApacheErrorGrok)
    case other => throw new IllegalArgumentException(
      s"parse_apache_log format must be common/combined/error, got $other")
  }

  /** VRL `parse_aws_alb_log` (parse_aws_alb_log.cue) — the 29-field ELB
    * access-log line. Dash fields become NULL (the reference's `-` → null
    * convention); the quoted `request` splits into
    * `request_method`/`request_url`/`request_protocol` like the reference
    * output shape. One regex pass; nullification and the split are cheap
    * codegen'd column ops on top.
    */
  val AwsAlbPattern: String =
    "%{NOTSPACE:type} %{NOTSPACE:timestamp} %{NOTSPACE:elb} " +
      "%{NOTSPACE:client_host} %{NOTSPACE:target_host} " +
      "%{NUMBER:request_processing_time:double} " +
      "%{NUMBER:target_processing_time:double} " +
      "%{NUMBER:response_processing_time:double} " +
      "%{NOTSPACE:elb_status_code} %{NOTSPACE:target_status_code} " +
      "%{INT:received_bytes:int} %{INT:sent_bytes:int} \"%{DATA:request}\" " +
      "\"%{DATA:user_agent}\" %{NOTSPACE:ssl_cipher} %{NOTSPACE:ssl_protocol} " +
      "%{NOTSPACE:target_group_arn} \"%{DATA:trace_id}\" \"%{DATA:domain_name}\" " +
      "\"%{DATA:chosen_cert_arn}\" %{NOTSPACE:matched_rule_priority} " +
      "%{NOTSPACE:request_creation_time} \"%{DATA:actions_executed}\" " +
      "\"%{DATA:redirect_url}\" \"%{DATA:error_reason}\""
  lazy val AwsAlbGrok: Compiled = compile(AwsAlbPattern)
  private val AlbDashNullFields = Seq("target_host", "ssl_cipher",
    "ssl_protocol", "domain_name", "chosen_cert_arn", "redirect_url",
    "error_reason")
  def parseAwsAlbLog(df: DataFrame, src: Column): DataFrame = {
    val parsed = parse(df, src, AwsAlbGrok)
    val dashed = AlbDashNullFields.foldLeft(parsed) { (d, f) =>
      d.withColumn(f, when(col(f) === "-", lit(null)).otherwise(col(f)))
    }
    dashed
      .withColumn("request_method", split(col("request"), " ").getItem(0))
      .withColumn("request_url", split(col("request"), " ").getItem(1))
      .withColumn("request_protocol", split(col("request"), " ").getItem(2))
      .drop("request")
  }

  /** One extracted field: name, 1-based capture group, SQL cast type (or null). */
  final case class Field(name: String, group: Int, castTo: Option[String])

  final case class Compiled(regex: String, fields: Seq[Field]) {
    lazy val pattern: java.util.regex.Pattern = java.util.regex.Pattern.compile(regex)
    /** Pure-Scala extraction — used by the oracle. Returns null on no-match. */
    def extract(s: String): Option[Map[String, String]] = {
      val m = pattern.matcher(s)
      if (!m.matches()) None
      else Some(fields.map(f => f.name -> m.group(f.group)).toMap)
    }
  }

  private val Ref = "%\\{(\\w+)(?::(\\w+))?(?::(\\w+))?\\}".r

  /** Compile `%{PATTERN:field[:type]}` syntax into an anchored regex.
    * Literal text between references is regex-quoted. Unnamed references
    * (`%{INT}`) match without capturing.
    */
  def compile(grokPattern: String): Compiled = {
    val sb = new StringBuilder("^")
    val fields = scala.collection.mutable.ArrayBuffer.empty[Field]
    var group = 0
    var last = 0
    for (m <- Ref.findAllMatchIn(grokPattern)) {
      sb.append(java.util.regex.Pattern.quote(grokPattern.substring(last, m.start)))
      val pat = Patterns.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"unknown grok pattern %{${m.group(1)}}"))
      Option(m.group(2)) match {
        case Some(fieldName) =>
          group += 1
          sb.append("(").append(pat).append(")")
          fields += Field(fieldName, group, Option(m.group(3)))
        case None =>
          sb.append("(?:").append(pat).append(")")
      }
      last = m.end
    }
    sb.append(java.util.regex.Pattern.quote(grokPattern.substring(last))).append("$")
    Compiled(sb.toString, fields.toSeq)
  }

  private def castCol(c: Column, t: Option[String]): Column = t match {
    case Some("int") => c.cast("long")
    case Some("float") => c.cast("double")
    case Some(other) => c.cast(other)
    case None => c
  }

  /** VRL `parse_groks`: try patterns in order, first match wins
    * (remap parse family, SURVEY §2.5). All patterns run as native
    * single-pass extractions; fields are the union of all patterns' fields
    * (null when the winning pattern lacks one); `_grok_idx` records which
    * pattern matched (-1 = none → `_parse_ok` false).
    */
  def parseMulti(df: DataFrame, src: Column, compiled: Seq[Compiled]): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val exts = compiled.map(c => Bridge.column(
      RegexExtractStruct(Bridge.expression(src), c.regex, c.fields.map(_.name))))
    val withG = compiled.indices.foldLeft(df) { (d, i) => d.withColumn(s"_g$i", exts(i)) }
    val idx = compiled.indices.foldRight(lit(-1)) { (i, acc) =>
      when(col(s"_g$i").isNotNull, lit(i)).otherwise(acc)
    }
    val allFields = compiled.flatMap(_.fields).groupBy(_.name).map(_._2.head).toSeq
    val withFields = allFields.foldLeft(withG.withColumn("_grok_idx", idx)) { (d, f) =>
      val candidates = compiled.zipWithIndex.collect {
        case (c, i) if c.fields.exists(_.name == f.name) =>
          when(col("_grok_idx") === i, col(s"_g$i").getField(f.name))
      }
      d.withColumn(f.name, castCol(coalesce(candidates :+ lit(null): _*), f.castTo))
    }
    compiled.indices.foldLeft(withFields.withColumn("_parse_ok", col("_grok_idx") >= 0)) {
      (d, i) => d.drop(s"_g$i")
    }
  }

  /** Apply a compiled pattern to `src`, adding one column per field plus a
    * `_parse_ok` boolean (the fallible-parse lane — VRL errors route to the
    * dropped port, src/transforms/remap.rs:149-153).
    *
    * Extraction is ONE regex execution per row via the native
    * [[RegexExtractStruct]] expression (the `rlike` + per-field
    * `regexp_extract` formulation runs the full match k+1 times); field
    * columns are cheap struct-field reads off the result. Fully codegen'd.
    */
  def parse(df: DataFrame, src: Column, compiled: Compiled): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val ext = Bridge.column(RegexExtractStruct(
      Bridge.expression(src), compiled.regex, compiled.fields.map(_.name)))
    val withG = df.withColumn("_g", ext).withColumn("_parse_ok", col("_g").isNotNull)
    compiled.fields.foldLeft(withG) { (d, f) =>
      d.withColumn(f.name, castCol(col("_g").getField(f.name), f.castTo))
    }.drop("_g")
  }
}
