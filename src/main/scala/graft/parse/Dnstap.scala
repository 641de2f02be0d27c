package graft.parse

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** VRL `parse_dnstap` (reference: website/cue/reference/remap/functions/
  * parse_dnstap.cue; src/sources/dnstap/ consumes the same frames): a
  * dnstap protobuf envelope (the public dnstap.proto: identity=1,
  * version=2, extra=3, message=14, type=15) whose Message carries two
  * raw DNS wire-format payloads (query_message / response_message),
  * socket metadata, and nanosecond timestamps.
  *
  * Both layers are decoded from their public specs — the protobuf wire
  * grammar (shared with [[graft.functions.ProtoWire]]) and RFC 1035 DNS
  * messages with RFC 6891 EDNS(0): header flags, question section,
  * answer records (A/AAAA/NS/CNAME/PTR/TXT rdata in text form, others
  * base64), OPT pseudo-record (udpPayloadSize, ednsVersion,
  * extendedRcode, DO bit), EDNS options (Cookie/NSID/Padding named, RFC
  * 8914 Extended DNS Errors with their IANA purpose strings), and name
  * compression pointers.
  *
  * Output is a JSON doc with the reference's exact key set, emitted in
  * sorted key order (the cue example's shape): dataType/dataTypeId,
  * messageType/messageTypeId, serverId/serverVersion, socketFamily/
  * socketProtocol, sourceAddress/sourcePort, responseAddress/
  * responsePort, queryZone, time/timePrecision/timestamp, and
  * requestData/responseData objects (fullRcode, header, opt, question,
  * answers, rcodeName). Malformed input → null (fallible `parse_dnstap!`).
  */
case class DnstapParse(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_dnstap"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"parse_dnstap needs binary, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val r = Dnstap.parse(v.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""String ${ev.value}_s = graft.parse.Dnstap.parse($c);
         |if (${ev.value}_s == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = UTF8String.fromString(${ev.value}_s); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DnstapParse =
    copy(child = newChild)
}

object Dnstap {

  // dnstap.proto Message.Type names, rendered CamelCase as the reference does
  private val MessageTypes = Map(
    1 -> "AuthQuery", 2 -> "AuthResponse", 3 -> "ResolverQuery",
    4 -> "ResolverResponse", 5 -> "ClientQuery", 6 -> "ClientResponse",
    7 -> "ForwarderQuery", 8 -> "ForwarderResponse", 9 -> "StubQuery",
    10 -> "StubResponse", 11 -> "ToolQuery", 12 -> "ToolResponse",
    13 -> "UpdateQuery", 14 -> "UpdateResponse")

  private val Rcodes = Map(
    0 -> "NoError", 1 -> "FormErr", 2 -> "ServFail", 3 -> "NXDomain",
    4 -> "NotImp", 5 -> "Refused", 6 -> "YXDomain", 7 -> "YXRRSet",
    8 -> "NXRRSet", 9 -> "NotAuth", 10 -> "NotZone", 16 -> "BADVERS",
    17 -> "BADKEY", 18 -> "BADTIME", 19 -> "BADMODE", 20 -> "BADNAME",
    21 -> "BADALG", 22 -> "BADTRUNC", 23 -> "BADCOOKIE")

  private val RrTypes = Map(
    1 -> "A", 2 -> "NS", 5 -> "CNAME", 6 -> "SOA", 12 -> "PTR", 15 -> "MX",
    16 -> "TXT", 28 -> "AAAA", 33 -> "SRV", 35 -> "NAPTR", 41 -> "OPT",
    43 -> "DS", 46 -> "RRSIG", 47 -> "NSEC", 48 -> "DNSKEY", 50 -> "NSEC3",
    64 -> "SVCB", 65 -> "HTTPS", 255 -> "ANY")

  private val OptNames = Map(
    3 -> "NSID", 8 -> "ClientSubnet", 10 -> "Cookie", 11 -> "Keepalive",
    12 -> "Padding", 14 -> "KeyTag")

  // RFC 8914 Extended DNS Error purposes (IANA registry)
  private val EdePurposes = Map(
    0 -> "Other", 1 -> "Unsupported DNSKEY Algorithm",
    2 -> "Unsupported DS Digest Type", 3 -> "Stale Answer",
    4 -> "Forged Answer", 5 -> "DNSSEC Indeterminate", 6 -> "DNSSEC Bogus",
    7 -> "Signature Expired", 8 -> "Signature Not Yet Valid",
    9 -> "DNSKEY Missing", 10 -> "RRSIGs Missing",
    11 -> "No Zone Key Bit Set", 12 -> "NSEC Missing", 13 -> "Cached Error",
    14 -> "Not Ready", 15 -> "Blocked", 16 -> "Censored", 17 -> "Filtered",
    18 -> "Prohibited", 19 -> "Stale NXDomain Answer",
    20 -> "Not Authoritative", 21 -> "Not Supported",
    22 -> "No Reachable Authority", 23 -> "Network Error", 24 -> "Invalid Data")

  // ---------------- protobuf envelope walk ----------------

  private final class Reader(val b: Array[Byte], var p: Int, val end: Int) {
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (shift < 64) {
        if (p >= end) throw new IllegalArgumentException("varint eof")
        val x = b(p) & 0xff; p += 1
        out |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return out
        shift += 7
      }
      throw new IllegalArgumentException("varint overflow")
    }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || p + n > end) throw new IllegalArgumentException("bytes eof")
      val out = java.util.Arrays.copyOfRange(b, p, p + n); p += n; out
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => bytes(8)
      case 2 => bytes(varint().toInt)
      case 5 => bytes(4)
      case _ => throw new IllegalArgumentException(s"wire $wire")
    }
  }

  private final case class Envelope(
    identity: String, version: String, extra: String, dataTypeId: Int,
    msg: Option[Msg])

  private final case class Msg(
    typeId: Int, family: Int, protocol: Int,
    qAddr: Array[Byte], rAddr: Array[Byte], qPort: Int, rPort: Int,
    qSec: Long, qNsec: Int, rSec: Long, rNsec: Int,
    qMsg: Array[Byte], zone: Array[Byte], rMsg: Array[Byte])

  private def readEnvelope(in: Array[Byte]): Envelope = {
    val r = new Reader(in, 0, in.length)
    var identity = ""; var version = ""; var extra = ""; var dt = 0
    var msg: Option[Msg] = None
    while (r.p < r.end) {
      val tag = r.varint(); val no = (tag >> 3).toInt; val wire = (tag & 7).toInt
      (no, wire) match {
        case (1, 2) => identity = new String(r.bytes(r.varint().toInt), "UTF-8")
        case (2, 2) => version = new String(r.bytes(r.varint().toInt), "UTF-8")
        case (3, 2) => extra = new String(r.bytes(r.varint().toInt), "UTF-8")
        case (15, 0) => dt = r.varint().toInt
        case (14, 2) => msg = Some(readMsg(r.bytes(r.varint().toInt)))
        case _ => r.skip(wire)
      }
    }
    Envelope(identity, version, extra, dt, msg)
  }

  private def readMsg(in: Array[Byte]): Msg = {
    val r = new Reader(in, 0, in.length)
    var t = 0; var fam = 0; var proto = 0
    var qa: Array[Byte] = null; var ra: Array[Byte] = null
    var qp = 0; var rp = 0
    var qs = 0L; var qn = 0; var rs = 0L; var rn = 0
    var qm: Array[Byte] = null; var zone: Array[Byte] = null
    var rm: Array[Byte] = null
    def fixed32(rd: Reader): Int = {
      val b = rd.bytes(4)
      (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)
    }
    while (r.p < r.end) {
      val tag = r.varint(); val no = (tag >> 3).toInt; val wire = (tag & 7).toInt
      (no, wire) match {
        case (1, 0) => t = r.varint().toInt
        case (2, 0) => fam = r.varint().toInt
        case (3, 0) => proto = r.varint().toInt
        case (4, 2) => qa = r.bytes(r.varint().toInt)
        case (5, 2) => ra = r.bytes(r.varint().toInt)
        case (6, 0) => qp = r.varint().toInt
        case (7, 0) => rp = r.varint().toInt
        case (8, 0) => qs = r.varint()
        case (9, 5) => qn = fixed32(r)
        case (10, 2) => qm = r.bytes(r.varint().toInt)
        case (11, 2) => zone = r.bytes(r.varint().toInt)
        case (12, 0) => rs = r.varint()
        case (13, 5) => rn = fixed32(r)
        case (14, 2) => rm = r.bytes(r.varint().toInt)
        case _ => r.skip(wire)
      }
    }
    Msg(t, fam, proto, qa, ra, qp, rp, qs, qn, rs, rn, qm, zone, rm)
  }

  // ---------------- DNS wire format (RFC 1035 / 6891 / 8914) ----------------

  /** Read a (possibly compression-pointed) domain name starting at `pos`;
    * returns (dotted name with trailing '.', next offset).
    */
  private def readName(b: Array[Byte], pos: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder()
    var p = pos
    var jumped = false
    var next = -1
    var hops = 0
    while (true) {
      if (p >= b.length) throw new IllegalArgumentException("name eof")
      val len = b(p) & 0xff
      if ((len & 0xc0) == 0xc0) {
        if (p + 1 >= b.length) throw new IllegalArgumentException("ptr eof")
        val target = ((len & 0x3f) << 8) | (b(p + 1) & 0xff)
        if (!jumped) next = p + 2
        jumped = true
        hops += 1
        if (hops > 64) throw new IllegalArgumentException("ptr loop")
        p = target
      } else if (len == 0) {
        if (sb.length == 0) sb.append('.')
        return (sb.toString, if (jumped) next else p + 1)
      } else {
        if (p + 1 + len > b.length) throw new IllegalArgumentException("label eof")
        var i = 0
        while (i < len) { sb.append((b(p + 1 + i) & 0xff).toChar); i += 1 }
        sb.append('.')
        p += 1 + len
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def u16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  private def className(c: Int): String = c match {
    case 1 => "IN"; case 3 => "CH"; case 4 => "HS"; case 254 => "NONE"
    case 255 => "ANY"; case n => s"CLASS$n"
  }

  private def b64(b: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(b)

  /** One DNS message → the reference's requestData/responseData object. */
  private def parseDns(b: Array[Byte]): String = {
    if (b.length < 12) throw new IllegalArgumentException("dns too short")
    val id = u16(b, 0)
    val flags = u16(b, 2)
    val qr = (flags >> 15) & 1
    val opcode = (flags >> 11) & 0xf
    val aa = ((flags >> 10) & 1) == 1
    val tc = ((flags >> 9) & 1) == 1
    val rd = ((flags >> 8) & 1) == 1
    val ra = ((flags >> 7) & 1) == 1
    val ad = ((flags >> 5) & 1) == 1
    val cd = ((flags >> 4) & 1) == 1
    val rcode4 = flags & 0xf
    val qd = u16(b, 4); val an = u16(b, 6); val ns = u16(b, 8); val ar = u16(b, 10)

    var p = 12
    val questions = new StringBuilder
    var qn = 0
    while (qn < qd) {
      val (name, np) = readName(b, p); p = np
      val qt = u16(b, p); val qc = u16(b, p + 2); p += 4
      if (qn > 0) questions.append(',')
      questions.append('{')
        .append("\"class\":").append(jstr(className(qc))).append(',')
        .append("\"domainName\":").append(jstr(name)).append(',')
        .append("\"questionType\":")
        .append(jstr(RrTypes.getOrElse(qt, "Unknown"))).append(',')
        .append("\"questionTypeId\":").append(qt)
        .append('}')
      qn += 1
    }

    // answer + authority + additional walk; OPT lives in additional
    val answers = new StringBuilder
    var optJson: String = null
    var extRcode = 0
    var anWritten = 0
    var rr = 0
    val total = an + ns + ar
    while (rr < total && p < b.length) {
      val (name, np) = readName(b, p); p = np
      val rtype = u16(b, p); val rclass = u16(b, p + 2)
      val ttl = u32(b, p + 4); val rdlen = u16(b, p + 8); p += 10
      if (p + rdlen > b.length) throw new IllegalArgumentException("rdata eof")
      if (rtype == 41) { // OPT pseudo-RR (RFC 6891)
        val udpSize = rclass
        extRcode = ((ttl >> 24) & 0xff).toInt
        val ednsVersion = ((ttl >> 16) & 0xff).toInt
        val doBit = ((ttl >> 15) & 1) == 1
        val opts = new StringBuilder
        val edes = new StringBuilder
        var q = p
        while (q + 4 <= p + rdlen) {
          val code = u16(b, q); val olen = u16(b, q + 2)
          val ov = java.util.Arrays.copyOfRange(b, q + 4, q + 4 + olen)
          if (code == 15) { // RFC 8914 EDE
            val info = if (olen >= 2) u16(b, q + 4) else 0
            val txt = if (olen > 2) new String(ov, 2, olen - 2, "UTF-8") else ""
            if (edes.nonEmpty) edes.append(',')
            edes.append('{')
              .append("\"extraText\":").append(jstr(txt)).append(',')
              .append("\"infoCode\":").append(info).append(',')
              .append("\"purpose\":")
              .append(jstr(EdePurposes.getOrElse(info, "Unknown")))
              .append('}')
          } else {
            if (opts.nonEmpty) opts.append(',')
            opts.append('{')
              .append("\"optCode\":").append(code).append(',')
              .append("\"optName\":")
              .append(jstr(OptNames.getOrElse(code, "Unknown"))).append(',')
              .append("\"optValue\":").append(jstr(b64(ov)))
              .append('}')
          }
          q += 4 + olen
        }
        val o = new StringBuilder("{")
        o.append("\"do\":").append(doBit)
        if (edes.nonEmpty) o.append(",\"ede\":[").append(edes).append(']')
        o.append(",\"ednsVersion\":").append(ednsVersion)
          .append(",\"extendedRcode\":").append(extRcode)
        if (opts.nonEmpty) o.append(",\"options\":[").append(opts).append(']')
        o.append(",\"udpPayloadSize\":").append(udpSize).append('}')
        optJson = o.toString
      } else if (rr < an) { // answer-section record
        val rdata = rtype match {
          case 1 if rdlen == 4 =>
            graft.functions.IpText.ntop(java.util.Arrays.copyOfRange(b, p, p + 4))
          case 28 if rdlen == 16 =>
            graft.functions.IpText.ntop(java.util.Arrays.copyOfRange(b, p, p + 16))
          case 2 | 5 | 12 => readName(b, p)._1
          case 16 if rdlen >= 1 =>
            val tl = b(p) & 0xff
            new String(b, p + 1, math.min(tl, rdlen - 1), "UTF-8")
          case _ => b64(java.util.Arrays.copyOfRange(b, p, p + rdlen))
        }
        if (anWritten > 0) answers.append(',')
        answers.append('{')
          .append("\"class\":").append(jstr(className(rclass))).append(',')
          .append("\"domainName\":").append(jstr(name)).append(',')
          .append("\"rData\":").append(jstr(rdata)).append(',')
          .append("\"recordType\":")
          .append(jstr(RrTypes.getOrElse(rtype, "Unknown"))).append(',')
          .append("\"recordTypeId\":").append(rtype).append(',')
          .append("\"ttl\":").append(ttl)
          .append('}')
        anWritten += 1
      }
      p += rdlen
      rr += 1
    }

    val fullRcode = (extRcode << 4) | rcode4
    val sb = new StringBuilder("{")
    if (anWritten > 0) sb.append("\"answers\":[").append(answers).append("],")
    sb.append("\"fullRcode\":").append(fullRcode).append(',')
      .append("\"header\":{")
      .append("\"aa\":").append(aa).append(',')
      .append("\"ad\":").append(ad).append(',')
      .append("\"anCount\":").append(an).append(',')
      .append("\"arCount\":").append(ar).append(',')
      .append("\"cd\":").append(cd).append(',')
      .append("\"id\":").append(id).append(',')
      .append("\"nsCount\":").append(ns).append(',')
      .append("\"opcode\":").append(opcode).append(',')
      .append("\"qdCount\":").append(qd).append(',')
      .append("\"qr\":").append(qr).append(',')
      .append("\"ra\":").append(ra).append(',')
      .append("\"rcode\":").append(fullRcode).append(',')
      .append("\"rd\":").append(rd).append(',')
      .append("\"tc\":").append(tc).append('}')
    if (optJson != null) sb.append(",\"opt\":").append(optJson)
    if (qd > 0) sb.append(",\"question\":[").append(questions).append(']')
    sb.append(",\"rcodeName\":")
      .append(jstr(Rcodes.getOrElse(fullRcode, "Unknown"))).append('}')
    sb.toString
  }

  private def jstr(s: String): String = {
    val sb = new java.lang.StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  private val TsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.nnnnnnnnn'Z'")
    .withZone(java.time.ZoneOffset.UTC)

  /** dnstap frame → reference-shaped JSON (null on malformed input). */
  def parse(in: Array[Byte]): String =
    try {
      val env = readEnvelope(in)
      val sb = new StringBuilder("{")
      sb.append("\"dataType\":")
        .append(jstr(if (env.dataTypeId == 1) "Message" else "Unknown"))
        .append(",\"dataTypeId\":").append(env.dataTypeId)
        .append(",\"extraInfo\":").append(jstr(env.extra))
      env.msg.foreach { m =>
        sb.append(",\"messageType\":")
          .append(jstr(MessageTypes.getOrElse(m.typeId, "Unknown")))
          .append(",\"messageTypeId\":").append(m.typeId)
        if (m.zone != null)
          sb.append(",\"queryZone\":").append(jstr(readName(m.zone, 0)._1))
        if (m.qMsg != null)
          sb.append(",\"requestData\":").append(parseDns(m.qMsg))
        if (m.rAddr != null)
          sb.append(",\"responseAddress\":")
            .append(jstr(graft.functions.IpText.ntop(m.rAddr)))
        if (m.rMsg != null)
          sb.append(",\"responseData\":").append(parseDns(m.rMsg))
        if (m.rPort != 0) sb.append(",\"responsePort\":").append(m.rPort)
        sb.append(",\"serverId\":").append(jstr(env.identity))
          .append(",\"serverVersion\":").append(jstr(env.version))
          .append(",\"socketFamily\":")
          .append(jstr(if (m.family == 2) "INET6" else "INET"))
          .append(",\"socketProtocol\":")
          .append(jstr(if (m.protocol == 2) "TCP" else "UDP"))
        if (m.qAddr != null)
          sb.append(",\"sourceAddress\":")
            .append(jstr(graft.functions.IpText.ntop(m.qAddr)))
        if (m.qPort != 0) sb.append(",\"sourcePort\":").append(m.qPort)
        // query types carry query_time, response types response_time
        val isResponse = m.typeId % 2 == 0
        val (sec, nsec) =
          if (isResponse && m.rSec != 0) (m.rSec, m.rNsec)
          else (m.qSec, m.qNsec)
        if (sec != 0) {
          val ns = sec * 1000000000L + (nsec & 0xffffffffL)
          sb.append(",\"time\":").append(ns)
            .append(",\"timePrecision\":\"ns\"")
            .append(",\"timestamp\":")
            .append(jstr(TsFmt.format(java.time.Instant.ofEpochSecond(sec, nsec & 0xffffffffL))))
        }
      }
      sb.append('}').toString
    } catch { case _: Exception => null }
}
