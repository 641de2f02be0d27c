package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** VRL stdlib re-expressed as Catalyst column combinators (reference:
  * ~200 functions under website/cue/reference/remap/functions/, wired
  * into remap at src/transforms/remap.rs:219-224; inventory SURVEY.md §2.5).
  *
  * Functions are grouped as in the survey. Everything here is built from
  * `org.apache.spark.sql.functions` (codegen'd, no UDFs) or a native
  * expression ([[ShannonEntropy]]); most have a DuckDB twin in
  * FunctionQueries.oracleSql (crc32/hmac/sha512 have no DuckDB analog and
  * are verified against the JVM reference implementations in HashSpec).
  * Binary codecs and MaxMind lookups ARE ported elsewhere in this
  * package: protobuf wire ([[ProtoWire]]), CBOR ([[Cbor]]), OTLP
  * ([[graft.parse]]'s Otlp schema over ProtoWire), MaxMind-DB reader
  * (graft.enrich.Mmdb). Deliberately NOT ported: the `lua` transform
  * (scripting engine, out of scope since r1) and vector's internal
  * `native` wire codec (not a public interchange format); `random_*`
  * are seeded-deterministic analogs (nondeterminism by design has no
  * replayable batch meaning).
  */
object Vrl {

  // ---------------- parse_* ----------------

  /** `parse_key_value` / `parse_logfmt`: "a=1 b=x" → map. */
  def parseKeyValue(c: Column, pairSep: String = " ", kvSep: String = "="): Column =
    str_to_map(c, lit(pairSep), lit(kvSep))

  /** `parse_url` components via engine-portable regexes (host/port/path/query). */
  def urlScheme(c: Column): Column = regexp_extract(c, "^([a-z][a-z0-9+.-]*)://", 1)
  def urlHost(c: Column): Column = regexp_extract(c, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
  def urlPort(c: Column): Column =
    nullif(regexp_extract(c, "^[a-z][a-z0-9+.-]*://[^/:?#]+:(\\d+)", 1), lit("")).cast("int")
  def urlPath(c: Column): Column = regexp_extract(c, "^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
  def urlQueryParam(c: Column, key: String): Column =
    nullif(regexp_extract(c, s"[?&]${java.util.regex.Pattern.quote(key)}=([^&#]*)", 1), lit(""))

  /** `parse_csv` (unquoted subset): one row → array of fields. */
  def parseCsv(c: Column): Column = split(c, ",", -1)

  /** `parse_timestamp` with an explicit format. */
  def parseTimestamp(c: Column, fmt: String): Column = to_timestamp(c, fmt)

  /** `parse_duration`: "150ms" / "30s" / "5m" / "2h" → seconds (double). */
  def parseDurationSecs(c: Column): Column = {
    val n = regexp_extract(c, "^(\\d+(?:\\.\\d+)?)", 1).cast("double")
    val unit = regexp_extract(c, "(ms|s|m|h)$", 1)
    n * when(unit === "ms", 0.001).when(unit === "s", 1.0)
      .when(unit === "m", 60.0).when(unit === "h", 3600.0)
  }

  /** VRL `parse_bytes` (parse_bytes.cue): "1.5MiB" / "3GB" → byte count.
    * Binary units (KiB..PiB, 1024^k) and decimal (KB..PB, 1000^k); floor
    * to integer bytes. Null unit/number → null (error lane).
    */
  def parseBytes(c: Column): Column = {
    // one full-string match: number immediately followed by unit — any
    // interior garbage ("1.5xKiB") fails the whole parse (fallible, like
    // the reference's parse_bytes!), not just the unanchored middle
    val full = "^([0-9]+(?:\\.[0-9]+)?)([KMGTP]?i?B)$"
    val n = nullif(regexp_extract(c, full, 1), lit("")).cast("double")
    val unit = nullif(regexp_extract(c, full, 2), lit(""))
    val mult = Seq("K", "M", "G", "T", "P").zipWithIndex.foldLeft(
      when(unit === "B", 1.0)) { case (acc, (u, i)) =>
        acc.when(unit === s"${u}iB", math.pow(1024.0, i + 1.0))
          .when(unit === s"${u}B", math.pow(1000.0, i + 1.0))
      }
    floor(n * mult).cast("long")
  }

  /** `parse_int` with radix 16 / 2 / 8. */
  def parseHex(c: Column): Column = conv(c, 16, 10).cast("long")
  def parseBin(c: Column): Column = conv(c, 2, 10).cast("long")
  def parseOct(c: Column): Column = conv(c, 8, 10).cast("long")

  /** `from_unix_timestamp` / `to_unix_timestamp` (+ millisecond variant). */
  def fromUnix(c: Column): Column = to_timestamp(c)
  def toUnix(c: Column): Column = unix_timestamp(c)
  def toUnixMs(c: Column): Column = unix_millis(c)

  /** `format_timestamp` with an explicit pattern. */
  def formatTimestamp(c: Column, fmt: String): Column = date_format(c, fmt)

  /** `strip_ansi_escape_codes`. */
  def stripAnsi(c: Column): Column =
    regexp_replace(c, "\u001b\\[[0-9;]*[A-Za-z]", "")

  /** `parse_query_string`: "a=1&b=x" → map. */
  def parseQueryString(c: Column): Column = str_to_map(c, lit("&"), lit("="))

  /** Unicode normalization (NFC default) — native [[NormalizeUnicode]]
    * expression; pre-dedup text canonicalization.
    */
  def normalizeUnicode(c: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(NormalizeUnicode(Bridge.expression(c), form))
  }

  // ---------------- string ----------------

  def upcase(c: Column): Column = upper(c)
  def downcase(c: Column): Column = lower(c)
  def strlen(c: Column): Column = length(c)
  def containsS(c: Column, s: String): Column = c.contains(s)
  def startsWith(c: Column, s: String): Column = c.startsWith(s)
  def endsWith(c: Column, s: String): Column = c.endsWith(s)
  def matchRe(c: Column, re: String): Column = c.rlike(re)
  def replaceAll(c: Column, re: String, to: String): Column = regexp_replace(c, re, to)
  def truncate(c: Column, n: Int): Column = substring(c, 1, n)
  def sliceS(c: Column, start: Int, len: Int): Column = substring(c, start + 1, len)
  def stripWhitespace(c: Column): Column = trim(c)
  /** `sieve`: keep only characters matching the allowed class. */
  def sieve(c: Column, allowedClass: String): Column =
    regexp_replace(c, s"[^$allowedClass]", "")
  /** `redact`: mask every match of the pattern. */
  def redact(c: Column, re: String): Column = regexp_replace(c, re, "[REDACTED]")
  def snakecase(c: Column): Column = lower(regexp_replace(c, "[ -]", "_"))
  def kebabcase(c: Column): Column = lower(regexp_replace(c, "[ _]", "-"))
  /** `camelcase` over space/underscore-separated lowercase words. */
  def camelcase(c: Column): Column = {
    val parts = split(lower(c), "[ _-]")
    concat(element_at(parts, 1),
      array_join(transform(slice(parts, 2, 10000), w => initcap(w)), ""))
  }
  /** `pascalcase` (pascalcase.cue): every word capitalized, no separators. */
  def pascalcase(c: Column): Column =
    regexp_replace(initcap(regexp_replace(lower(c), "[_-]", " ")), " ", "")
  /** `screamingsnakecase` (screamingsnakecase.cue). */
  def screamingsnakecase(c: Column): Column =
    upper(regexp_replace(c, "[ -]", "_"))

  // ---------------- codec / hash ----------------

  def encodeBase64(c: Column): Column = base64(c.cast("binary"))
  def decodeBase64(c: Column): Column = unbase64(c).cast("string")
  def encodeBase16(c: Column): Column = lower(hex(c))
  def md5Hex(c: Column): Column = md5(c.cast("binary"))
  def sha256Hex(c: Column): Column = sha2(c.cast("binary"), 256)
  def sha512Hex(c: Column): Column = sha2(c.cast("binary"), 512)

  /** VRL `crc32` (checksum family) — Spark's codegen'd builtin. */
  def crc32Of(c: Column): Column = crc32(c.cast("binary"))

  /** VRL `sha3` (variants SHA3-224/256/384/512; reference default 512) —
    * native codegen'd [[Sha3]] over JDK 17 MessageDigest, lowercase hex.
    */
  def sha3Hex(c: Column, bits: Int = 512): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(Sha3(Bridge.expression(c), bits))
  }

  /** VRL `encrypt`/`decrypt` (symmetric AES on columns) — Spark's codegen'd
    * `aes_encrypt`/`aes_decrypt` builtins. Mode "ECB" is fully
    * deterministic (no IV); "CBC"/"GCM" take an explicit IV for
    * reproducible output (Spark randomizes the IV when absent — fine for
    * production, fatal for replayable pipelines/tests). Key must be
    * 16/24/32 bytes (AES-128/192/256).
    */
  def encryptAes(c: Column, key: String, mode: String = "ECB",
                 iv: Column = lit(Array.empty[Byte])): Column =
    aes_encrypt(c.cast("binary"), lit(key.getBytes("UTF-8")), lit(mode),
      lit("DEFAULT"), iv)
  def decryptAes(c: Column, key: String, mode: String = "ECB"): Column =
    aes_decrypt(c, lit(key.getBytes("UTF-8")), lit(mode), lit("DEFAULT")).cast("string")

  /** VRL `encode_gzip`/`decode_gzip`/`encode_zlib`/`decode_zlib`/
    * `encode_zstd`/`decode_zstd`/`encode_snappy`/`decode_snappy`/
    * `encode_lz4`/`decode_lz4` — native codegen'd
    * [[Compress]]/[[Decompress]] (byte-deterministic; decode is fallible →
    * NULL on corrupt payloads, like the reference's `decode_gzip!`).
    */
  def encodeCompressed(c: Column, codec: String): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(Compress(Bridge.expression(c), codec))
  }
  def decodeCompressed(c: Column, codec: String): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(Decompress(Bridge.expression(c), codec))
  }
  def encodeGzip(c: Column): Column = encodeCompressed(c, "gzip")
  def decodeGzip(c: Column): Column = decodeCompressed(c, "gzip")
  def encodeZlib(c: Column): Column = encodeCompressed(c, "zlib")
  def decodeZlib(c: Column): Column = decodeCompressed(c, "zlib")
  def encodeZstd(c: Column): Column = encodeCompressed(c, "zstd")
  def decodeZstd(c: Column): Column = decodeCompressed(c, "zstd")
  def encodeSnappy(c: Column): Column = encodeCompressed(c, "snappy")
  def decodeSnappy(c: Column): Column = decodeCompressed(c, "snappy")
  def encodeLz4(c: Column): Column = encodeCompressed(c, "lz4")
  def decodeLz4(c: Column): Column = decodeCompressed(c, "lz4")

  /** VRL `encode_punycode` / `decode_punycode` — native codegen'd
    * [[Punycode]] over `java.net.IDN` (RFC 3490 IDNA).
    */
  def encodePunycode(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(Punycode(Bridge.expression(c), encode = true))
  }
  def decodePunycode(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(Punycode(Bridge.expression(c), encode = false))
  }

  /** VRL `encode_percent` / `decode_percent` (encode_percent.cue) — the
    * exact percent form with the WHATWG ascii-set lattice; space → `%20`,
    * `+` untouched — see [[Percent]]. (Spark's `url_encode` stays the
    * form-urlencoded codec in `f_url_codec`.)
    */
  def encodePercent(c: Column, asciiSet: String = "NON_ALPHANUMERIC"): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(PercentEncode(Bridge.expression(c), asciiSet))
  }
  def decodePercent(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(PercentDecode(Bridge.expression(c)))
  }

  /** VRL `hmac` with SHA-256, composed from the definition
    * `H((K^opad) || H((K^ipad) || m))` over Spark's codegen'd `sha2` —
    * no UDF, no JCE call per row; the padded-key XOR blocks are plan-time
    * binary literals. Keys longer than the 64-byte block are pre-hashed
    * (RFC 2104). Returns lowercase hex.
    */
  def hmacSha256Hex(key: String, msg: Column): Column = {
    val keyBytes0 = key.getBytes("UTF-8")
    val keyBytes =
      if (keyBytes0.length <= 64) keyBytes0
      else java.security.MessageDigest.getInstance("SHA-256").digest(keyBytes0)
    val block = java.util.Arrays.copyOf(keyBytes, 64)
    val ipad = block.map(b => (b ^ 0x36).toByte)
    val opad = block.map(b => (b ^ 0x5c).toByte)
    val inner = sha2(concat(lit(ipad), msg.cast("binary")), 256)
    sha2(concat(lit(opad), unhex(inner)), 256)
  }

  /** `shannon_entropy` over characters (bits/char) — native codegen'd
    * [[ShannonEntropy]] expression (single primitive loop; the equivalent
    * nested-higher-order-function formulation interprets its lambdas at
    * O(distinct·len) per row — see EntropySpec for the equivalence test).
    */
  def shannonEntropy(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(ShannonEntropy(Bridge.expression(c)))
  }

  // ---------------- number / math ----------------

  def mod(a: Column, b: Column): Column = pmod(a, b)
  /** `haversine` great-circle distance in km (pure arithmetic — identical
    * in any engine given the same double ops).
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val r = lit(6371.0)
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    r * lit(2.0) * asin(sqrt(a))
  }

  // ---------------- IP ----------------

  /** `ip_aton`: dotted quad → uint32 as long. */
  def ipAton(c: Column): Column = {
    val o = (i: Int) => split(c, "\\.", -1).getItem(i - 1).cast("long")
    o(1) * 16777216L + o(2) * 65536L + o(3) * 256L + o(4)
  }

  /** `ip_ntoa`: uint32 long → dotted quad. */
  def ipNtoa(c: Column): Column =
    concat_ws(".",
      (c / 16777216L).cast("long") % 256, (c / 65536L).cast("long") % 256,
      (c / 256L).cast("long") % 256, c.cast("long") % 256)

  /** `community_id` v1 (reference VRL `community_id`; the public
    * Zeek/Corelight spec): `"1:" + base64(sha1(seed_be16 || addr1 || addr2
    * || proto || 0x00 || port1_be16 || port2_be16))` with the endpoint
    * pairs flipped so the smaller (addr, port) comes first. Pure column
    * composition over `sha1`/`unhex`/`base64` — codegen'd, no UDF.
    * Verified against the spec's canonical vector in HashSpec (no DuckDB
    * sha1, so no SQL oracle).
    */
  def communityId(srcIp: Column, dstIp: Column, srcPort: Column, dstPort: Column,
                  proto: Column, seed: Int = 0): Column = {
    def be16(c: Column) = unhex(lpad(hex(c.cast("long")), 4, "0"))
    def be32(c: Column) = unhex(lpad(hex(c.cast("long")), 8, "0"))
    val (sa, da) = (ipAton(srcIp), ipAton(dstIp))
    val flip = da < sa || (da === sa && dstPort < srcPort)
    val addr1 = be32(when(flip, da).otherwise(sa))
    val addr2 = be32(when(flip, sa).otherwise(da))
    val port1 = be16(when(flip, dstPort).otherwise(srcPort))
    val port2 = be16(when(flip, srcPort).otherwise(dstPort))
    val seedBytes = Array[Byte](((seed >> 8) & 0xff).toByte, (seed & 0xff).toByte)
    val payload = concat(lit(seedBytes), addr1, addr2,
      unhex(lpad(hex(proto.cast("long")), 2, "0")), lit(Array[Byte](0)),
      port1, port2)
    concat(lit("1:"), base64(unhex(sha1(payload))))
  }

  /** `ip_cidr_contains`: both addresses shifted down to the network prefix. */
  def ipCidrContains(net: Column, prefix: Int, ip: Column): Column = {
    val shift = math.pow(2, 32 - prefix).toLong
    (ipAton(ip) / shift).cast("long") === (ipAton(net) / shift).cast("long")
  }

  /** `ip_to_ipv6` (ip_to_ipv6.cue): IPv4 dotted quad → IPv4-mapped IPv6
    * `::ffff:a.b.c.d`; an address already containing `:` passes through.
    */
  def ipToIpv6(c: Column): Column =
    when(c.contains(":"), c).otherwise(concat(lit("::ffff:"), c))

  /** `ipv6_to_ipv4` (ipv6_to_ipv4.cue): IPv4-mapped IPv6 → dotted quad;
    * plain IPv4 passes through; any other IPv6 → null (the fallible error
    * lane — the reference errors on non-v4-mapped input).
    */
  def ipv6ToIpv4(c: Column): Column = {
    val mapped = regexp_extract(c, "(?i)^::ffff:((?:[0-9]{1,3}\\.){3}[0-9]{1,3})$", 1)
    when(!c.contains(":"), c).otherwise(nullif(mapped, lit("")))
  }

  // ---------------- wave-4 long tail ----------------

  /** VRL `parse_tokens` (parse_tokens.cue): split a log line into tokens
    * where double-quoted strings and `[...]` groups each form ONE token —
    * the shape of CLF-ish lines. Pure regex scan, no UDF.
    */
  def parseTokens(c: Column): Column =
    regexp_extract_all(c, lit("\"[^\"]*\"|\\[[^\\]]*\\]|[^\\s]+"), lit(0))

  // ---------------- wave-6 long tail ----------------

  /** VRL `parse_regex_all` (parse_regex_all.cue): every match of the
    * pattern, one array element per match; `group` selects a capture
    * (0 = whole match). Spark's codegen'd `regexp_extract_all`.
    */
  def parseRegexAll(c: Column, re: String, group: Int = 0): Column =
    regexp_extract_all(c, lit(re), lit(group))

  /** VRL `seahash` (seahash.cue): the public SeaHash v4 construction as a
    * native codegen'd [[Seahash]] expression; signed i64 like the
    * reference (cue vectors verified in HashSpec).
    */
  def seahash(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(Seahash(Bridge.expression(c)))
  }

  /** VRL `decode_mime_q` (decode_mime_q.cue): RFC 2047 encoded-words —
    * native [[DecodeMimeQ]]; NULL on undecodable input.
    */
  def decodeMimeQ(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(DecodeMimeQ(Bridge.expression(c)))
  }

  /** VRL `encode_charset` / `decode_charset` (encode_charset.cue):
    * UTF-8 ↔ named-charset bytes via JDK `Charset`; NULL on unknown
    * charset (fallible).
    */
  def encodeCharset(c: Column, charset: String): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(EncodeCharset(Bridge.expression(c), charset))
  }
  def decodeCharset(c: Column, charset: String): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(DecodeCharset(Bridge.expression(c), charset))
  }

  /** VRL `encrypt_ip` / `decrypt_ip` (encrypt_ip.cue — IPCrypt spec):
    * `aes128` = ipcrypt-deterministic (16-byte key), `pfx` =
    * prefix-preserving (32-byte key). Deterministic; NULL on bad input.
    */
  def encryptIp(c: Column, key: String, mode: String = "aes128"): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(IpCryptExpr(Bridge.expression(c), key.getBytes("UTF-8"), mode, encrypt = true))
  }
  def decryptIp(c: Column, key: String, mode: String = "aes128"): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(IpCryptExpr(Bridge.expression(c), key.getBytes("UTF-8"), mode, encrypt = false))
  }

  /** VRL `parse_aws_cloudwatch_log_subscription_message`
    * (parse_aws_cloudwatch_log_subscription_message.cue): the fixed JSON
    * envelope CloudWatch Logs delivers to subscriptions — `from_json` with
    * the published schema (messageType/owner/logGroup/logStream/
    * subscriptionFilters/logEvents[{id,timestamp,message}]).
    */
  def parseCloudwatchSubscription(c: Column): Column =
    from_json(c, org.apache.spark.sql.types.DataType.fromDDL(
      "messageType STRING, owner STRING, logGroup STRING, logStream STRING, " +
        "subscriptionFilters ARRAY<STRING>, " +
        "logEvents ARRAY<STRUCT<id: STRING, timestamp: BIGINT, message: STRING>>"))

  /** Seeded deterministic UUID v4 (uuid_v4.cue is random; pipelines that
    * must be REPLAY-STABLE derive the 122 random bits from a seed column
    * instead — md5 of the seed, with the version nibble forced to `4` and
    * the variant nibble into `8..b` per RFC 4122 §4.4). Pure string
    * composition over md5 hex, identically expressible in the oracle.
    */
  def uuidV4Seeded(seed: Column): Column = {
    val h = md5(seed.cast("string"))
    val variant = element_at(array(lit("8"), lit("9"), lit("a"), lit("b")),
      (pmod(conv(substring(h, 17, 1), 16, 10).cast("long"), lit(4L)) + 1).cast("int"))
    concat(substring(h, 1, 8), lit("-"), substring(h, 9, 4), lit("-4"),
      substring(h, 14, 3), lit("-"), variant, substring(h, 18, 3), lit("-"),
      substring(h, 21, 12))
  }

  /** Seeded deterministic UUID v7 (uuid_v7.cue): 48-bit big-endian unix
    * milliseconds from `ts`, then version `7` and RFC 9562 variant, with
    * the random tail derived from the seed column.
    */
  def uuidV7Seeded(ts: Column, seed: Column): Column = {
    // cast: parquet timestamps read back NTZ; the UTC session makes the
    // NTZ→instant cast the same epoch the oracle's epoch_ms computes
    val msHex = lpad(hex(unix_millis(ts.cast("timestamp"))), 12, "0")
    val h = md5(seed.cast("string"))
    val variant = element_at(array(lit("8"), lit("9"), lit("a"), lit("b")),
      (pmod(conv(substring(h, 17, 1), 16, 10).cast("long"), lit(4L)) + 1).cast("int"))
    concat(lower(substring(msHex, 1, 8)), lit("-"), lower(substring(msHex, 9, 4)),
      lit("-7"), substring(h, 1, 3), lit("-"), variant, substring(h, 4, 3),
      lit("-"), substring(h, 7, 12))
  }

  /** VRL `parse_ruby_hash` (parse_ruby_hash.cue): a string-keyed Ruby hash
    * literal `{"k" => v, ...}` rewritten to JSON (`"k" => ` → `"k": `), so
    * the JSON accessors take over — the reference parses into the same
    * object model.
    */
  def rubyHashToJson(c: Column): Column =
    regexp_replace(c, "\"\\s*=>\\s*", "\": ")

  /** VRL `parse_influxdb` (parse_influxdb.cue) — InfluxDB line protocol
    * `measurement,tag=v,... field=v,... timestamp`. Tag/field sets come
    * back as maps; the timestamp is epoch nanoseconds.
    */
  def parseInfluxMeasurement(c: Column): Column =
    regexp_extract(c, "^([^,\\s]+)", 1)
  def parseInfluxTags(c: Column): Column =
    str_to_map(regexp_extract(c, "^[^,\\s]+,([^ ]*)", 1), lit(","), lit("="))
  def parseInfluxFields(c: Column): Column =
    str_to_map(regexp_extract(c, "^[^ ]+ ([^ ]+)", 1), lit(","), lit("="))
  def parseInfluxTimestamp(c: Column): Column =
    nullif(regexp_extract(c, " (\\d+)$", 1), lit("")).cast("long")

  /** Fixed-schema avro binary encode/decode over the classpath avro core
    * (lib/codecs/src/decoding/format/avro.rs) — see [[AvroEncode]]/
    * [[AvroDecode]]. Decode is fallible → NULL struct on malformed datums.
    */
  def encodeAvro(c: Column, schemaJson: String): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(AvroEncode(Bridge.expression(c), schemaJson))
  }
  def decodeAvro(c: Column, schemaJson: String): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(AvroDecode(Bridge.expression(c), schemaJson))
  }

  // ---------------- syslog helpers ----------------

  /** `to_syslog_level`: severity code → level name (RFC 5424). */
  def toSyslogLevel(sev: Column): Column =
    when(sev === 0, "emerg").when(sev === 1, "alert").when(sev === 2, "crit")
      .when(sev === 3, "err").when(sev === 4, "warning").when(sev === 5, "notice")
      .when(sev === 6, "info").when(sev === 7, "debug")

  /** `to_syslog_severity`: level name → code. */
  def toSyslogSeverity(level: Column): Column =
    when(level === "emerg", 0).when(level === "alert", 1).when(level === "crit", 2)
      .when(level === "err", 3).when(level === "warning", 4).when(level === "notice", 5)
      .when(level === "info", 6).when(level === "debug", 7)

  /** `to_syslog_facility_code`: priority = facility*8 + severity. */
  def syslogFacility(pri: Column): Column = (pri / 8).cast("int")
  def syslogSeverityFromPri(pri: Column): Column = pri % 8

  /** `to_syslog_facility` (to_syslog_facility.cue: 4 → "auth"): facility
    * code → RFC 3164 keyword. Out-of-range → null (fallible in VRL).
    */
  def toSyslogFacilityName(code: Column): Column = {
    val names = Seq("kern", "user", "mail", "daemon", "auth", "syslog",
      "lpr", "news", "uucp", "cron", "authpriv", "ftp", "ntp", "security",
      "console", "solaris-cron", "local0", "local1", "local2", "local3",
      "local4", "local5", "local6", "local7")
    // try_element_at: out-of-range → null even under ANSI mode
    try_element_at(array(names.map(lit): _*),
      when(code >= 0, code.cast("int") + 1).otherwise(lit(9999)))
  }

  // ---------------- encode_* ----------------

  /** `encode_logfmt` for given (key, column) pairs. */
  def encodeLogfmt(fields: Seq[(String, Column)]): Column =
    concat_ws(" ", fields.map { case (k, v) => concat(lit(k + "="), v.cast("string")) }: _*)

  /** `encode_csv` (unquoted subset). */
  def encodeCsv(cols: Seq[Column]): Column = concat_ws(",", cols.map(_.cast("string")): _*)

  /** `encode_cef` (ArcSight CEF header + extension key=values). */
  def encodeCef(vendor: String, product: String, version: String,
                signature: Column, name: Column, severity: Column,
                ext: Seq[(String, Column)]): Column =
    concat(lit(s"CEF:0|$vendor|$product|$version|"), signature, lit("|"), name,
      lit("|"), severity.cast("string"), lit("|"),
      encodeLogfmt(ext))

  /** `parse_xml` subset via XPath (Spark's xpath_* functions). */
  def xpathStr(xml: Column, path: String): Column = xpath_string(xml, lit(path))
  def xpathLong(xml: Column, path: String): Column = xpath_long(xml, lit(path))

  // ---------------- parse_user_agent ----------------
  // (reference: website/cue/reference/remap/functions/parse_user_agent.cue —
  //  the reference wraps the woothee/uap family; this is the regex-heuristic
  //  subset covering the major engine/OS families, engine-portable regexes)

  def uaBrowserFamily(ua: Column): Column =
    when(ua.rlike("(?i)bot|crawler|spider|curl|wget"), "bot")
      .when(ua.contains("Edg/") || ua.contains("Edge/"), "Edge")
      .when(ua.contains("OPR/") || ua.contains("Opera"), "Opera")
      .when(ua.contains("Firefox/"), "Firefox")
      .when(ua.contains("Chrome/"), "Chrome")
      .when(ua.contains("Safari/") && ua.contains("Version/"), "Safari")
      .when(ua.contains("MSIE") || ua.contains("Trident/"), "IE")
      .otherwise("other")

  def uaBrowserVersion(ua: Column): Column = {
    val v = (re: String) => nullif(regexp_extract(ua, re, 1), lit(""))
    when(uaBrowserFamily(ua) === "Edge", coalesce(v("Edge?/(\\d+[.\\d]*)")))
      .when(uaBrowserFamily(ua) === "Opera", coalesce(v("OPR/(\\d+[.\\d]*)"), v("Opera[/ ](\\d+[.\\d]*)")))
      .when(uaBrowserFamily(ua) === "Firefox", v("Firefox/(\\d+[.\\d]*)"))
      .when(uaBrowserFamily(ua) === "Chrome", v("Chrome/(\\d+[.\\d]*)"))
      .when(uaBrowserFamily(ua) === "Safari", v("Version/(\\d+[.\\d]*)"))
      .when(uaBrowserFamily(ua) === "IE", v("MSIE (\\d+[.\\d]*)"))
  }

  def uaOsFamily(ua: Column): Column =
    when(ua.contains("Windows"), "Windows")
      .when(ua.contains("Android"), "Android") // before Linux: Android UAs carry "Linux"
      .when(ua.contains("iPhone") || ua.contains("iPad"), "iOS")
      .when(ua.contains("Mac OS X"), "macOS")
      .when(ua.contains("Linux"), "Linux")
      .otherwise("other")

  def uaDeviceCategory(ua: Column): Column =
    when(ua.rlike("(?i)bot|crawler|spider|curl|wget"), "bot")
      .when(ua.contains("iPad") || ua.contains("Tablet"), "tablet")
      .when(ua.contains("Mobile") || ua.contains("iPhone") || ua.contains("Android"), "mobile")
      .otherwise("desktop")

  // ---------------- parse_cef (decode side; encode is encodeCef) ----------------
  // (reference: lib/codecs decoding + website/.../parse_cef.cue — pipe-
  //  delimited 7-field header, then a key=value extension block)

  private def cefHeader(c: Column, i: Int): Column =
    regexp_extract(c,
      "^CEF:(\\d+)\\|([^|]*)\\|([^|]*)\\|([^|]*)\\|([^|]*)\\|([^|]*)\\|([^|]*)\\|(.*)$", i)

  def cefVersion(c: Column): Column = cefHeader(c, 1).cast("int")
  def cefVendor(c: Column): Column = cefHeader(c, 2)
  def cefProduct(c: Column): Column = cefHeader(c, 3)
  def cefDeviceVersion(c: Column): Column = cefHeader(c, 4)
  def cefSignature(c: Column): Column = cefHeader(c, 5)
  def cefName(c: Column): Column = cefHeader(c, 6)
  def cefSeverity(c: Column): Column = cefHeader(c, 7).cast("int")
  /** Extension block as a map (unescaped subset — space-separated k=v). */
  def cefExtension(c: Column): Column = str_to_map(cefHeader(c, 8), lit(" "), lit("="))

  // ---------------- parse_etld ----------------
  // (reference: website/cue/reference/remap/functions/parse_etld.cue — the
  //  reference ships the full Mozilla public-suffix list; this embeds a
  //  representative subset, longest-suffix-first matching)

  /** Multi-label public suffixes checked before the plain TLD fallback. */
  val PublicSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "github.io", "s3.amazonaws.com")

  /** `parse_etld`: the effective TLD of a hostname (longest match over the
    * embedded suffix set, else the final label).
    */
  def parseEtld(host: Column): Column = {
    val ordered = PublicSuffixes.sortBy(-_.count(_ == '.'))
    ordered.foldRight(regexp_extract(host, "\\.([^.]+)$", 1)) { (s, acc) =>
      when(host.endsWith("." + s), lit(s)).otherwise(acc)
    }
  }

  /** `parse_etld` with plus_parts=1: registrable domain (eTLD+1). */
  def parseEtldPlusOne(host: Column): Column = {
    val ordered = PublicSuffixes.sortBy(-_.count(_ == '.'))
    val fallback = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    ordered.foldRight(fallback) { (s, acc) =>
      val q = java.util.regex.Pattern.quote(s)
      when(host.endsWith("." + s),
        regexp_extract(host, s"([^.]+\\.$q)$$", 1)).otherwise(acc)
    }
  }

  // ---------------- wave-7 long tail ----------------
  // path functions, array/string predicates, int formatting, key-value
  // encode, ip_pton/ntop, seeded random_*, cbor, unflatten

  /** `basename` (basename.cue): final path component, Unix `basename`
    * rules — trailing separators ignored, `basename("/") == "/"`.
    */
  def basenameP(c: Column): Column = {
    val t = regexp_replace(c, "/+$", "")
    when(t === "", when(c.startsWith("/"), lit("/")).otherwise(lit("")))
      .otherwise(regexp_extract(t, "([^/]+)$", 1))
  }

  /** `dirname` (dirname.cue): path minus its final component, Unix
    * `dirname` rules (`"."` for bare names, `"/"` for root children).
    */
  def dirnameP(c: Column): Column = {
    val t = regexp_replace(c, "/+$", "")
    val parent = regexp_replace(t, "/+[^/]+$", "")
    when(!t.contains("/"), when(c.startsWith("/"), lit("/")).otherwise(lit(".")))
      .otherwise(when(parent === "", lit("/")).otherwise(parent))
  }

  /** `split_path` (split_path.cue): path → component array; absolute
    * paths lead with a `"/"` element (`["/", "home", "user"]`).
    */
  def splitPath(c: Column): Column = {
    val comps = filter(split(c, "/"), x => x =!= "")
    when(c.startsWith("/"), concat(array(lit("/")), comps)).otherwise(comps)
  }

  /** `contains_all` (contains_all.cue): string contains every substring. */
  def containsAll(c: Column, subs: Seq[String]): Column =
    subs.map(c.contains).reduce(_ && _)

  /** `includes` (includes.cue): array membership. */
  def includesA(arr: Column, item: Column): Column = array_contains(arr, item)

  /** `match_any` (match_any.cue): string matches at least one pattern. */
  def matchAny(c: Column, patterns: Seq[String]): Column =
    patterns.map(c.rlike).reduce(_ || _)

  /** `match_array` (match_array.cue): some / every element matches. */
  def matchArraySome(arr: Column, re: String): Column =
    exists(arr, _.rlike(re))
  def matchArrayAll(arr: Column, re: String): Column =
    forall(arr, _.rlike(re))

  /** `object_from_array` (object_from_array.cue), pair-of-arrays form. */
  def objectFromArrays(keys: Column, values: Column): Column =
    map_from_arrays(keys, values)

  /** `format_int` (format_int.cue): integer → string in the given base,
    * lowercase digits, sign-prefixed (`format_int!(-42, 16) == "-2a"` —
    * NOT two's-complement, unlike bare `conv`).
    */
  def formatInt(c: Column, base: Int): Column =
    when(c < 0, concat(lit("-"), lower(conv((-c).cast("string"), 10, base))))
      .otherwise(lower(conv(c.cast("string"), 10, base)))

  /** `parse_int` with radix (parse_int.cue): string in base → long. */
  def parseIntRadix(c: Column, base: Int): Column =
    conv(c, base, 10).cast("long")

  /** `parse_float` (parse_float.cue): fallible string → double. */
  def parseFloat(c: Column): Column = c.cast("double")

  /** `to_bool` (to_bool.cue) over strings: true/t/yes/y/1 → true,
    * false/f/no/n/0 → false, anything else null (fallible).
    */
  def toBoolV(c: Column): Column = {
    val l = lower(trim(c))
    when(l.isin("true", "t", "yes", "y", "1"), lit(true))
      .when(l.isin("false", "f", "no", "n", "0"), lit(false))
      .otherwise(lit(null).cast("boolean"))
  }

  /** `decode_base16` (decode_base16.cue) — partner of [[encodeBase16]]. */
  def decodeBase16(c: Column): Column = unhex(c).cast("string")

  /** `encode_key_value` (encode_key_value.cue): object → delimited
    * key-value text. Keys sort (VRL objects are ordered maps — the cue
    * example emits `lvl… msg… ts…` for insertion order ts,msg,lvl);
    * values containing the field delimiter are double-quoted.
    */
  def encodeKeyValue(fields: Seq[(String, Column)], kvDelim: String = "=",
                     fieldDelim: String = " "): Column =
    concat_ws(fieldDelim, fields.sortBy(_._1).map { case (k, v) =>
      val s = v.cast("string")
      concat(lit(k + kvDelim),
        when(s.contains(fieldDelim), concat(lit("\""), s, lit("\""))).otherwise(s))
    }: _*)

  /** `ip_pton` / `ip_ntop` (ip_pton.cue, ip_ntop.cue): native
    * expressions — text ↔ network-order bytes (4 for v4, 16 for v6).
    */
  def ipPton(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(IpPton(Bridge.expression(c)))
  }
  def ipNtop(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(IpNtop(Bridge.expression(c)))
  }

  /** `is_ipv6` (is_ipv6.cue); `is_ipv4` lives in the IP section. */
  def isIpv6(c: Column): Column = c.contains(":") && ipPton(c).isNotNull

  /** Seeded deterministic `random_bool`/`random_int`/`random_float`
    * (random_bool.cue etc. are random; replay-stable pipelines derive
    * the draw from a seed column — same policy as [[uuidV4Seeded]]).
    * The 15-hex-digit md5 prefix is the shared Spark↔oracle h15 hash.
    */
  private def h15(seed: Column): Column =
    conv(substring(md5(seed.cast("string")), 1, 15), 16, 10).cast("long")
  def randomBoolSeeded(seed: Column): Column = pmod(h15(seed), lit(2L)) === 1L
  def randomIntSeeded(seed: Column, min: Long, max: Long): Column =
    pmod(h15(seed), lit(max - min)) + min // [min, max) per the cue
  def randomFloatSeeded(seed: Column, min: Double, max: Double): Column =
    (h15(seed).cast("double") / lit(1.152921504606847e18)) * (max - min) + min // h15/2^60 ∈ [0,1)

  /** `random_bytes` (random_bytes.cue), seeded-deterministic like the
    * other random_* ports: an md5 counter-mode chain over the seed gives
    * 16 bytes per block; slice to n (≤ 64 keeps it to 4 blocks).
    */
  def randomBytesSeeded(seed: Column, n: Int): Column = {
    require(n >= 1 && n <= 64, s"random_bytes length $n outside 1..64")
    val blocks = (0 until (n + 15) / 16)
      .map(i => unhex(md5(concat(seed.cast("string"), lit(":" + i)))))
    substring(concat(blocks: _*), 1, n)
  }

  /** `is_nullish` (is_nullish.cue): null, "", whitespace-only (incl.
    * \n/\t — Spark's `trim` only strips spaces, so regex), or exactly "-".
    */
  def isNullish(c: Column): Column = {
    val s = c.cast("string")
    c.isNull || s.rlike("^\\s*$") || s === "-"
  }

  /** `parse_cbor` / the encode roundtrip partner (parse_cbor.cue; RFC
    * 8949 from scratch — see [[Cbor]]). JSON in/out, fallible → null.
    */
  def parseCbor(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(CborDecode(Bridge.expression(c)))
  }
  def encodeCbor(jsonC: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(CborEncode(Bridge.expression(jsonC)))
  }

  /** `parse_proto` / `encode_proto` (parse_proto.cue, encode_proto.cue):
    * schema-driven protobuf wire-format codec built from the public
    * encoding spec — see [[ProtoWire]]. JSON in/out, fallible → null.
    */
  def parseProto(c: Column, schema: Seq[ProtoField]): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(ProtoDecode(Bridge.expression(c), schema))
  }
  def encodeProto(jsonC: Column, schema: Seq[ProtoField]): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(ProtoEncode(Bridge.expression(jsonC), schema))
  }

  /** OTLP logs decode/encode (public opentelemetry-proto logs.proto over
    * the wire-format codec) — see [[Otlp]]. JSON in/out, fallible → null.
    */
  def parseOtlpLogs(c: Column): Column = parseProto(c, Otlp.LogsData)
  def encodeOtlpLogs(jsonC: Column): Column = encodeProto(jsonC, Otlp.LogsData)

  /** `parse_dnstap` (parse_dnstap.cue): dnstap protobuf envelope + RFC
    * 1035/6891/8914 DNS wire decode — see [[graft.parse.Dnstap]].
    */
  def parseDnstap(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.parse.DnstapParse(Bridge.expression(c)))
  }

  /** `tag_types_externally` (tag_types_externally.cue) over a JSON doc. */
  def tagTypesExternally(jsonC: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(TagTypesExternally(Bridge.expression(jsonC)))
  }

  /** `validate_json_schema` (validate_json_schema.cue): core-keyword
    * subset, inline schema JSON — see [[ValidateJsonSchema]].
    */
  def validateJsonSchema(jsonC: Column, schemaJson: String,
                         ignoreUnknownFormats: Boolean = false): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(ValidateJsonSchema(Bridge.expression(jsonC), schemaJson,
      ignoreUnknownFormats))
  }

  /** `replace_with` (replace_with.cue): closure-based regex rewrite —
    * see [[RegexReplaceWith]].
    */
  def replaceWith(c: Column, regex: String,
                  fn: (String, Seq[String]) => String,
                  count: Int = -1): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(RegexReplaceWith(Bridge.expression(c), regex, fn, count))
  }

  /** `uuid_from_friendly_id` (uuid_from_friendly_id.cue): base62 → UUID. */
  def uuidFromFriendlyId(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(UuidFromFriendlyId(Bridge.expression(c)))
  }

  /** `unflatten` (unflatten.cue): dotted-key JSON object → nested. */
  def unflattenJson(c: Column, separator: String = "."): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(UnflattenJson(Bridge.expression(c), separator))
  }

  /** `is_json` (is_json.cue): does the string parse as JSON? Via the
    * CBOR encoder's JSON front-end (null ⇔ unparseable) — total.
    */
  def isJson(c: Column): Column = encodeCbor(c).isNotNull

  /** `get_env_var` / `get_hostname` / `get_timezone_name` (driver-side
    * constants, resolved once at plan time — the reference resolves them
    * once per event; both are run-constant).
    */
  def getEnvVar(name: String): Column =
    sys.env.get(name).map(lit).getOrElse(lit(null).cast("string"))
  def getHostname(): Column = lit(java.net.InetAddress.getLocalHost.getHostName)
  def getTimezoneName(): Column = current_timezone()

  /** `assert_eq` (assert_eq.cue): boolean column for the error lane —
    * pair with `Remap.abortWhen(!assertEq(...))` for the abort path.
    */
  def assertEq(a: Column, b: Column): Column = a === b

  // ---- wave 9: type-introspection tail over the JSON-variant value form
  // (is_integer.cue, is_string.cue, to_regex.cue; is_timestamp / is_regex
  // are STATIC schema facts in a typed engine — see isTimestampField).

  /** VRL type name of a JSON-rendered value — the variant form the other
    * JSON ports (parse_json / tag_types_externally) use: "null",
    * "boolean", "integer", "float", "string", "array", "object"; null on
    * unparseable input. Pure when-chain on the trimmed literal head, so it
    * stays in whole-stage codegen.
    */
  def jsonTypeOf(c: Column): Column = {
    val s = trim(c.cast("string"))
    when(c.isNull, lit(null).cast("string"))
      .when(s === "null", "null")
      .when(s === "true" || s === "false", "boolean")
      .when(s.rlike("^-?[0-9]+$"), "integer")
      .when(s.rlike("^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"), "float")
      .when(s.startsWith("\"") && isJson(s), "string")
      .when(s.startsWith("[") && isJson(s), "array")
      .when(s.startsWith("{") && isJson(s), "object")
      .otherwise(lit(null).cast("string"))
  }

  /** `is_integer` / `is_float` / `is_string` / `is_boolean` /
    * `is_array` / `is_object` / `is_null` (is_*.cue) over the JSON-variant
    * form: type-name equality on [[jsonTypeOf]].
    */
  def isType(c: Column, tname: String): Column =
    coalesce(jsonTypeOf(c) === tname, lit(false))

  /** `is_timestamp` / `is_regex` (is_timestamp.cue, is_regex.cue): in VRL
    * these test the runtime type of a variant value; in Spark, column
    * types are schema facts known at plan time — so the honest port is a
    * static check, not a per-row expression.
    */
  def isTimestampField(df: org.apache.spark.sql.DataFrame, name: String): Boolean =
    df.schema(name).dataType == org.apache.spark.sql.types.TimestampType

  /** `to_regex` (to_regex.cue): fallible coercion of a string into a
    * regex — returns the pattern when it compiles, null otherwise (the
    * cue example's `to_regex(...) ?? r''` fallback shape). The compiled
    * check needs Pattern.compile per distinct value — see [[ToRegex]];
    * pair with `rlike(col, pattern)` only on non-null results.
    */
  def toRegex(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(ToRegex(Bridge.expression(c)))
  }

  /** `match_datadog_query` (match_datadog_query.cue): the reference
    * evaluates a Datadog-search query against the event; here the query
    * compiles ONCE at plan time to a pushdown-friendly Catalyst predicate
    * — see [[graft.conditions.DatadogSearch.compile]]. This alias exists
    * so the VRL surface names it; the compiled form is strictly stronger
    * (static compile + scan pushdown vs per-event interpretation).
    */
  def matchDatadogQuery(query: String, defaultField: String): Column =
    graft.conditions.DatadogSearch.compile(query, defaultField)
}
