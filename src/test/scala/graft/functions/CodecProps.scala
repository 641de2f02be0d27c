package graft.functions

import org.scalacheck.{Gen => SGen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the pure-JVM codec cores (no SparkSession):
  * percent-encoding roundtrip/idempotence across the whole ascii-set
  * lattice, CBOR JSON roundtrip on scalars, to_regex compile-verdict
  * consistency.
  */
object CodecProps extends Properties("codecs") {

  private val anyString: SGen[String] = SGen.listOf(SGen.frequency(
    5 -> SGen.asciiPrintableChar,
    1 -> SGen.choose(0x20.toChar, 0x7ff.toChar), // multi-byte UTF-8
    1 -> SGen.oneOf('%', '+', ' ', '\t', '"', '#', '?', '&', '~')
  )).map(_.mkString)

  private val sets = Seq("NON_ALPHANUMERIC", "CONTROLS", "FRAGMENT", "QUERY",
    "SPECIAL", "PATH", "USERINFO", "COMPONENT", "WWW_FORM_URLENCODED")

  // decode∘encode is identity exactly when '%' itself is in the encode
  // set (NON_ALPHANUMERIC/COMPONENT/WWW_FORM_URLENCODED) — otherwise a
  // literal '%XX' in the input is indistinguishable from an escape, the
  // same contract as the reference's percent-encoding crate.
  property("percent: decode∘encode is identity when '%' is encoded") =
    Prop.forAll(anyString, SGen.oneOf(Seq("NON_ALPHANUMERIC", "COMPONENT",
      "WWW_FORM_URLENCODED"))) { (s, set) =>
      Percent.dec(Percent.enc(s, set)) == s
    }

  property("percent: decode∘encode is identity for %-free input, every set") =
    Prop.forAll(anyString.map(_.filterNot(_ == '%')), SGen.oneOf(sets)) {
      (s, set) => Percent.dec(Percent.enc(s, set)) == s
    }

  property("percent: encoding with '%' in the set is injective-safe (re-encode idempotent modulo decode)") =
    Prop.forAll(anyString) { s =>
      // NON_ALPHANUMERIC encodes '%', so double-encode then double-decode
      val twice = Percent.enc(Percent.enc(s), "NON_ALPHANUMERIC")
      Percent.dec(Percent.dec(twice)) == s
    }

  property("percent: encoded output only contains unencoded-safe chars (default set)") =
    Prop.forAll(anyString) { s =>
      Percent.enc(s).forall(c =>
        c == '%' || (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9'))
    }

  property("percent: sets grow monotonically along the lattice") =
    Prop.forAll(anyString) { s =>
      // every char encoded by QUERY is encoded by PATH ⊂ USERINFO ⊂
      // COMPONENT ⊂ WWW_FORM_URLENCODED (longer or equal output)
      val chain = Seq("CONTROLS", "QUERY", "PATH", "USERINFO", "COMPONENT",
        "WWW_FORM_URLENCODED").map(Percent.enc(s, _).length)
      chain.zip(chain.tail).forall { case (a, b) => a <= b }
    }

  property("to_regex: verdict matches Pattern.compile, cached or not") =
    Prop.forAll(SGen.oneOf(Seq("^a+$", "([", "x{2,3}", "*dangling", "(?i)ok",
      "[z-a]", "\\d+", "(unclosed"))) { p =>
      val want =
        try { java.util.regex.Pattern.compile(p); true }
        catch { case _: java.util.regex.PatternSyntaxException => false }
      ToRegex.compiles(p) == want && ToRegex.compiles(p) == want // cache hit path
    }

  property("cbor: json scalar roundtrip") = Prop.forAll(
    SGen.oneOf[Any](SGen.chooseNum(-1000000L, 1000000L), SGen.alphaNumStr,
      SGen.oneOf(true, false))) { v =>
    val json = v match {
      case s: String => "\"" + s + "\""
      case other => other.toString
    }
    val enc = Cbor.encodeJson(json)
    enc != null && Cbor.decodeToJson(enc) == json
  }

  // ---- framing: encode a frame stream by each mode's own rule, decode
  // with FrameSplit, require the exact payload list back ----

  private val payloads: SGen[List[Array[Byte]]] =
    SGen.listOfN(5, SGen.listOf(SGen.choose(0.toByte, 127.toByte))
      .map(_.filterNot(b => b == '\n' || b == '|').toArray)).map(_.take(5))

  private def decoded(blob: Array[Byte], mode: String, delim: Byte = '\n'): List[List[Byte]] = {
    val a = FrameSplit.split(blob, mode, delim)
    if (a == null) null
    else (0 until a.numElements()).map(i => a.getBinary(i).toList).toList
  }

  property("framing: length4be / varint / octet / newline all roundtrip") =
    Prop.forAll(payloads) { ps =>
      val want = ps.map(_.toList)
      val l4 = ps.flatMap(p => Array[Byte](
        (p.length >> 24).toByte, (p.length >> 16).toByte,
        (p.length >> 8).toByte, p.length.toByte) ++ p).toArray
      // varint lengths stay < 128 for these sizes → single byte
      val vi = ps.flatMap(p => p.length.toByte +: p.toList).toArray
      val oct = ps.flatMap(p => s"${p.length} ".getBytes("US-ASCII") ++ p).toArray
      val nl = ps.flatMap(p => p.toList :+ '\n'.toByte).toArray
      (decoded(l4, "length4be") == want) :| "length4be" &&
      (decoded(vi, "varint") == want) :| "varint" &&
      (decoded(oct, "octet") == want) :| "octet" &&
      (ps.forall(_.nonEmpty) ==> ((decoded(nl, "newline") == want) :| "newline"))
    }

  // a truncated FINAL frame must reject the stream; the final payload must
  // be non-empty, else dropping one byte removes its length marker and
  // leaves a shorter but well-formed stream
  property("framing: truncated length-delimited stream is rejected, not mis-split") =
    Prop.forAll(payloads, SGen.nonEmptyListOf(SGen.choose(1.toByte, 127.toByte))) {
      (ps0, last) =>
        val ps = ps0 :+ last.toArray
        val vi = ps.flatMap(p => p.length.toByte +: p.toList).toArray
        decoded(vi.dropRight(1), "varint") == null
    }

  // ---- protobuf wire: schema-driven encode∘decode identity on a nested
  // message with repeated + zigzag fields ----

  private val protoSchema = Seq(
    ProtoField(1, "id", "int64"),
    ProtoField(2, "name", "string"),
    ProtoField(3, "vals", "int64", repeated = true),
    ProtoField(4, "nest", "message", message = Seq(
      ProtoField(1, "z", "sint64"))))

  property("proto: encode∘decode identity over the wire format") = Prop.forAll(
    SGen.chooseNum(-1000000L, 1000000L), SGen.alphaNumStr,
    SGen.listOfN(3, SGen.chooseNum(0L, 1000L)), SGen.chooseNum(-500L, 500L)) {
    (id, name, vals, z) =>
      val json = s"""{"id":$id,"name":"$name","vals":[${vals.mkString(",")}],"nest":{"z":$z}}"""
      val wire = ProtoWire.encodeJson(json, protoSchema)
      wire != null && ProtoWire.decodeToJson(wire, protoSchema) == json
  }
}
