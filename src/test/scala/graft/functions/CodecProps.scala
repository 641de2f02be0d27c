package graft.functions

import org.scalacheck.{Gen => SGen, Prop, Properties}

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
}
