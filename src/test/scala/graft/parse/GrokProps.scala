package graft.parse

import org.scalacheck.{Gen => SGen, Prop, Properties}

import graft.core.{Gen, GenConfig, Mix}
import graft.multimodal.Multimodal.StubCodec

/** ScalaCheck properties for the pure-JVM pieces (no SparkSession):
  * grok compile/extract, generator determinism, stub codec round trip.
  */
object GrokProps extends Properties("graft") {

  private val word = SGen.nonEmptyListOf(SGen.alphaLowerChar).map(_.mkString)
  private val posInt = SGen.chooseNum(0, 1000000)

  property("grok extracts every field it compiled") = Prop.forAll(word, word, posInt) {
    (a, b, n) =>
      val c = Grok.compile("%{WORD:x}/%{WORD:y}/%{INT:n:int}")
      c.extract(s"$a/$b/$n").contains(Map("x" -> a, "y" -> b, "n" -> n.toString))
  }

  property("grok rejects non-matching input (anchored)") = Prop.forAll(word) { a =>
    val c = Grok.compile("%{INT:n}")
    c.extract(s"x$a").isEmpty
  }

  property("generator row content is a pure function of id") = Prop.forAll(
    SGen.chooseNum(0L, 1000000L)) { id =>
    val cfg = GenConfig(rows = Long.MaxValue, maxTok = 64)
    val (a, b) = (Gen.rowOf(id, cfg), Gen.rowOf(id, cfg))
    a.doc_id == b.doc_id && a.tokens.sameElements(b.tokens) && a.source == b.source
  }

  property("mix64 bounded hash stays in range") = Prop.forAll(
    SGen.chooseNum(Long.MinValue, Long.MaxValue), SGen.chooseNum(1, 1000)) { (x, n) =>
    val h = Mix.bounded(0xABCD, x, 1, n)
    h >= 0 && h < n
  }

  property("stub codec round-trips dims and payload") = Prop.forAll(
    SGen.chooseNum(0L, 100000L), SGen.chooseNum(1, 32), SGen.chooseNum(1, 32)) {
    (id, w, h) =>
      val enc = StubCodec.encode(id, "image", w, h, 0, 1)
      val (kind, w2, h2, _, frames, body) = StubCodec.decode(enc)
      kind == "image" && w2 == w && h2 == h && body.length == w * h * frames
  }
}
