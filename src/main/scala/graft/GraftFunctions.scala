package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions._
import graft.sketch.{BloomMightContain, BloomSketchAgg, CountMinAgg, CountMinEstimate}

/** SQL registration of the library's native Catalyst expressions — the
  * surface that lets a `spark.sql(...)` user (or a notebook) call the
  * graft kernels without touching the Scala column API, the way the
  * reference exposes its stdlib to VRL programs (SURVEY §2.5).
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    ([[GraftExtensions]] — the `SparkSessionExtensions` path);
  *  - [[GraftFunctions.register]]`(spark)` on a live session (notebooks,
  *    tests).
  *
  * Config-style parameters (gram sizes, sketch widths, codec names) must
  * be FOLDABLE literals — they parameterize codegen, exactly like the
  * column API's plain-Scala arguments; a non-literal raises an analysis
  * error rather than silently evaluating row-wise.
  */
object GraftFunctions {

  private def intArg(fn: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn: expected a literal integer argument, got $e")
  }

  /** SQL integer literals arrive as INT; the sketch kernels take BIGINT
    * keys — insert the cast the column API's `.cast("long")` applies.
    */
  private def asLong(e: Expression): Expression = e.dataType match {
    case LongType => e
    case _ => Cast(e, LongType)
  }

  private def strArg(fn: String, e: Expression): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case _ => throw new IllegalArgumentException(
      s"$fn: expected a literal string argument, got $e")
  }

  /** name → (expression class for doc info, builder). */
  val functions: Seq[(String, (Class[_], Seq[Expression] => Expression))] = Seq(
    "shannon_entropy" -> (classOf[ShannonEntropy],
      (es: Seq[Expression]) => ShannonEntropy(es.head)),
    "seahash" -> (classOf[Seahash],
      (es: Seq[Expression]) => Seahash(es.head)),
    "sha3" -> (classOf[Sha3], (es: Seq[Expression]) =>
      Sha3(es.head, if (es.size > 1) intArg("sha3", es(1)) else 256)),
    "normalize_unicode" -> (classOf[NormalizeUnicode], (es: Seq[Expression]) =>
      NormalizeUnicode(es.head,
        if (es.size > 1) strArg("normalize_unicode", es(1)) else "NFC")),
    "percent_encode" -> (classOf[PercentEncode], (es: Seq[Expression]) =>
      if (es.size > 1) PercentEncode(es.head, strArg("percent_encode", es(1)))
      else PercentEncode(es.head)),
    "percent_decode" -> (classOf[PercentDecode],
      (es: Seq[Expression]) => PercentDecode(es.head)),
    "punycode_encode" -> (classOf[Punycode],
      (es: Seq[Expression]) => Punycode(es.head, encode = true)),
    "punycode_decode" -> (classOf[Punycode],
      (es: Seq[Expression]) => Punycode(es.head, encode = false)),
    "ip_pton" -> (classOf[IpPton], (es: Seq[Expression]) => IpPton(es.head)),
    "ip_ntop" -> (classOf[IpNtop], (es: Seq[Expression]) => IpNtop(es.head)),
    "decode_mime_q" -> (classOf[DecodeMimeQ],
      (es: Seq[Expression]) => DecodeMimeQ(es.head)),
    "unflatten_json" -> (classOf[UnflattenJson], (es: Seq[Expression]) =>
      if (es.size > 1) UnflattenJson(es.head, strArg("unflatten_json", es(1)))
      else UnflattenJson(es.head)),
    "compress" -> (classOf[Compress], (es: Seq[Expression]) =>
      Compress(es.head, strArg("compress", es(1)))),
    "decompress" -> (classOf[Decompress], (es: Seq[Expression]) =>
      Decompress(es.head, strArg("decompress", es(1)))),
    "cbor_encode" -> (classOf[CborEncode],
      (es: Seq[Expression]) => CborEncode(es.head)),
    "cbor_decode" -> (classOf[CborDecode],
      (es: Seq[Expression]) => CborDecode(es.head)),
    "word_shingles" -> (classOf[WordShingles], (es: Seq[Expression]) =>
      WordShingles(es.head, intArg("word_shingles", es(1)))),
    "winnow_fingerprints" -> (classOf[WinnowFingerprints], (es: Seq[Expression]) =>
      WinnowFingerprints(es.head,
        if (es.size > 1) intArg("winnow_fingerprints", es(1)) else graft.tokens.Winnow.K,
        if (es.size > 2) intArg("winnow_fingerprints", es(2)) else graft.tokens.Winnow.W)),
    "token_content_hash" -> (classOf[TokenContentHash],
      (es: Seq[Expression]) => TokenContentHash(es.head)),
    "top_bigram_count" -> (classOf[TopBigramCount],
      (es: Seq[Expression]) => TopBigramCount(es.head)),
    "bpe_merge" -> (classOf[BpeMerge], (es: Seq[Expression]) =>
      BpeMerge(es.head, intArg("bpe_merge", es(1)),
        intArg("bpe_merge", es(2)), intArg("bpe_merge", es(3)))),
    "bloom_sketch" -> (classOf[BloomSketchAgg], (es: Seq[Expression]) =>
      BloomSketchAgg(asLong(es.head),
        if (es.size > 1) intArg("bloom_sketch", es(1)).toLong else 1L << 22,
        if (es.size > 2) intArg("bloom_sketch", es(2)) else 3)),
    "bloom_might_contain" -> (classOf[BloomMightContain], (es: Seq[Expression]) =>
      BloomMightContain(es.head, asLong(es(1)),
        if (es.size > 2) intArg("bloom_might_contain", es(2)) else 3)),
    "count_min" -> (classOf[CountMinAgg], (es: Seq[Expression]) =>
      CountMinAgg(asLong(es.head), intArg("count_min", es(1)), intArg("count_min", es(2)))),
    "count_min_estimate" -> (classOf[CountMinEstimate], (es: Seq[Expression]) =>
      CountMinEstimate(es.head, asLong(es(1)), intArg("count_min_estimate", es(2)))))

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, null, name)

  /** Register every graft function into a LIVE session's registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, (clazz, builder)) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name, clazz), builder)
    }

  /** Apply to a [[SparkSessionExtensions]] (the `spark.sql.extensions`
    * injection path used by [[GraftExtensions]]).
    */
  def inject(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, (clazz, builder)) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, clazz), builder))
    }
}

/** `spark.sql.extensions=graft.GraftExtensions` — session-build-time
  * registration of the full function surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
