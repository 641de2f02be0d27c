package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The tokenized-sequence row (BASELINE.json input_hint):
  * `(doc_id string, tokens array<int32>, n_tok int32, source string)`.
  */
final case class TokenSeq(doc_id: String, tokens: Array[Int], n_tok: Int, source: String)

/** Per-source enrichment attributes (FIXTURES.md §2 — analog of the
  * reference's file/memory enrichment tables,
  * src/enrichment_tables/file.rs:67-126).
  */
final case class SourceAttrs(source: String, region: String, priority: Int,
                             pii: Boolean, quota_toks: Long)

/** Deterministic 64-bit mixing (public splitmix64 finalizer constants).
  * Shared between the distributed generator and the single-threaded oracle
  * so generated content is byte-identical at any parallelism level
  * (SURVEY.md §7 risk 2).
  */
object Mix {
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  /** Non-negative bounded hash of (seed, a, b). */
  def bounded(seed: Long, a: Long, b: Long, n: Int): Int =
    (((mix64(mix64(seed ^ a) ^ b) >>> 1) % n)).toInt
}

/** Generator config. `maxTok` is scaled down for throughput benches (token
  * payload dominates IO); correctness runs use the FIXTURES.md default.
  */
final case class GenConfig(rows: Long, maxTok: Int = 2048, vocab: Int = 50257,
                           parts: Int = 32) {
  require(rows > 0 && maxTok > 0)
}

/** Deterministic synthetic tokenseq + source_attrs generator (FIXTURES.md §1-2).
  *
  * Mirrors the reference's seeded load generators
  * (regression/cases/&#42;/lading/lading.yaml): all content is a pure function
  * of the row index, so output is identical at local[2] / local[8] /
  * local[32] — required for the N-vs-4N scaling bench and the oracle
  * equality checks.
  *
  * Skew: `web` holds ~50% of rows (hot source, exercises salting);
  * ~0.1% of rows get source `ghost` which is absent from source_attrs
  * (exercises the enrich-miss dropped lane).
  */
object Gen {
  val Sources: Vector[String] = Vector("web", "books", "code", "wiki", "chat", "forum")
  // cumulative per-mille weights: web .50, books .20, code .12, wiki .08, chat .06, forum .04
  private val Cum: Vector[Int] = Vector(500, 700, 820, 900, 960, 1000)
  val GhostSource = "ghost" // present in data, missing from source_attrs

  val Epoch: java.time.LocalDate = java.time.LocalDate.of(2026, 1, 1)

  def sourceOf(id: Long): String = {
    val h = Mix.bounded(0x5EED, id, 1, 1000)
    if (h == 999) GhostSource else Sources(Cum.indexWhere(h < _))
  }

  /** Pure row function — shared with [[graft.pipeline.Oracle]]. */
  def rowOf(id: Long, cfg: GenConfig): TokenSeq = {
    val source = sourceOf(id)
    val tenant = "t" + Mix.bounded(0x7E4A, id, 2, 50)
    val shard = Mix.bounded(0x54A2, id, 3, 16)
    val day = Mix.bounded(0xDA7E, id, 4, 30)
    val date = Epoch.plusDays(day.toLong)
    val dateStr = f"${date.getYear}%04d${date.getMonthValue}%02d${date.getDayOfMonth}%02d"
    val docId = f"$source%s/$tenant%s/$shard%04d/$dateStr%s/$id%012d"
    val nTok = 1 + Mix.bounded(0x70C5, id, 5, cfg.maxTok)
    val seed = Mix.mix64(id ^ 0x7EAFC0DEL)
    val tokens = new Array[Int](nTok)
    var j = 0
    while (j < nTok) { tokens(j) = ((Mix.mix64(seed + j) >>> 1) % cfg.vocab).toInt; j += 1 }
    TokenSeq(docId, tokens, nTok, source)
  }

  /** Distributed generation: `spark.range` → narrow map. No shuffle; content
    * depends only on `id`, never on partitioning.
    */
  def tokenseq(spark: SparkSession, cfg: GenConfig): Dataset[TokenSeq] = {
    import spark.implicits._
    spark.range(0, cfg.rows, 1, cfg.parts).as[Long].map(Gen.rowOf(_, cfg))
  }

  /** The broadcastable per-source lookup table (FIXTURES.md §2). */
  def sourceAttrsRows: Seq[SourceAttrs] = Seq(
    SourceAttrs("web", "us-east", 1, pii = false, quota_toks = 1000000000L),
    SourceAttrs("books", "us-west", 2, pii = false, quota_toks = 500000000L),
    SourceAttrs("code", "eu-west", 3, pii = false, quota_toks = 300000000L),
    SourceAttrs("wiki", "us-east", 2, pii = false, quota_toks = 200000000L),
    SourceAttrs("chat", "eu-west", 2, pii = true, quota_toks = 100000000L),
    SourceAttrs("forum", "ap-south", 3, pii = true, quota_toks = 50000000L))

  def sourceAttrs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    sourceAttrsRows.toDF()
  }
}
