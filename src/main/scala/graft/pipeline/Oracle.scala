package graft.pipeline

import graft.core.{Gen, GenConfig, SourceAttrs, TokenSeq}
import graft.parse.Grok

/** Single-threaded reference implementation of the pipeline semantics
  * (SURVEY.md §5 test plan; the analog of the reference's config unit-test
  * framework, src/config/unit_test/mod.rs). The Spark job must match this
  * row-for-row: per-sink (source → count, sum_n_tok) counters and the
  * routed (doc_id, tokens) sets — token-array equality per
  * BASELINE.json north_star.
  */
object Oracle {

  final case class RoutedRow(doc_id: String, tokens: Vector[Int], n_tok: Int, source: String)

  final case class Out(
      counters: Map[(String, String), (Long, Long)],      // (sink, source) -> (count, sum_n_tok)
      routed: Map[String, Vector[RoutedRow]],              // sink -> rows (sorted by doc_id)
      droppedByReason: Map[String, Long])

  def run(rows: Iterator[TokenSeq], attrs: Map[String, SourceAttrs],
          longMin: Int = 1024, exclusive: Boolean = false): Out = {
    val grok = TokenPipeline.DocIdGrok
    val counters = scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    val routed = scala.collection.mutable.Map.empty[String, scala.collection.mutable.ArrayBuffer[RoutedRow]]
    val dropped = scala.collection.mutable.Map.empty[String, Long]

    def drop(reason: String): Unit =
      dropped.update(reason, dropped.getOrElse(reason, 0L) + 1)
    def emit(sink: String, r: TokenSeq): Unit = {
      val k = (sink, r.source)
      val (c, s) = counters.getOrElse(k, (0L, 0L))
      counters.update(k, (c + 1, s + r.n_tok))
      routed.getOrElseUpdate(sink, scala.collection.mutable.ArrayBuffer.empty) +=
        RoutedRow(r.doc_id, r.tokens.toVector, r.n_tok, r.source)
    }

    rows.foreach { r =>
      grok.extract(r.doc_id) match {
        case None => drop("parse_error")
        case Some(fields) =>
          attrs.get(r.source) match {
            case None => drop("enrich_miss")
            case Some(a) =>
              val seq = fields("seq").toLong
              if (seq % TokenPipeline.AbortModulus == 0) drop("vrl_abort")
              else {
                val hot = r.source == "web"
                val long = r.n_tok >= longMin
                val pii = a.pii && a.priority >= 2
                if (exclusive) {
                  // first-match-wins (exclusive_route/transform.rs:44-55)
                  if (hot) emit("sink_hot", r)
                  else if (long) emit("sink_long", r)
                  else if (pii) emit("sink_pii", r)
                  else emit("_unmatched", r)
                } else {
                  if (hot) emit("sink_hot", r)
                  if (long) emit("sink_long", r)
                  if (pii) emit("sink_pii", r)
                  if (!hot && !long && !pii) emit("_unmatched", r)
                }
              }
          }
      }
    }
    Out(counters.toMap,
      routed.map { case (k, v) => k -> v.sortBy(_.doc_id).toVector }.toMap,
      dropped.toMap)
  }

  /** Oracle over the deterministic generator — generation shares
    * [[Gen.rowOf]] with the Spark job, so input equality is by construction.
    */
  def runGenerated(cfg: GenConfig, longMin: Int = 1024,
                   exclusive: Boolean = false): Out =
    run((0L until cfg.rows).iterator.map(Gen.rowOf(_, cfg)),
      Gen.sourceAttrsRows.map(a => a.source -> a).toMap, longMin, exclusive)
}
