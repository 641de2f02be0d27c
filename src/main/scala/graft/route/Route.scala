package graft.route

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Routing operators (reference: src/transforms/route.rs and
  * src/transforms/exclusive_route/transform.rs).
  */
object Route {
  val Unmatched = "_unmatched"

  /** `route` transform — multi-match fan-out (reference:
    * src/transforms/route.rs:42-56: the event is emitted on EVERY matching
    * port; optional `_unmatched` port for events matching none).
    *
    * All conditions are evaluated in ONE projection pass producing boolean
    * columns; callers then take per-sink filtered views of the same plan.
    * At scale the upstream should be persisted (or, better, the sink writes
    * share one scan via a single pass) — see [[routedUnion]] for the
    * single-pass exploded form used by the counters path.
    */
  def flags(df: DataFrame, routes: Seq[(String, Column)], unmatched: Boolean = true): DataFrame = {
    val withFlags = routes.foldLeft(df) { case (d, (name, cond)) =>
      d.withColumn(s"_route_$name", coalesce(cond, lit(false)))
    }
    if (unmatched) {
      val noneMatch = routes.map(r => !col(s"_route_${r._1}")).reduce(_ && _)
      withFlags.withColumn(s"_route_$Unmatched", noneMatch)
    } else withFlags
  }

  /** Per-sink view over a flagged frame. */
  def sinkView(flagged: DataFrame, name: String): DataFrame =
    flagged.filter(col(s"_route_$name"))
      .drop(flagged.columns.filter(_.startsWith("_route_")): _*)

  /** Single-pass multi-match routing: one scan, conditions evaluated once,
    * fan-out via an array+explode (a row matching k sinks becomes k rows
    * tagged with `sink`). This is the form the aggregate/counters stage
    * consumes — one shuffle on (sink, source) after a narrow explode,
    * instead of N scans. `explode` of the compacted array preserves
    * multi-match semantics exactly (route.rs:42-56).
    */
  def routedUnion(df: DataFrame, routes: Seq[(String, Column)],
                  unmatched: Boolean = true): DataFrame = {
    val arms = routes.map { case (name, cond) =>
      when(coalesce(cond, lit(false)), lit(name)).otherwise(lit(null: String))
    }
    val unmatchedArm =
      if (unmatched)
        Seq(when(routes.map(r => coalesce(r._2, lit(false))).reduce(_ || _), lit(null: String))
          .otherwise(lit(Unmatched)))
      else Seq.empty
    val sinks = array_compact(array((arms ++ unmatchedArm): _*))
    df.withColumn("sink", explode(sinks))
  }

  /** Rendezvous (highest-random-weight) shard routing — assign each row to
    * one of `shards` by the max of per-shard keyed hashes (Thaler &
    * Ravishankar 1996, public algorithm). Unlike `pmod(hash, n)` routing,
    * adding/removing one shard moves only ~1/(n+1) of the keys — the
    * property a 100 TB fan-out sink needs when the sink set scales
    * (the reference's sinks shard by key-hash templates,
    * src/sinks/util/partitioner.rs; HRW is the resize-stable upgrade).
    *
    * Plan shape: a single narrow projection — the shard list is a plan
    * constant, weights are codegen'd md5-prefix hashes, `array_max` over
    * (weight, shard) structs picks the winner. No shuffle, no UDF, no
    * broadcast; identical in Spark and the DuckDB oracle (h15 both sides).
    * Ties (2^-60 per pair) break to the lexically larger shard name in
    * both engines.
    */
  def rendezvous(df: DataFrame, key: Column, shards: Seq[String],
                 out: String = "shard"): DataFrame = {
    require(shards.nonEmpty, "rendezvous needs at least one shard")
    val arms = shards.map { s =>
      struct(graft.text.Hashing.h15(concat(key.cast("string"), lit("|" + s))).as("w"),
        lit(s).as("shard"))
    }
    df.withColumn(out, array_max(array(arms: _*)).getField("shard"))
  }

  /** `exclusive_route` — first-match-wins (reference:
    * src/transforms/exclusive_route/transform.rs:44-55; ordered routes with
    * `_unmatched` fallback). A single `when` chain — exactly one sink per
    * row, no fan-out, pure projection.
    */
  def exclusive(df: DataFrame, routes: Seq[(String, Column)]): DataFrame = {
    val chain = routes.tail.foldLeft(when(routes.head._2, lit(routes.head._1))) {
      case (acc, (name, cond)) => acc.when(cond, lit(name))
    }
    df.withColumn("sink", chain.otherwise(lit(Unmatched)))
  }
}
