package graft.config

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.enrich.Enrich
import graft.parse.Grok
import graft.remap.Remap
import graft.route.Route

/** Declarative topology model — the analog of the reference's config file
  * (`vector --config vector.yaml`, SURVEY.md §3.1: parse/load → compile →
  * build → connect → execute). A topology is a linear chain of typed stage
  * configs ending in a router with named output ports; [[Topology.compile]]
  * turns it into a `DataFrame => Ports` function, with Catalyst as the
  * type-checker (the reference's `Graph::typecheck`, src/config/graph.rs:242).
  *
  * A YAML/TOML front-end would deserialize 1:1 into these case classes; the
  * Scala value IS the config (no external parser dependencies in-sandbox).
  */
object Topology {

  sealed trait Stage
  /** Grok parse of `sourceCol`; failures → `dropped` port (reason parse_error). */
  final case class ParseStage(sourceCol: String, pattern: String) extends Stage
  /** Broadcast-join enrich; misses → `dropped` port (reason enrich_miss). */
  final case class EnrichStage(table: DataFrame, keys: Seq[String], probeCol: String) extends Stage
  /** VRL-style remap program; aborts → `dropped` port. */
  final case class RemapStage(program: Remap) extends Stage
  /** Generic filter (the `filter` transform). */
  final case class FilterStage(cond: Column) extends Stage

  /** Router: multi-match (`route`) or first-match (`exclusive_route`). */
  final case class Router(routes: Seq[(String, Column)], exclusive: Boolean = false,
                          unmatched: Boolean = true)

  final case class Config(stages: Seq[Stage], router: Router)

  /** Named output ports: every sink plus `dropped`. */
  final case class Ports(ports: Map[String, DataFrame]) {
    def apply(name: String): DataFrame =
      ports.getOrElse(name, sys.error(s"no port '$name'; have ${ports.keys.mkString(",")}"))
    def names: Set[String] = ports.keySet
  }

  val DroppedPort = "dropped"

  /** Compile the config into an executable dataflow. Mirrors the reference
    * lifecycle: this is `compile` + `build`; Spark's action execution is
    * `connect`/`execute`.
    */
  def compile(cfg: Config): DataFrame => Ports = { input =>
    var droppedLanes = Vector.empty[DataFrame]
    def bookDropped(df: DataFrame): Unit =
      droppedLanes = droppedLanes :+ df.select(
        to_json(struct(df.columns.map(col): _*)).as("row_json"),
        col("drop_reason"), col("component_id"))

    val main = cfg.stages.foldLeft(input) {
      case (df, ParseStage(src, pattern)) =>
        val parsed = Grok.parse(df, col(src), Grok.compile(pattern))
        bookDropped(parsed.filter(!col("_parse_ok")).drop("_parse_ok")
          .withColumn("drop_reason", lit("parse_error"))
          .withColumn("component_id", lit("parse")))
        parsed.filter(col("_parse_ok")).drop("_parse_ok")
      case (df, EnrichStage(table, keys, probe)) =>
        val (ok, dropped) = Enrich.strict(df, table, keys, probe)
        bookDropped(dropped)
        ok
      case (df, RemapStage(program)) =>
        val Remap.RemapResult(ok, dropped) = program.run(df)
        bookDropped(dropped)
        ok
      case (df, FilterStage(cond)) => df.filter(cond)
    }

    val sinkPorts: Map[String, DataFrame] =
      if (cfg.router.exclusive) {
        val routed = Route.exclusive(main, cfg.router.routes)
        val names = cfg.router.routes.map(_._1) ++
          (if (cfg.router.unmatched) Seq(Route.Unmatched) else Nil)
        names.map(n => n -> routed.filter(col("sink") === n).drop("sink")).toMap
      } else {
        val flagged = Route.flags(main, cfg.router.routes, cfg.router.unmatched)
        val names = cfg.router.routes.map(_._1) ++
          (if (cfg.router.unmatched) Seq(Route.Unmatched) else Nil)
        names.map(n => n -> Route.sinkView(flagged, n)).toMap
      }

    val dropped = droppedLanes match {
      case Vector() => input.sparkSession.emptyDataFrame
      case lanes => lanes.reduce(_ unionByName _)
    }
    Ports(sinkPorts + (DroppedPort -> dropped))
  }
}
