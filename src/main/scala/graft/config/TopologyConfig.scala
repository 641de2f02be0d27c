package graft.config

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.conditions.DatadogSearch

/** TOML front-end for [[Topology]] — the `vector --config` analog
  * (reference: src/config/builder.rs deserialization + src/config/vars.rs
  * env interpolation). A config is a sequence of `[transforms.<name>]`
  * tables applied in declaration order; the terminal transform of type
  * `route` / `exclusive_route` becomes the router. Conditions are
  * `datadog_search` strings compiled to Catalyst predicates
  * ([[DatadogSearch]] — the reference's second condition language).
  *
  * Example:
  * {{{
  * default_field = "doc_id"
  * [transforms.parse0]
  * type = "parse_grok"
  * source = "doc_id"
  * pattern = "%{WORD:src}/%{INT:n:int}"
  *
  * [transforms.keep]
  * type = "filter"
  * condition = "src:web OR n:>=100"
  *
  * [transforms.router]
  * type = "route"
  * route.hot = "src:web"
  * route.big = "n:>=1024"
  * }}}
  */
object TopologyConfig {

  def fromToml(text: String,
               tables: Map[String, DataFrame] = Map.empty,
               env: Map[String, String] = sys.env): Topology.Config = {
    val doc = Toml.parse(text, env)
    val defaultField = doc.getS("default_field").getOrElse("message")
    def cond(q: String) = DatadogSearch.compile(q, col, col(defaultField))

    val names = doc.childKeys("transforms")
    require(names.nonEmpty, "config has no [transforms.*] tables")

    var router: Option[Topology.Router] = None
    val stages = Vector.newBuilder[Topology.Stage]

    for (name <- names) {
      val p = s"transforms.$name"
      val tpe = doc.getS(s"$p.type").getOrElse(
        throw new IllegalArgumentException(s"[$p] missing type"))
      tpe match {
        case "parse_grok" =>
          stages += Topology.ParseStage(
            doc.getS(s"$p.source").getOrElse("message"),
            doc.getS(s"$p.pattern").getOrElse(
              throw new IllegalArgumentException(s"[$p] missing pattern")))
        case "filter" =>
          stages += Topology.FilterStage(cond(doc.getS(s"$p.condition").getOrElse(
            throw new IllegalArgumentException(s"[$p] missing condition"))))
        case "enrichment" =>
          val tname = doc.getS(s"$p.table").getOrElse(
            throw new IllegalArgumentException(s"[$p] missing table"))
          val table = tables.getOrElse(tname,
            throw new IllegalArgumentException(
              s"[$p] unknown enrichment table '$tname'; have ${tables.keys.mkString(",")}"))
          val keys = doc.get(s"$p.keys") match {
            case Some(Toml.A(items)) => items.collect { case Toml.S(s) => s }
            case _ => throw new IllegalArgumentException(s"[$p] missing keys array")
          }
          stages += Topology.EnrichStage(table, keys,
            doc.getS(s"$p.probe").getOrElse(
              throw new IllegalArgumentException(s"[$p] missing probe")))
        case "remap" =>
          // ops in DECLARATION order (VRL programs are ordered): keys are
          // set.<field> = "<vrl expr>", filter = "<cond>",
          // abort_when = "<cond>" (+ abort_reason), del = ["f", ...],
          // rename.<from> = "<to>"
          import graft.remap.{Remap, VrlExpr}
          var program = Remap(componentId = name)
          val abortReason = doc.getS(s"$p.abort_reason").getOrElse("abort")
          doc.under(p).foreach {
            case (k, Toml.S(e)) if k.startsWith("set.") =>
              program = program.set(k.stripPrefix("set."), VrlExpr.compile(e))
            case ("filter", Toml.S(e)) =>
              program = program.filterKeep(VrlExpr.compile(e))
            case ("abort_when", Toml.S(e)) =>
              program = program.abortWhen(VrlExpr.compile(e), abortReason)
            case ("del", Toml.A(items)) =>
              items.collect { case Toml.S(f) => f }.foreach(f => program = program.del(f))
            case (k, Toml.S(to)) if k.startsWith("rename.") =>
              program = program.rename(k.stripPrefix("rename."), to)
            case ("type", _) | ("abort_reason", _) => ()
            case (k, v) => throw new IllegalArgumentException(s"[$p] bad remap op $k = $v")
          }
          stages += Topology.RemapStage(program)
        case "route" | "exclusive_route" =>
          require(router.isEmpty, s"[$p] second router in config")
          require(name == names.last, s"[$p] router must be the last transform")
          val routes = doc.under(s"$p.route").collect {
            case (sink, Toml.S(q)) => sink -> cond(q)
          }
          require(routes.nonEmpty, s"[$p] router has no route.* entries")
          router = Some(Topology.Router(routes,
            exclusive = tpe == "exclusive_route",
            unmatched = doc.getB(s"$p.unmatched").getOrElse(true)))
        case other =>
          throw new IllegalArgumentException(s"[$p] unsupported transform type '$other'")
      }
    }
    Topology.Config(stages.result(),
      router.getOrElse(throw new IllegalArgumentException(
        "config has no route/exclusive_route transform")))
  }
}
