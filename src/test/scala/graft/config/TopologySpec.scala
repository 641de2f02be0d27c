package graft.config

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.remap.Remap
import graft.route.Route
import graft.testkit.TopologyTest

/** Behavior tests through the config surface — the reference's route test
  * matrix (src/transforms/route.rs:180-447: pass-all / pass-one /
  * pass-none / no-unmatched) plus end-to-end stage-chain tests, driven by
  * the TopologyTest harness (FIXTURES.md §5).
  */
class TopologySpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    (1L, "error", 50.0), (2L, "click", 250.0), (3L, "error", 300.0), (4L, "view", 10.0)
  ).toDF("id", "kind", "v")

  private def router = Topology.Router(Seq(
    "hot" -> (col("kind") === "error"),
    "big" -> (col("v") >= 200)))

  test("route matrix: multi-match fan-out with _unmatched") {
    TopologyTest(Topology.Config(Nil, router))
      .insertAt(events)
      .extractFrom("hot")(rows => assert(rows.map(_.getLong(0)).sorted == Seq(1L, 3L)))
      .extractFrom("big")(rows => assert(rows.map(_.getLong(0)).sorted == Seq(2L, 3L)))
      .extractFrom(Route.Unmatched)(rows => assert(rows.map(_.getLong(0)) == Seq(4L)))
    // row 3 matched BOTH hot and big — the multi-match semantic
  }

  test("route matrix: pass-none goes only to _unmatched; no-unmatched drops them") {
    val noneMatch = Topology.Router(Seq("never" -> lit(false)))
    TopologyTest(Topology.Config(Nil, noneMatch))
      .insertAt(events)
      .noOutputsFrom("never")
      .extractFrom(Route.Unmatched)(rows => assert(rows.size == 4))
    val t = TopologyTest(Topology.Config(Nil, noneMatch.copy(unmatched = false)))
      .insertAt(events)
    assert(!t.cfg.router.unmatched)
    intercept[RuntimeException](t.outputsOf(Route.Unmatched))
  }

  test("exclusive router: first match wins") {
    TopologyTest(Topology.Config(Nil, router.copy(exclusive = true)))
      .insertAt(events)
      .extractFrom("hot")(rows => assert(rows.map(_.getLong(0)).sorted == Seq(1L, 3L)))
      .extractFrom("big")(rows => assert(rows.map(_.getLong(0)) == Seq(2L))) // 3 taken by hot
  }

  test("full stage chain: parse → enrich → remap → route with dropped lanes") {
    val input = Seq(
      ("web/t1/001", 10L), ("web/t2/002", 2000L), ("bad doc id", 5L),
      ("ghost/t3/003", 7L), ("web/t4/004", 997L)
    ).toDF("doc_id", "n")
    val attrs = Seq(("web", "us"), ("code", "eu")).toDF("src_tag", "region")
    val cfg = Topology.Config(
      Seq(
        Topology.ParseStage("doc_id", "%{WORD:src_tag}/%{WORD:tenant}/%{INT:seq:int}"),
        Topology.EnrichStage(attrs, Seq("src_tag"), "region"),
        Topology.RemapStage(Remap()
          .set("n2", col("n") * 2)
          .abortWhen(col("n") === 997, "magic_number"))),
      Topology.Router(Seq("big" -> (col("n2") >= 100))))
    val t = TopologyTest(cfg).insertAt(input)
    t.extractFrom("big")(rows => assert(rows.map(_.getAs[String]("doc_id")) == Seq("web/t2/002")))
      .extractFrom(Route.Unmatched)(rows =>
        assert(rows.map(_.getAs[String]("doc_id")) == Seq("web/t1/001")))
    val dropped = t.outputsOf(Topology.DroppedPort)
      .map(r => r.getAs[String]("drop_reason")).sorted
    assert(dropped == Seq("enrich_miss", "magic_number", "parse_error"))
  }

  test("filter stage composes in the chain") {
    val cfg = Topology.Config(Seq(Topology.FilterStage(col("v") > 20)), router)
    TopologyTest(cfg).insertAt(events)
      .extractFrom(Route.Unmatched)(rows => assert(rows.isEmpty))
      .extractFrom("hot")(rows => assert(rows.map(_.getLong(0)).sorted == Seq(1L, 3L)))
  }
}
