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

  test("TOML front-end builds the same pipeline as the Scala config") {
    val input = Seq(
      ("web/t1/001", 10L), ("web/t2/002", 2000L), ("bad doc id", 5L),
      ("ghost/t3/003", 7L), ("code/t4/004", 500L)
    ).toDF("doc_id", "n")
    val attrs = Seq(("web", "us"), ("code", "eu")).toDF("src_tag", "region")

    val toml =
      """# pipeline config (vector --config analog)
        |default_field = "doc_id"
        |
        |[transforms.parse0]
        |type = "parse_grok"
        |source = "doc_id"
        |pattern = "%{WORD:src_tag}/%{WORD:tenant}/%{INT:seq:int}"
        |
        |[transforms.enrich0]
        |type = "enrichment"
        |table = "${ATTRS_TABLE:-source_attrs}"
        |keys = ["src_tag"]
        |probe = "region"
        |
        |[transforms.keep]
        |type = "filter"
        |condition = "n:>=10"
        |
        |[transforms.router]
        |type = "route"
        |route.hot = "src_tag:web"
        |route.big = "n:>=1000"
        |""".stripMargin

    val cfg = TopologyConfig.fromToml(toml,
      tables = Map("source_attrs" -> attrs), env = Map.empty)
    val ports = Topology.compile(cfg)(input)
    // web/t1 (hot), web/t2 (hot+big): multi-match; code/t4 not hot, not big
    assert(ports("hot").select("doc_id").as[String].collect().sorted.toSeq
      == Seq("web/t1/001", "web/t2/002"))
    assert(ports("big").select("doc_id").as[String].collect().toSeq == Seq("web/t2/002"))
    assert(ports(Route.Unmatched).select("doc_id").as[String].collect().toSeq
      == Seq("code/t4/004"))
    // dropped lanes: parse_error (bad doc id) + enrich_miss (ghost)
    assert(ports(Topology.DroppedPort).select("drop_reason").as[String].collect().sorted.toSeq
      == Seq("enrich_miss", "parse_error"))

    // same pipeline hand-built in Scala → identical port contents
    val scalaCfg = Topology.Config(
      Seq(
        Topology.ParseStage("doc_id", "%{WORD:src_tag}/%{WORD:tenant}/%{INT:seq:int}"),
        Topology.EnrichStage(attrs, Seq("src_tag"), "region"),
        Topology.FilterStage(col("n") >= 10)),
      Topology.Router(Seq(
        "hot" -> (col("src_tag") === "web"),
        "big" -> (col("n") >= 1000))))
    val sp = Topology.compile(scalaCfg)(input)
    for (port <- Seq("hot", "big", Route.Unmatched)) {
      assert(ports(port).select("doc_id").as[String].collect().sorted.toSeq
        == sp(port).select("doc_id").as[String].collect().sorted.toSeq, s"port $port")
    }
  }

  test("TOML parser: types, arrays, comments, env interpolation, errors") {
    val doc = Toml.parse(
      """top = "t"
        |[a.b]
        |s = "x \"q\" y"     # comment
        |i = 42
        |f = 2.5
        |flag = true
        |arr = ["p", "q"]
        |env1 = "${HOME_X:-/fallback}"
        |env2 = "pre-${MYVAR}-post"
        |""".stripMargin, env = Map("MYVAR" -> "V"))
    assert(doc.getS("top").contains("t"))
    assert(doc.getS("a.b.s").contains("x \"q\" y"))
    assert(doc.getI("a.b.i").contains(42L))
    assert(doc.get("a.b.f").contains(Toml.F(2.5)))
    assert(doc.getB("a.b.flag").contains(true))
    assert(doc.get("a.b.arr").contains(Toml.A(Seq(Toml.S("p"), Toml.S("q")))))
    assert(doc.getS("a.b.env1").contains("/fallback"))
    assert(doc.getS("a.b.env2").contains("pre-V-post"))
    intercept[IllegalArgumentException](Toml.parse("x = \"${NOPE_UNSET}\"", env = Map.empty))
    intercept[IllegalArgumentException](Toml.parse("x = nope", env = Map.empty))
  }

  test("TOML remap stage: ordered set/abort/del ops compile to a VRL program") {
    val input = Seq((10L, 100L), (997L, 2000L), (5L, 300L)).toDF("seq", "n")
    val toml =
      """default_field = "bucket"
        |[transforms.r]
        |type = "remap"
        |set.bucket = "if(.n >= 1024, 'long', if(.n >= 256, 'mid', 'short'))"
        |set.dn = ".n * 2"
        |abort_when = ".seq % 997 == 0"
        |abort_reason = "magic"
        |del = ["seq"]
        |rename.dn = "double_n"
        |
        |[transforms.router]
        |type = "route"
        |route.big = "double_n:>=600"
        |""".stripMargin
    val ports = Topology.compile(TopologyConfig.fromToml(toml, env = Map.empty))(input)
    // seq=997 aborts; n=300 doubles to 600 → big; n=100 → unmatched
    assert(ports("big").select("n", "bucket", "double_n").as[(Long, String, Long)]
      .collect().toSeq == Seq((300L, "mid", 600L)))
    assert(ports(Route.Unmatched).select("n").as[Long].collect().toSeq == Seq(100L))
    assert(ports("big").columns.toSet == Set("n", "bucket", "double_n")) // seq deleted
    assert(ports(Topology.DroppedPort).select("drop_reason").as[String]
      .collect().toSeq == Seq("magic"))
  }

  test("template renders {{ field }} + strftime and partitions a write") {
    val df = Seq(
      ("error", java.sql.Timestamp.valueOf("2026-03-05 14:00:00"), 1L),
      ("click", java.sql.Timestamp.valueOf("2026-03-06 09:30:00"), 2L)
    ).toDF("kind", "ts", "id")
    val rendered = df.select(col("id"),
      Template.render("k-{{ kind }}-%Y-%m-%d", col("ts")).as("pk"))
    val got = rendered.as[(Long, String)].collect().toMap
    assert(got(1L) == "k-error-2026-03-05" && got(2L) == "k-click-2026-03-06")
    // 100%% escape + unknown code error
    assert(df.select(Template.render("a%%b", col("ts"))).as[String].head() == "a%b")
    intercept[IllegalArgumentException](Template.render("%Q", col("ts")))
    // templated partitioned write → one directory per rendered value
    val dir = java.nio.file.Files.createTempDirectory("tmpl").toString + "/t"
    df.withColumn("pk", Template.render("{{ kind }}-%Y", col("ts")))
      .write.partitionBy("pk").parquet(dir)
    val dirs = new java.io.File(dir).list().filter(_.startsWith("pk=")).sorted
    assert(dirs.toSeq == Seq("pk=click-2026", "pk=error-2026"))
  }

  test("exclusive_route in TOML: declaration order is match order") {
    val toml =
      """default_field = "kind"
        |[transforms.router]
        |type = "exclusive_route"
        |route.hot = "kind:error"
        |route.big = "v:>=200"
        |""".stripMargin
    val ports = Topology.compile(TopologyConfig.fromToml(toml, env = Map.empty))(events)
    assert(ports("hot").select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(ports("big").select("id").as[Long].collect().toSeq == Seq(2L)) // 3 taken by hot
  }
}
