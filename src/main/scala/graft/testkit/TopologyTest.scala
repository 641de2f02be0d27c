package graft.testkit

import org.apache.spark.sql.{DataFrame, Row}

import graft.config.Topology

/** Unit-test harness mirroring the reference's config unit tests
  * (`vector test`: TestDefinition with `insert_at`, `extract_from`,
  * `no_outputs_from` — src/config/mod.rs:407-425; behavior-test TOMLs
  * under tests/behavior/transforms/). FIXTURES.md §5 shape:
  *
  * {{{
  * TopologyTest(cfg)
  *   .insertAt(inputDf)
  *   .extractFrom("sink_hot") { rows => assert(rows.size == 1) }
  *   .noOutputsFrom("sink_long")
  * }}}
  *
  * The harness compiles the real topology (no mock stages), feeds literal
  * rows, and asserts per-port outputs — exactly what the reference's
  * framework does with in-memory test sources/sinks
  * (src/config/unit_test/unit_test_components.rs).
  */
final case class TopologyTest(cfg: Topology.Config) {

  private var ports: Option[Topology.Ports] = None

  def insertAt(input: DataFrame): TopologyTest = {
    ports = Some(Topology.compile(cfg)(input))
    this
  }

  private def port(name: String): DataFrame =
    ports.getOrElse(sys.error("call insertAt first"))(name)

  def extractFrom(name: String)(check: Seq[Row] => Unit): TopologyTest = {
    check(port(name).collect().toSeq)
    this
  }

  def outputsOf(name: String): Seq[Row] = port(name).collect().toSeq

  def noOutputsFrom(name: String): TopologyTest = {
    val n = port(name).count()
    assert(n == 0, s"expected no outputs from '$name', got $n")
    this
  }
}
