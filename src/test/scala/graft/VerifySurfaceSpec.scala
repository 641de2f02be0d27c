package graft

import java.nio.file.{Files, Paths}

/** Driver-contract robustness: Verify must survive a bad sfDir (per-query
  * stderr, oracle_sql.json still written) and oracle SQL must be valid
  * single-JSON-escapable text for every query key.
  */
class VerifySurfaceSpec extends SparkSpec {

  test("every query has either an oracle or a documented rows-only status") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle for unknown queries: ${o.diff(q)}")
    // rows-only queries are the synthesized-input ones, by naming convention
    val rowsOnly = q.diff(o)
    assert(rowsOnly.forall(n =>
      n.startsWith("p_") || n.startsWith("m_") ||
        n == "d_ann_lsh" || n == "d_ann_ivf"),
      s"unexpected un-oracled queries: $rowsOnly")
  }

  test("verify survives a nonexistent sfDir and still writes oracle_sql.json") {
    val out = Files.createTempDirectory("verify-bad").toString
    spark // ensure the shared session exists so Verify reuses it
    Verify.main(Array("/nonexistent-sf-dir", out))
    assert(Files.exists(Paths.get(s"$out/oracle_sql.json")))
    // parses as minimal JSON: one object, every value a string
    val txt = Files.readString(Paths.get(s"$out/oracle_sql.json"))
    assert(txt.startsWith("{") && txt.endsWith("}"))
    assert(!txt.contains("\n") || txt.count(_ == '"') % 2 == 0)
  }
}
