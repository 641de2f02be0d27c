package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sketch/approximate operators — the analogs of the reference's
  * probabilistic machinery (DDSketch metric values,
  * lib/vector-core/src/event/metric/value.rs:20-82; Bloom-filter
  * tag_cardinality_limit probabilistic mode,
  * tag_cardinality_limit/config.rs:56-83). Approximation quality is
  * engine-specific, so these are spec-verified against exact answers
  * rather than DuckDB-oracled.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = spark.range(0, 100000).select(
    col("id"),
    pmod(xxhash64(col("id")), lit(5000)).as("key"),
    (pmod(xxhash64(col("id"), lit(1)), lit(100000)).cast("double") / 100).as("v"))
    .cache()

  test("approx_count_distinct within 5% of exact") {
    val exact = df.select(countDistinct(col("key"))).as[Long].head()
    val approx = df.select(approx_count_distinct(col("key"), 0.02)).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("percentile_approx within 2% of exact percentile (DDSketch analog)") {
    for (p <- Seq(0.5, 0.9, 0.99)) {
      val exact = df.select(expr(s"percentile(v, $p)")).as[Double].head()
      val approx = df.select(expr(s"percentile_approx(v, $p, 1000)")).as[Double].head()
      assert(math.abs(approx - exact) / exact < 0.02, s"p=$p approx=$approx exact=$exact")
    }
  }

  test("DDSketch: relative-accuracy bound holds vs exact percentile") {
    import graft.sketch.DDSketch
    val sk = df.agg(DDSketch.sketch(col("v")).as("sk"))
    for (p <- Seq(0.5, 0.9, 0.99)) {
      val got = sk.select(DDSketch.quantile(col("sk"), p)).as[Double].head()
      val exact = df.filter(col("v") > 0).select(expr(s"percentile(v, $p)")).as[Double].head()
      // γ = 1.01/0.99 → ~1% relative accuracy; allow 2% for rank-vs-value
      assert(math.abs(got - exact) / exact < 0.02, s"p=$p got=$got exact=$exact")
    }
  }

  test("DDSketch merge law: sketch(A ∪ B) == merge(sketch(A), sketch(B))") {
    import graft.sketch.DDSketch
    val whole = df.agg(DDSketch.sketch(col("v")).as("sk"))
      .select(to_json(col("sk"))).as[String].head()
    // split into 7 arbitrary parts, sketch each, merge the sketch COLUMN
    val parts = df.withColumn("part", pmod(col("id"), lit(7)))
      .groupBy("part").agg(DDSketch.sketch(col("v")).as("sk"))
    val merged = parts.agg(DDSketch.merge(col("sk")).as("sk"))
      .select(to_json(col("sk"))).as[String].head()
    assert(merged == whole)
    // and the merged sketch answers quantiles identically
    val qWhole = df.agg(DDSketch.quantile(DDSketch.sketch(col("v")), 0.9)).as[Double].head()
    val qMerged = parts.agg(DDSketch.merge(col("sk")).as("m"))
      .select(DDSketch.quantile(col("m"), 0.9)).as[Double].head()
    assert(qWhole == qMerged)
  }

  test("bloom filter: zero false negatives, bounded false positives") {
    val bloom = df.stat.bloomFilter("key", 5000, 0.03)
    // no false negatives: every present key must test positive
    val present = df.select(col("key")).distinct().as[Long].collect()
    assert(present.forall(bloom.mightContain))
    // false positive rate on definitely-absent keys stays near the target
    val absent = (1000000L until 1010000L)
    val fp = absent.count(bloom.mightContain).toDouble / absent.size
    assert(fp < 0.06, s"fp rate $fp")
  }

  test("tag_cardinality bloom mode: superset of exact, FPR-bounded overshoot") {
    import graft.ops.Transforms
    val e = (0L until 4000L)
      .map(i => (i, new java.sql.Timestamp(1700000000000L + i * 1000), (i % 97).toString))
      .toDF("event_id", "ts", "tag")
    val exact = Transforms.tagCardinalityLimit(e, "tag", col("ts"), 20)
      .select("event_id").as[Long].collect().toSet
    val bloom = Transforms.tagCardinalityLimitBloom(e, "tag", col("ts"), 20)
      .select("event_id").as[Long].collect().toSet
    // zero false negatives: every exactly-accepted event survives bloom mode
    assert(exact.subsetOf(bloom))
    // over-admission only via false positives, bounded: 20 values × 2
    // hashes ≤ 40 of 64 bits set → per-value FP ≤ (40/64)^2 ≈ 0.39; the
    // 77 over-limit values admit at most ~that fraction (generous 2× slack)
    val overValues = bloom.diff(exact).map(_ % 97).size
    assert(overValues <= 60, s"bloom admitted $overValues extra tag values")
    // deterministic: same input → same decisions
    val again = Transforms.tagCardinalityLimitBloom(e, "tag", col("ts"), 20)
      .select("event_id").as[Long].collect().toSet
    assert(again == bloom)
  }
}
