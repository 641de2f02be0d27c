package graft
import org.apache.spark.sql.SparkSession

/** Driver bench surface: one JSON line with per-query seconds over
  * `SPARK_GRAFT_SF_DIR`, plus the north-rule scaling section (pipeline
  * throughput at 2/8/32 pinned cores — see ScalingBench).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup: parquet footers, codegen, shuffle machinery — without
    // it the map's FIRST query absorbs all JVM/session init in its timing
    scala.util.Try {
      spark.read.parquet(s"$sfDir/events.parquet").count()
      spark.read.parquet(s"$sfDir/documents.parquet").count()
      spark.read.parquet(s"$sfDir/embeddings.parquet").count()
      spark.range(0, 1000000).selectExpr("sum(id)").collect()
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    spark.stop()

    // north-rule scaling evidence (pinned child JVMs; skipped gracefully if
    // the environment can't spawn them, or explicitly via
    // SPARK_GRAFT_SCALING=0 for queries-only runs like the per-query
    // core-ratio table in BENCH.md)
    val scaling = if (sys.env.get("SPARK_GRAFT_SCALING").contains("0")) None
    else scala.util.Try {
      val rows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "10000000").toLong
      val r = ScalingBench.measure(rows, maxTok = 256, dir = "/tmp/graft_scaling_input")
      ScalingBench.json(rows, r)
    }.toOption
    val scalingPart = scaling.map(s => s""","scaling":$s""").getOrElse("")

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$scalingPart}""")
  }
}
