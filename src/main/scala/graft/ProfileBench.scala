package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Gen
import graft.parse.Grok
import graft.pipeline.TokenPipeline

/** Scratch profiling main: cumulative stage timings at a given core count
  * (steady state: 2 passes, 2nd timed) to find non-scaling segments.
  */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/tmp/graft_scaling_input")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(mk: => DataFrame): Unit = {
      def once(): Long = { val df = mk; df.queryExecution.toRdd.count() }
      once()
      val t0 = System.nanoTime(); once()
      println(f"[profile] $name%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s  (cores=$cores)")
    }

    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      TokenPipeline.countersOnly(spark.read.parquet(dir), Gen.sourceAttrs(spark))
        .explain("formatted")
      spark.stop(); return
    }

    def in = spark.read.parquet(dir)
    time("scan_only")(in)
    time("scan_count_ntok")(in.select(sum("n_tok")).toDF())
    time("parse")(Grok.parse(in, col("doc_id"), TokenPipeline.DocIdGrok))
    time("parse_enrich_remap")(TokenPipeline.dataflow(in, Gen.sourceAttrs(spark), 1024)._1)
    time("full_counters")(TokenPipeline.countersOnly(in, Gen.sourceAttrs(spark)))
    spark.stop()
  }
}
