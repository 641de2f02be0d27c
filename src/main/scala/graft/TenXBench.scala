package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-suite 10× scale point (VERDICT r4 item 3): materialize a
  * generator-built dataset with 10× the sf0.1 row counts and the SAME
  * schema/skew, run EVERY SparkEntry query on it, and emit a per-query
  * seconds line for the BENCH.md ratio table — per-query super-linearity
  * outside the measured heavy families is invisible while the suite only
  * ever runs at sf0.1.
  *
  * Construction (deterministic, no external data):
  *  - region/nation copy verbatim (fixed dims — the TPC-H convention);
  *  - customer/supplier/part/orders/lineitem/events upscale by key-offset
  *    replication: `factor` replicas with every key-family column shifted
  *    by `replica * stride` (stride = max(key)+1 from the source data, one
  *    stride per family so FK joins stay replica-consistent). Each replica
  *    reproduces the original's distributions exactly; per-entity volumes,
  *    join fan-outs, and group cardinalities scale the way real growth
  *    does (more entities, same shape).
  *  - documents/embeddings come from the ScaleUpBench generators (the
  *    driver-shape vocab/length/dup-rate and unit-norm dims) at 10× rows —
  *    replication would clone every doc `factor` times and turn the
  *    near-dup workload into a different (cluster-degenerate) problem.
  *
  * Every query runs under a wall-clock guard (default 180 s, via Spark job
  * groups): a query that cannot finish 10× data in that budget IS the
  * finding — it gets -1 and a written cause in BENCH.md, not a hung round.
  *
  * Usage:
  *   --materialize <outDir> <sfDir> [factor]
  *   --run <dir> [timeoutSecs]
  */
object TenXBench {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-tenx")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Replicate `factor`×, shifting each listed key column by its family
    * stride per replica — pure column program, schema preserved.
    */
  private def upscale(df: DataFrame, factor: Int,
                      strides: Map[String, Long]): DataFrame = {
    val rep = df.withColumn("_r", explode(sequence(lit(0L), lit(factor - 1L))))
    rep.select(df.schema.fields.map { f =>
      strides.get(f.name) match {
        case Some(k) =>
          (col(f.name) + col("_r") * lit(k)).cast(f.dataType).as(f.name)
        case None => col(f.name)
      }
    }.toIndexedSeq: _*)
  }

  def materialize(spark: SparkSession, outDir: String, sfDir: String,
                  factor: Int): Unit = {
    def rd(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    def wr(df: DataFrame, n: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$outDir/$n.parquet")
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c).cast("long"))).head.getLong(0) + 1

    val (cust, supp, part, ords, line, evts) =
      (rd("customer"), rd("supplier"), rd("part"), rd("orders"),
        rd("lineitem"), rd("events"))
    val kCust = maxOf(cust, "c_custkey")
    val kSupp = maxOf(supp, "s_suppkey")
    val kPart = maxOf(part, "p_partkey")
    val kOrd = maxOf(ords, "o_orderkey")
    val kEvt = maxOf(evts, "event_id")
    val kUser = maxOf(evts, "user_id")

    wr(rd("region"), "region", 1)
    wr(rd("nation"), "nation", 1)
    wr(upscale(cust, factor, Map("c_custkey" -> kCust)), "customer", 4)
    wr(upscale(supp, factor, Map("s_suppkey" -> kSupp)), "supplier", 1)
    wr(upscale(part, factor, Map("p_partkey" -> kPart)), "part", 4)
    wr(upscale(ords, factor, Map("o_orderkey" -> kOrd, "o_custkey" -> kCust)),
      "orders", 8)
    wr(upscale(line, factor, Map("l_orderkey" -> kOrd, "l_partkey" -> kPart,
      "l_suppkey" -> kSupp)), "lineitem", 16)
    wr(upscale(evts, factor, Map("event_id" -> kEvt, "user_id" -> kUser)),
      "events", 16)
    val nDocs = rd("documents").count() * factor
    val nEmb = rd("embeddings").count() * factor
    wr(ScaleUpBench.documents(spark, nDocs), "documents", 8)
    wr(ScaleUpBench.embeddings(spark, nEmb), "embeddings", 4)
    println(s"MATERIALIZED_FULL $outDir factor=$factor docs=$nDocs emb=$nEmb")
  }

  /** Run every SparkEntry query with a per-query wall guard; -1 = failed,
    * -2 = timed out (job group cancelled).
    */
  def runAll(spark: SparkSession, dir: String, timeoutSecs: Int,
             nameFilter: Option[String] = None): Map[String, Double] = {
    import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
    val exec = Executors.newSingleThreadExecutor()
    // warmup: footers + codegen machinery
    scala.util.Try {
      spark.read.parquet(s"$dir/events.parquet").count()
      spark.read.parquet(s"$dir/documents.parquet").count()
      spark.range(0, 1000000).selectExpr("sum(id)").collect()
    }
    // SPARK_GRAFT_PASSES=2 (default): a warm pass absorbs per-query
    // codegen/JIT compile, the second pass is the timed one — without it
    // the early-alphabet queries' ratios are compile noise, not data
    // scale. A pass-1 timeout/failure is recorded as-is (no retry).
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    def guarded(name: String): Double = {
      val t0 = System.nanoTime()
      val fut = exec.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          SparkEntry.queries(name)(spark, dir).count()
        }
      })
      try { fut.get(timeoutSecs.toLong, TimeUnit.SECONDS); (System.nanoTime() - t0) / 1e9 }
      catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          fut.cancel(true)
          System.err.println(s"[tenx] TIMEOUT $name after ${timeoutSecs}s")
          -2.0
        case e: Throwable =>
          System.err.println(s"[tenx] FAIL $name: ${e.getMessage}")
          -1.0
      }
    }
    val picked = nameFilter match {
      case Some(re) => SparkEntry.queries.keys.toSeq.filter(_.matches(re))
      case None => SparkEntry.queries.keys.toSeq
    }
    val out = picked.sorted.map { name =>
      val first = guarded(name)
      val secs =
        if (first < 0 || passes <= 1) first
        else (2 to passes).map(_ => guarded(name)).min
      println(f"[tenx] $name%-28s $secs%.3f")
      name -> secs
    }
    exec.shutdownNow()
    out.toMap
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "--materialize" :: outDir :: sfDir :: rest if rest.size <= 1 =>
      val spark = session()
      materialize(spark, outDir, sfDir, rest.headOption.map(_.toInt).getOrElse(10))
      spark.stop()

    case "--run" :: dir :: rest if rest.size <= 2 =>
      val spark = session()
      val timeout = rest.headOption.map(_.toInt).getOrElse(180)
      val results = runAll(spark, dir, timeout, rest.drop(1).headOption)
      val qs = results.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      val done = results.values.filter(_ >= 0)
      println(s"""TENX {"dir":"$dir","n":${results.size},"finished":${done.size},""" +
        s""""total_secs":${done.sum},"timeout_secs":$timeout,"queries":$qs}""")
      spark.stop()

    case other =>
      System.err.println(
        s"usage: --materialize outDir sfDir [factor] | --run dir [timeoutSecs] [nameRegex] (got $other)")
      sys.exit(2)
  }
}
