package graft.tools

/** Dev-only plan auditor: print exchange/join counts for a list of queries
  * (comma-separated in args(1)) over args(0)'s parquet tables. Not part of
  * the driver contract; lives in test sources.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",")
    val s = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      val df = graft.SparkEntry.queries(q)(s, dir)
      val p = df.queryExecution.executedPlan.toString
      val nEx = "Exchange (hash|range)partitioning".r.findAllIn(p).length
      val bhj = "BroadcastHashJoin".r.findAllIn(p).length
      val smj = "SortMergeJoin".r.findAllIn(p).length
      val shj = "ShuffledHashJoin".r.findAllIn(p).length
      println(f"PLAN $q%-22s exchanges=$nEx bhj=$bhj smj=$smj shj=$shj " +
        f"cartesian=${p.contains("Cartesian")}")
    }
    s.stop()
  }
}
