package graft.tools

import org.apache.spark.sql.SparkSession

/** Local subset replica of [[graft.Verify]]: run only the named queries
  * (comma-separated in args(0)) at sf0.01 into /tmp/w6, dumping their
  * oracle SQL for `tools/check_verify.py /root/testdata/sf0.01 /tmp/w6`.
  * Keeps the iterate-on-one-query loop fast (full Verify runs all 115).
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val names = args(0).split(",")
    // materialize only the generator inputs the selected oracles read back
    graft.SparkEntry.materializedInputs.foreach { case (in, fn) =>
      val needle = s"${graft.SparkEntry.OutDirToken}/_inputs/$in/"
      if (names.exists(n => graft.SparkEntry.oracleSql.get(n).exists(_.contains(needle))))
        fn(spark).coalesce(1).write.mode("overwrite").parquet(s"/tmp/w6/_inputs/$in")
    }
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/w6/$n")
      println(s"$n rows=" + spark.read.parquet(s"/tmp/w6/$n").count())
    }
    val q = (s: String) => "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/w6/oracle_sql.json"),
      names.map(n => s"${q(n)}: ${q(graft.SparkEntry.oracleSql(n)
        .replace(graft.SparkEntry.OutDirToken, "/tmp/w6"))}").mkString("{", ",", "}"))
    spark.stop()
  }
}
