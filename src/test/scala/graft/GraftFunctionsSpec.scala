package graft

import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("SQL surface: scalar functions match the column API") {
    val r = spark.sql(
      """SELECT shannon_entropy('aaaa') AS e0,
        |       shannon_entropy('ab') AS e1,
        |       normalize_unicode('é', 'NFC') AS nfc,
        |       percent_decode(percent_encode('a b&c')) AS rt,
        |       token_content_hash(array(1, 2, 3)) AS h,
        |       CAST(top_bigram_count(array('a','b','a','b')) AS BIGINT) AS tb
        |""".stripMargin).head()
    assert(r.getAs[Double]("e0") == 0.0)
    assert(math.abs(r.getAs[Double]("e1") - 1.0) < 1e-9)
    assert(r.getAs[String]("nfc") == "é")
    assert(r.getAs[String]("rt") == "a b&c")
    // h15("1,2,3") — the cross-engine content hash
    val expect = Seq("x").toDF("x")
      .select(graft.text.Hashing.h15(lit("1,2,3")).as("h")).head().getLong(0)
    assert(r.getAs[Long]("h") == expect)
    assert(r.getAs[Long]("tb") == 2L)
  }

  test("SQL surface: winnow fingerprints and bpe merge agree with the Scala API") {
    val toks = (1 to 40).toArray
    Seq((1L, toks)).toDF("id", "tokens").createOrReplaceTempView("gfs_toks")
    val viaSql = spark.sql(
      "SELECT winnow_fingerprints(tokens, 16, 8) AS fps FROM gfs_toks")
      .head().getAs[scala.collection.Seq[Long]]("fps").toSet
    val viaApi = {
      import org.apache.spark.sql.graft.Bridge
      Seq((1L, toks)).toDF("id", "tokens")
        .select(Bridge.column(graft.functions.WinnowFingerprints(
          Bridge.expression(col("tokens")), 16, 8)).as("fps"))
        .head().getAs[scala.collection.Seq[Long]]("fps").toSet
    }
    assert(viaSql == viaApi && viaSql.nonEmpty)
    val merged = spark.sql(
      "SELECT bpe_merge(array(1, 2, 1, 2, 3), 1, 2, 99) AS m")
      .head().getAs[scala.collection.Seq[Int]]("m")
    assert(merged.toSeq == Seq(99, 99, 3))
  }

  test("SQL surface: count-min and bloom aggregates round-trip through SQL") {
    (1L to 50L).flatMap(k => Seq.fill((k % 5).toInt + 1)(k)).toDF("t")
      .createOrReplaceTempView("gfs_keys")
    spark.sql("SELECT count_min(t, 4, 64) AS sk FROM gfs_keys")
      .createOrReplaceTempView("gfs_sk")
    // int-literal key: the builder inserts the bigint cast itself
    val est = spark.sql("SELECT count_min_estimate(sk, 4, 4) AS e FROM gfs_sk")
      .head().getAs[Long]("e")
    val sk = spark.sql("SELECT sk FROM gfs_sk").head().getAs[Array[Byte]]("sk")
    assert(est == graft.sketch.CountMin.estimateJvm(sk, 4L, 4))
    assert(est >= 5L) // true count of key 4 is (4%5)+1 = 5; CMS upper-bounds

    spark.sql("SELECT bloom_sketch(t, 4096, 3) AS b FROM gfs_keys")
      .createOrReplaceTempView("gfs_bloom")
    val hits = spark.sql(
      """SELECT bloom_might_contain(b, 7, 3) AS in1,
        |       bloom_might_contain(b, 999999, 3) AS in2 FROM gfs_bloom""".stripMargin)
      .head()
    assert(hits.getAs[Boolean]("in1")) // 7 was inserted — no false negatives
  }

  test("extensions class injects the same function set") {
    val names = GraftFunctions.functions.map(_._1)
    assert(names.distinct.size == names.size, "duplicate function names")
    // the extensions path delegates to the same builder table
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
    // every registered name resolves in the live session registry
    names.foreach { n =>
      assert(spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n)), n)
    }
  }
}
