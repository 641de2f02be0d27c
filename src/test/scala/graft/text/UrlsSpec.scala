package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canonOf(urls: String*): Seq[Option[String]] =
    urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "url")
      .orderBy("doc_id")
      .select(Urls.canonicalize(col("url")).as("c"))
      .as[Option[String]].collect().toSeq

  test("canonicalize: case, default port, trailing slash, tracking, order, fragment") {
    val Seq(a, b, c, d) = canonOf(
      "HTTP://WWW.Ex.COM:80/a/?b=2&utm_source=x&a=1#frag",
      "http://www.ex.com/a?a=1&b=2",
      "https://www.ex.com:443/",
      "https://www.ex.com:8443/?gclid=z&fbclid=q")
    assert(a.contains("http://www.ex.com/a?a=1&b=2"))
    assert(b.contains("http://www.ex.com/a?a=1&b=2"))
    assert(a == b)
    assert(c.contains("https://www.ex.com/"))
    // non-default port kept; tracking-only query stripped entirely
    assert(d.contains("https://www.ex.com:8443/"))
  }

  test("canonicalize: port kept when not the scheme's default; malformed is NULL") {
    val Seq(a, b, c, d) = canonOf(
      "https://h.io:80/x",   // 80 is NOT https's default
      "http://h.io:8080/x",
      "not a url at all",
      "file-missing-host://")
    assert(a.contains("https://h.io:80/x"))
    assert(b.contains("http://h.io:8080/x"))
    assert(c.isEmpty && d.isEmpty)
  }

  test("canonicalize is idempotent on its own output") {
    val urls = Urls.genUrls(spark, rows = 500, parts = 4).toDF()
    val once = urls.select(col("doc_id"), Urls.canonicalize(col("url")).as("url"))
    val twice = once.select(col("doc_id"), Urls.canonicalize(col("url")).as("c2"))
      .join(once.withColumnRenamed("url", "c1"), "doc_id")
      .filter(col("c1") =!= col("c2") ||
        (col("c1").isNull =!= col("c2").isNull))
    assert(twice.count() == 0)
  }

  test("generator: same-group rows fold to one canonical; groups stay distinct") {
    val df = Urls.genUrls(spark, rows = 4000, parts = 8).toDF()
      .withColumn("canon", Urls.canonicalize(col("url")))
    assert(df.filter(col("canon").isNull).count() == 0)
    // recompute group id the generator's way and check the fold is exact
    val withG = df.as[(Long, String, String)].collect().map { case (id, _, c) =>
      (graft.core.Mix.bounded(0xA201L, id, 0, 1500), c)
    }
    withG.groupBy(_._1).foreach { case (g, rows) =>
      assert(rows.map(_._2).distinct.length == 1, s"group $g split")
    }
    val canonPerGroup = withG.distinct
    assert(canonPerGroup.map(_._2).distinct.length == canonPerGroup.length,
      "two groups collided on one canonical url")
  }

  test("generator is parallelism-invariant") {
    def digest(parts: Int) = Urls.genUrls(spark, 2000, parts).toDF()
      .agg(expr("bit_xor(xxhash64(doc_id, url))")).as[Long].head()
    assert(digest(2) == digest(16))
  }
}
