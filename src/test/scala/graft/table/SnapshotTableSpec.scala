package graft.table

import graft.SparkSpec
import java.nio.file.Files

class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("snaptbl").toString + "/t"

  test("append/read round trip, snapshot isolation") {
    val t = new SnapshotTable(tmp())
    assert(t.read(spark).isEmpty)
    assert(t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), "job1"))
    assert(t.currentVersion == 1)
    assert(t.read(spark).get.count() == 2)
    assert(t.append(Seq((3, "c")).toDF("k", "v"), "job2"))
    assert(t.read(spark).get.count() == 3)
    assert(t.read(spark).get.as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b"), (3, "c")))
    t.destroy()
  }

  test("idempotent commit by jobId — restart adds zero duplicate rows") {
    val t = new SnapshotTable(tmp())
    assert(t.append(Seq((1, "a")).toDF("k", "v"), "jobX"))
    // the restart re-run: same jobId must be a no-op
    assert(!t.append(Seq((1, "a")).toDF("k", "v"), "jobX"))
    assert(t.currentVersion == 1)
    assert(t.read(spark).get.count() == 1)
    t.destroy()
  }

  test("orphaned data (crash before manifest) is invisible to readers") {
    val t = new SnapshotTable(tmp())
    t.append(Seq((1, "a")).toDF("k", "v"), "job1")
    // simulate a crash after data write, before manifest/pointer:
    Seq((9, "z")).toDF("k", "v").write.parquet(t.root + "/data/snap-99999-crashed")
    assert(t.read(spark).get.count() == 1) // orphan not read
    t.destroy()
  }

  test("partitioned append reads back partition column") {
    val t = new SnapshotTable(tmp())
    t.append(Seq((1, "web"), (2, "code")).toDF("k", "source"), "j1", partitionBy = Seq("source"))
    t.append(Seq((3, "web")).toDF("k", "source"), "j2", partitionBy = Seq("source"))
    val got = t.read(spark).get
    assert(got.columns.toSet == Set("k", "source"))
    assert(got.as[(Int, String)].collect().toSet == Set((1, "web"), (2, "code"), (3, "web")))
    t.destroy()
  }

  test("empty append commits and stays readable") {
    val t = new SnapshotTable(tmp())
    t.append(Seq((1, "a")).toDF("k", "v"), "j1")
    t.append(Seq.empty[(Int, String)].toDF("k", "v"), "j2")
    assert(t.currentVersion == 2)
    assert(t.read(spark).get.count() == 1)
    t.destroy()
  }

  test("time travel: readAsOf returns the historical state") {
    val t = new SnapshotTable(tmp())
    t.append(Seq((1, "a")).toDF("k", "v"), "j1")
    t.append(Seq((2, "b")).toDF("k", "v"), "j2")
    t.append(Seq((3, "c")).toDF("k", "v"), "j3")
    assert(t.readAsOf(spark, 1).get.count() == 1)
    assert(t.readAsOf(spark, 2).get.count() == 2)
    assert(t.read(spark).get.count() == 3)
    t.destroy()
  }

  test("compact: one rewrite snapshot, same rows, single data dir; expire drops history") {
    val t = new SnapshotTable(tmp())
    (1 to 4).foreach(i => t.append(Seq((i, s"r$i")).toDF("k", "v"), s"j$i"))
    assert(t.compact(spark, "compact-1"))
    assert(t.read(spark).get.as[(Int, String)].collect().toSet ==
      (1 to 4).map(i => (i, s"r$i")).toSet)
    // compaction is idempotent by jobId too
    assert(!t.compact(spark, "compact-1"))
    // reads after compaction touch only the rewrite snapshot
    assert(t.stats.last._2 == "rewrite")
    val expired = t.expireSnapshots()
    assert(expired == 4)
    assert(t.read(spark).get.count() == 4) // current read unaffected
    // appends continue on top of the rewrite
    t.append(Seq((5, "r5")).toDF("k", "v"), "j5")
    assert(t.read(spark).get.count() == 5)
    t.destroy()
  }

  test("time travel to an expired snapshot fails with a clear error") {
    val t = new SnapshotTable(tmp())
    t.append(Seq((1, "a")).toDF("k", "v"), "j1")
    t.append(Seq((2, "b")).toDF("k", "v"), "j2")
    t.compact(spark, "compact-1")
    t.expireSnapshots()
    val e = intercept[IllegalStateException](t.readAsOf(spark, 1))
    assert(e.getMessage.contains("snapshot expired"))
    assert(t.read(spark).get.count() == 2) // current read unaffected
    t.destroy()
  }
}
