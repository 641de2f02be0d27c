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
}
