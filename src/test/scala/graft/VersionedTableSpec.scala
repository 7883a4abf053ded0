package graft

import graft.sources.VersionedTable

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  test("versioned writes, versionAsOf / timestampAsOf reads, snapshot diff") {
    val root = java.nio.file.Files.createTempDirectory("graft_vt").toString + "/t"

    val v0 = VersionedTable.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), root)
    val t0 = System.currentTimeMillis()
    Thread.sleep(20)
    val v1 = VersionedTable.write(Seq((1, "a2"), (3, "c")).toDF("id", "v"), root)
    assert(v0 == 0L && v1 == 1L)
    assert(VersionedTable.versions(spark, root) == Seq(0L, 1L))

    // latest
    val latest = VersionedTable.read(spark, root)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(latest == Map(1 -> "a2", 3 -> "c"))
    // time travel by version
    val old = VersionedTable.read(spark, root, versionAsOf = Some(0L))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(old == Map(1 -> "a", 2 -> "b"))
    // time travel by timestamp: t0 falls between the two commits
    val asOf = VersionedTable.read(spark, root, timestampAsOfMs = Some(t0))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(asOf == Map(1 -> "a", 2 -> "b"))
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root, versionAsOf = Some(9L))
    }

    // snapshot diff: id=2 was in v0 but not v1 -> detected as deleted
    val deleted = VersionedTable.snapshotDiff(spark, root, Seq("id"))
      .collect().map(_.getInt(0)).toSeq
    assert(deleted == Seq(2))

    // a third write keeps history intact
    VersionedTable.write(Seq((3, "c")).toDF("id", "v"), root)
    assert(VersionedTable.versions(spark, root) == Seq(0L, 1L, 2L))
    assert(VersionedTable.read(spark, root, versionAsOf = Some(0L)).count() == 2)
  }
}
