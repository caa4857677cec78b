package graft

import graft.lake.SnapshotTable

class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  test("append commits accumulate; time travel reads exact versions") {
    val root = "/tmp/graft_test/snap_basic"
    SnapshotTable.drop(spark, root)
    val v1 = SnapshotTable.commit(spark, root, Seq(1, 2, 3).toDF("x"))
    val v2 = SnapshotTable.commit(spark, root, Seq(4, 5).toDF("x"))
    assert(v1 === 1 && v2 === 2)
    assert(SnapshotTable.read(spark, root, 1).count() === 3)
    assert(SnapshotTable.read(spark, root, 2).count() === 5)
    assert(SnapshotTable.read(spark, root).count() === 5) // latest
  }

  test("overwrite commit replaces visibility but keeps old versions readable") {
    val root = "/tmp/graft_test/snap_overwrite"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, Seq(1, 2, 3).toDF("x"))
    SnapshotTable.commit(spark, root, Seq(9).toDF("x"), append = false)
    assert(SnapshotTable.read(spark, root, 2).collect().map(_.getInt(0)).toSet === Set(9))
    assert(SnapshotTable.read(spark, root, 1).count() === 3) // time travel intact
  }

  test("drop removes the table") {
    val root = "/tmp/graft_test/snap_drop"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, Seq(1).toDF("x"))
    SnapshotTable.drop(spark, root)
    assert(SnapshotTable.currentVersion(spark, root) === 0)
  }
}
