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

  test("streaming micro-batches commit as snapshot versions (LakeSink)") {
    implicit val sqlCtx = spark.sqlContext
    val root = "/tmp/graft_test/snap_stream"
    val ckpt = "/tmp/graft_test/snap_stream_ckpt"
    graft.lake.SnapshotTable.drop(spark, root)
    graft.lake.SnapshotTable.drop(spark, ckpt)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = graft.lake.LakeSink.start(input.toDF().toDF("x"), root, ckpt)
    input.addData(1L, 2L, 3L)
    q.processAllAvailable()
    input.addData(4L, 5L)
    q.processAllAvailable()
    q.stop()
    assert(graft.lake.SnapshotTable.currentVersion(spark, root) === 2)
    assert(graft.lake.SnapshotTable.read(spark, root, 1).count() === 3)
    assert(graft.lake.SnapshotTable.read(spark, root, 2).count() === 5)
  }

  test("drop removes the table") {
    val root = "/tmp/graft_test/snap_drop"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, Seq(1).toDF("x"))
    SnapshotTable.drop(spark, root)
    assert(SnapshotTable.currentVersion(spark, root) === 0)
  }
}
