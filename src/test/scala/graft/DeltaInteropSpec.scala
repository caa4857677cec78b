package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

import graft.lake.{DeltaInterop, SnapshotTable}

/** [[DeltaInterop]] edge surface the gate entries don't reach: the
  * export of a retention-expired table (chain truncation, like Delta's
  * own log cleanup) and the loud refusal of pending merge-on-read
  * deletes (Delta's log cannot express them).
  */
class DeltaInteropSpec extends SparkSpec {
  import spark.implicits._

  test("export after expire() truncates the chain; checkpoint still serves the head") {
    val root = "/tmp/graft_test/delta_expire"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, (0 until 10).map(k => (k.toLong, s"a$k")).toDF("id", "v"))
    SnapshotTable.commit(spark, root,
      (10 until 20).map(k => (k.toLong, s"b$k")).toDF("id", "v"), append = false)
    SnapshotTable.commitAppend(spark, root, (20 until 25).map(k => (k.toLong, s"c$k")).toDF("id", "v"))
    val (expired, _) = SnapshotTable.expire(spark, root, keepLast = 2)
    assert(expired === Seq(1), "v1 must expire (its overwritten files reclaimed)")
    val export = "/tmp/graft_test/delta_expire_out"
    SnapshotTable.drop(spark, export)
    DeltaInterop.writeLog(spark, root, export)
    val fs = new Path(export).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the chain starts at the earliest LIVE version — no delta v0
    assert(!fs.exists(new Path(s"$export/_delta_log/" + "%020d.json".format(0))))
    assert(fs.exists(new Path(s"$export/_delta_log/" + "%020d.json".format(1))))
    assert(fs.exists(new Path(s"$export/_delta_log/_last_checkpoint")))
    // readLog (checkpoint bootstrap) reconstructs the head exactly
    val (files, _, _) = DeltaInterop.readLog(spark, export)
    assert(spark.read.parquet(files: _*).count() === 15)
  }

  test("export refuses a head with pending merge-on-read deletes") {
    val root = "/tmp/graft_test/delta_mor_refuse"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, (0 until 10).map(k => (k.toLong, s"r$k")).toDF("id", "v"))
    SnapshotTable.deleteWhereMor(spark, root, col("id") === 3L)
    val export = "/tmp/graft_test/delta_mor_refuse_out"
    SnapshotTable.drop(spark, export)
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.writeLog(spark, root, export)
    }
    assert(e.getMessage.contains("compactDeletes"), e.getMessage)
    // folding the deletes unblocks the export, deleted row stays gone
    SnapshotTable.compactDeletes(spark, root)
    DeltaInterop.writeLog(spark, root, export)
    val (files, _, _) = DeltaInterop.readLog(spark, export)
    val got = spark.read.parquet(files: _*).select("id").as[Long].collect().toSet
    assert(got === (0 until 10).map(_.toLong).toSet - 3L)
  }
}
