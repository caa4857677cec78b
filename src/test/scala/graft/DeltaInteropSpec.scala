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
    // the intermediate version (v1: pre-delete visibility wider than
    // the engine's own view at that version) is marked ON THE WIRE —
    // ADVICE r16: the divergence must be visible to the foreign
    // reader, not only in our scaladoc
    val fs = new Path(export).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def logText(deltaV: Int): String = {
      val in = fs.open(new Path(s"$export/_delta_log/" + "%020d.json".format(deltaV)))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    assert(logText(1).contains("pending merge-on-read deletes"),
      "MoR-pending intermediate version must carry a commitInfo marker")
    assert(!logText(2).contains("pending merge-on-read deletes"),
      "the folded head is exact — no marker")
  }

  test("re-export of an OLDER version truncates stale newer commits") {
    // ADVICE r16: exporting v2 into a dir previously exported at v3
    // left the newer JSON + checkpoint behind, and readLog bootstrapped
    // PAST the requested version
    val root = "/tmp/graft_test/delta_reexport"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, Seq((1L, "a")).toDF("id", "v"))
    SnapshotTable.commitAppend(spark, root, Seq((2L, "b")).toDF("id", "v"))
    SnapshotTable.commitAppend(spark, root, Seq((3L, "c")).toDF("id", "v"))
    val export = "/tmp/graft_test/delta_reexport_out"
    SnapshotTable.drop(spark, export)
    DeltaInterop.writeLog(spark, root, export) // head = v3
    val (all, _, _) = DeltaInterop.readLog(spark, export)
    assert(spark.read.parquet(all: _*).count() === 3)
    DeltaInterop.writeLog(spark, root, export, version = 2) // re-export older
    val fs = new Path(export).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$export/_delta_log/" + "%020d.json".format(2))),
      "stale newer commit JSON must be truncated")
    assert(!fs.exists(new Path(s"$export/_delta_log/" + "%020d.checkpoint.parquet".format(2))),
      "stale newer checkpoint must be truncated")
    val (files, _, _) = DeltaInterop.readLog(spark, export)
    assert(spark.read.parquet(files: _*).select("id").as[Long].collect().toSet
      === Set(1L, 2L), "re-exported dir must reconstruct exactly v2")
  }
}
