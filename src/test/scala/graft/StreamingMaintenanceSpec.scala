package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.lake.{LakeSink, SnapshotTable}

/** Maintenance running NEXT TO a live streaming sink — the deployment
  * shape every production lake has (micro-batches landing every few
  * seconds, compaction folding them nightly). This only works because
  * BOTH writers are rebase-capable: LakeSink commits through
  * commitAppend (staged data + CAS rebase) and compactSmallFiles /
  * compactDeletes publish through publishRewrite (rebase over pure
  * appends). A fail-loud writer on either side would either kill the
  * streaming query or starve maintenance forever.
  */
class StreamingMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("optimize between micro-batches: stream continues, files fold, content exact") {
    val root = "/tmp/graft_test/smaint_interleave"
    val ckpt = "/tmp/graft_test/smaint_interleave_ckpt"
    SnapshotTable.drop(spark, root)
    SnapshotTable.drop(spark, ckpt)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = LakeSink.start(input.toDF().toDF("id", "v"), root, ckpt)
    try {
      input.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      input.addData((3L, "c")); q.processAllAvailable()
      val beforeFiles = SnapshotTable.dataFiles(
        spark, root, SnapshotTable.currentVersion(spark, root)).size
      assert(beforeFiles >= 2, "two committed micro-batches worth of files")
      // nightly job lands between micro-batches
      val vOpt = SnapshotTable.compactSmallFiles(spark, root,
        smallBytes = Long.MaxValue, targetBytes = 8L << 30)
      assert(SnapshotTable.dataFiles(spark, root, vOpt).size < beforeFiles)
      // the stream keeps appending on top of the optimized snapshot
      input.addData((4L, "d")); q.processAllAvailable()
      val got = SnapshotTable.read(spark, root).as[(Long, String)].collect().sorted
      assert(got.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    } finally q.stop()
  }

  test("optimize racing the stream on a thread: both rebase, zero loss") {
    val root = "/tmp/graft_test/smaint_race"
    val ckpt = "/tmp/graft_test/smaint_race_ckpt"
    SnapshotTable.drop(spark, root)
    SnapshotTable.drop(spark, ckpt)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = LakeSink.start(input.toDF().toDF("id", "v"), root, ckpt)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maintErr = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val maint = new Thread(() => {
      while (!stop.get()) {
        try {
          if (SnapshotTable.currentVersion(spark, root) >= 1) {
            SnapshotTable.compactSmallFiles(spark, root,
              smallBytes = Long.MaxValue, targetBytes = 8L << 30)
            ()
          }
        } catch {
          // a CONFLICT abort (another rewrite won) is a legitimate
          // outcome for maintenance — it re-plans next cycle; anything
          // else (especially a starvation throw) fails the test
          case e: IllegalStateException if e.getMessage.contains("re-plan") => ()
          case e: Throwable => maintErr.set(e); stop.set(true)
        }
        Thread.sleep(10)
      }
    })
    try {
      maint.start()
      (0 until 10).foreach { i =>
        input.addData((i.toLong, s"v$i")); q.processAllAvailable()
      }
    } finally {
      stop.set(true); maint.join(10000); q.stop()
    }
    assert(maintErr.get() == null,
      s"maintenance must never fail next to the stream: ${maintErr.get()}")
    val got = SnapshotTable.read(spark, root).as[(Long, String)].collect().sorted
    assert(got.toSeq === (0 until 10).map(i => (i.toLong, s"v$i")),
      "every micro-batch row present exactly once — no loss under the race")
  }

  test("commitAppend stores logical columns under physical names on a renamed table") {
    val root = "/tmp/graft_test/smaint_rename"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, Seq((1L, "a")).toDF("id", "v"))
    SnapshotTable.renameColumn(spark, root, "v", "label")
    // append speaks the CURRENT logical schema; bytes must land under
    // the original physical name or the mapped read breaks
    SnapshotTable.commitAppend(spark, root, Seq((2L, "b")).toDF("id", "label"))
    val got = SnapshotTable.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "label"))
    assert(got.as[(Long, String)].collect().sorted.toSeq === Seq((1L, "a"), (2L, "b")))
  }
}
