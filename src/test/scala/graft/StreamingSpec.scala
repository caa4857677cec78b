package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streaming
import graft.streaming.Streaming.Ev

/** Drives the streaming transforms through real Structured Streaming
  * (MemoryStream source → memory sink), not just their batch analogs.
  */
class StreamingSpec extends SparkSpec {

  test("windowAgg runs as a genuine streaming query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    input.addData(
      (Timestamp.valueOf("2024-01-01 01:00:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 02:00:00"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 07:00:00"), "click", 4.0))
    val q = Streaming.windowAgg(events)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_out").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSet
    assert(rows === Set(
      ("2024-01-01 00:00:00", 2L, 3.0),
      ("2024-01-01 06:00:00", 1L, 4.0)))
  }

  test("ohlcBars streams: open/close pick first/last tick across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val ticks = input.toDF().toDF("ts", "event_id", "event_type", "value")
    val q = Streaming.ohlcBars(ticks)
      .writeStream.outputMode("complete")
      .format("memory").queryName("ohlc_out").start()
    input.addData(
      (Timestamp.valueOf("2024-01-01 09:30:00"), 1L, "AAA", 100.0),
      (Timestamp.valueOf("2024-01-01 12:00:00"), 2L, "AAA", 95.0))
    q.processAllAvailable()
    // second micro-batch extends the same bar: later close, new high
    input.addData(
      (Timestamp.valueOf("2024-01-01 16:00:00"), 3L, "AAA", 104.0),
      (Timestamp.valueOf("2024-01-02 09:30:00"), 4L, "AAA", 101.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ohlc_out").collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .toSet
    assert(rows === Set(
      ("2024-01-01", 100.0, 104.0, 95.0, 104.0, 3L),
      ("2024-01-02", 101.0, 101.0, 101.0, 101.0, 1L)))
  }

  test("graft-snapshot source streams table commits as CDC micro-batches") {
    import spark.implicits._
    import graft.lake.SnapshotTable
    val root = "/tmp/graft_test/snap_stream_src"
    val ckpt = "/tmp/graft_test/snap_stream_ckpt"
    SnapshotTable.drop(spark, root)
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(ckpt), true)
    SnapshotTable.commit(spark, root, Seq(1, 2).toDF("x"))
    val q = spark.readStream.format("graft-snapshot").option("path", root)
      .load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("cdc_out").start()
    q.processAllAvailable()
    def got = spark.table("cdc_out").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got === Set((1, "insert"), (2, "insert")))
    // new commits arrive as subsequent micro-batches
    SnapshotTable.commit(spark, root, Seq(3).toDF("x"))
    SnapshotTable.deleteWhere(spark, root, org.apache.spark.sql.functions.col("x") === 1)
    q.processAllAvailable()
    q.stop()
    assert(got === Set((1, "insert"), (2, "insert"), (3, "insert"), (1, "delete")))
  }

  test("ohlcBars + watermark emit only FINALIZED bars in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val ticks = input.toDF().toDF("ts", "event_id", "event_type", "value")
      .withWatermark("ts", "1 hour")
    val q = Streaming.ohlcBars(ticks)
      .writeStream.outputMode("append")
      .format("memory").queryName("ohlc_final").start()
    input.addData(
      (Timestamp.valueOf("2024-01-01 09:30:00"), 1L, "AAA", 100.0),
      (Timestamp.valueOf("2024-01-01 16:00:00"), 2L, "AAA", 104.0))
    q.processAllAvailable()
    // bar still open: nothing emitted yet
    assert(spark.table("ohlc_final").count() === 0)
    // a tick far past the window + watermark closes day 1
    input.addData((Timestamp.valueOf("2024-01-03 09:30:00"), 3L, "AAA", 101.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ohlc_final").collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(5), r.getLong(6))).toSet
    assert(rows === Set(("2024-01-01", 100.0, 104.0, 2L)),
      "exactly the finalized day-1 bar, with its final open/close")
  }

  test("graft-snapshot source recovers from the checkpoint after a restart") {
    import spark.implicits._
    import graft.lake.SnapshotTable
    val root = "/tmp/graft_test/snap_restart_src"
    val ckpt = "/tmp/graft_test/snap_restart_ckpt"
    SnapshotTable.drop(spark, root)
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(ckpt), true)
    val replica = "/tmp/graft_test/snap_restart_dst"
    SnapshotTable.drop(spark, replica)
    SnapshotTable.commit(spark, root, Seq(1, 2).toDF("x"))
    def start() = graft.lake.LakeSink.startCdc(
      spark.readStream.format("graft-snapshot").option("path", root).load(),
      replica, ckpt)
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    val replicaVersionAfterFirstRun = SnapshotTable.currentVersion(spark, replica)
    // commits while the query is DOWN
    SnapshotTable.commit(spark, root, Seq(3).toDF("x"))
    // restart: the engine hands the source a SerializedOffset from the
    // checkpoint log — only the missed delta arrives, nothing replays
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(SnapshotTable.read(spark, replica).collect().map(_.getInt(0)).sorted.toSeq
      === Seq(1, 2, 3))
    assert(SnapshotTable.currentVersion(spark, replica) === replicaVersionAfterFirstRun + 1,
      "restart must apply exactly one delta commit, not replay history")
  }

  test("crash between table commit and checkpoint commit: replayed batch is a no-op") {
    import spark.implicits._
    import graft.lake.SnapshotTable
    val root = "/tmp/graft_test/crash_src"
    val replica = "/tmp/graft_test/crash_dst"
    val ckpt = "/tmp/graft_test/crash_ckpt"
    Seq(root, replica, ckpt).foreach(SnapshotTable.drop(spark, _))
    SnapshotTable.commit(spark, root, Seq(1, 2).toDF("x"))
    def start() = graft.lake.LakeSink.startCdc(
      spark.readStream.format("graft-snapshot").option("path", root).load(),
      replica, ckpt)
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    // simulate dying AFTER the replica table commit but BEFORE the
    // engine's checkpoint commit: erase the commit marker for the last
    // batch, so the restarted query re-runs batch 0 with the same data
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$ckpt/commits/0"), false),
      "expected a commit marker for batch 0")
    val versionAfterRun1 = SnapshotTable.currentVersion(spark, replica)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    // the replay hit applyCdc with batchId 0 again; the manifest-stamped
    // batch id made it a no-op — same contents, NO new replica version
    assert(SnapshotTable.currentVersion(spark, replica) === versionAfterRun1,
      "replayed batch must not create a new replica version")
    assert(SnapshotTable.read(spark, replica).collect().map(_.getInt(0)).sorted.toSeq
      === Seq(1, 2))
  }

  test("end-to-end streaming replication: source table -> CDC stream -> replica table") {
    import spark.implicits._
    import graft.lake.{LakeSink, SnapshotTable}
    import org.apache.spark.sql.functions.col
    val src = "/tmp/graft_test/repl_src"
    val dst = "/tmp/graft_test/repl_dst"
    val ckpt = "/tmp/graft_test/repl_ckpt"
    SnapshotTable.drop(spark, src); SnapshotTable.drop(spark, dst)
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(ckpt), true)
    SnapshotTable.commit(spark, src, Seq(1, 2, 3).toDF("x"))
    val cdc = spark.readStream.format("graft-snapshot").option("path", src).load()
    val q = LakeSink.startCdc(cdc, dst, ckpt)
    def contents(root: String) =
      SnapshotTable.read(spark, root).collect().map(_.getInt(0)).sorted.toSeq
    q.processAllAvailable()
    assert(contents(dst) === contents(src))
    SnapshotTable.commit(spark, src, Seq(4, 5).toDF("x"))
    SnapshotTable.deleteWhere(spark, src, col("x") === 2)
    SnapshotTable.updateWhere(spark, src, col("x") === 4,
      Map("x" -> org.apache.spark.sql.functions.lit(40)))
    q.processAllAvailable()
    q.stop()
    assert(contents(dst) === Seq(1, 3, 5, 40))
    assert(contents(dst) === contents(src))
  }

  test("sessionizeStream closes sessions on gap and carries state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = Streaming.sessionizeStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    // batch 1: two events 10 min apart (same session)
    input.addData(
      Ev(7L, Timestamp.valueOf("2024-01-01 00:00:00"), 1),
      Ev(7L, Timestamp.valueOf("2024-01-01 00:10:00"), 2))
    q.processAllAvailable()
    assert(spark.table("sess_out").count() === 0) // session still open
    // batch 2: 2h later -> closes session 1 (2 events, 10 min)
    input.addData(Ev(7L, Timestamp.valueOf("2024-01-01 02:10:00"), 3))
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sess_out").as[Streaming.SessionOut].collect()
    assert(closed.toSeq === Seq(Streaming.SessionOut(7L, 2, 10L)))
  }

  test("streaming dedup drops duplicate ids across micro-batches within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val deduped = input.toDF().toDF("ts", "id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    input.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:01"), 2L))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 10:00:02"), 1L), (ts("2024-01-01 10:00:03"), 3L)) // 1 is a dup
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream join with watermarks joins events within the time bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("c_ts", "c_user").withWatermark("c_ts", "1 hour")
    val b = buys.toDF().toDF("b_ts", "b_user").withWatermark("b_ts", "1 hour")
    val joined = c.join(b,
      org.apache.spark.sql.functions.expr(
        "c_user = b_user AND b_ts >= c_ts AND b_ts <= c_ts + interval 30 minutes"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    clicks.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:00"), 2L))
    buys.addData((ts("2024-01-01 10:20:00"), 1L), (ts("2024-01-01 11:30:00"), 2L)) // 2L outside bound
    q.processAllAvailable()
    q.stop()
    val users = spark.table("ss_join").select("c_user").collect().map(_.getLong(0)).toSeq
    assert(users === Seq(1L)) // only the within-30min pair joins
  }

  test("batch sessionize and streaming sessionize agree on closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // deterministic event set: 3 users, gaps of 5/40/90 minutes
    val evs = for {
      u <- 1L to 3L
      (off, id) <- Seq((0L, 1L), (5L, 2L), (45L, 3L), (135L, 4L))
    } yield Ev(u, new Timestamp(1704067200000L + (u * 7 + off) * 60000L), id)

    val input = MemoryStream[Ev]
    val q = Streaming.sessionizeStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_par").start()
    input.addData(evs: _*)
    // force all sessions closed with a far-future event per user
    input.addData((1L to 3L).map(u => Ev(u, Timestamp.valueOf("2030-01-01 00:00:00"), 99L)): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_par").as[Streaming.SessionOut]
      .collect().toSeq.sortBy(s => (s.user_id, s.dur_min)).map(s => (s.user_id, s.n_events, s.dur_min))
    // expected: per user, sessions {1:(0,5) 2 events 5min}, {2:(45) 1 event}, {3:(135) 1 event}
    val expected = (1L to 3L).flatMap(u => Seq((u, 1, 0L), (u, 1, 0L), (u, 2, 5L)))
      .sortBy(s => (s._1, s._3))
    assert(streamed === expected)
  }
}
