package graft

import graft.lake.SnapshotTable

/** VERDICT r9 item 3: multi-writer ROW-LEVEL concurrency — appends
  * racing equality deletes / upserts (the Flink-CDC-writer-next-to-a
  * -batch-appender scenario). Two properties are pinned:
  *
  *  1. SEQUENCE MONOTONICITY UNDER REBASE — every commit's newly
  *     added manifest lines carry a data/delete sequence number equal
  *     to (max sequence visible at the previous version) + 1, i.e.
  *     Iceberg's commit-time sequence assignment. A commitAppend that
  *     stamped its _seq against the pre-CAS head and then rebased
  *     over an intervening eq commit would land with a STALE LOWER
  *     seq — the row-loss bug where a delete issued before the rows
  *     were visible wrongly suppresses them. The manifest history is
  *     parsed directly (storage format, like the torn-manifest spec)
  *     so a regression cannot hide behind the read path.
  *
  *  2. SERIALIZABILITY — the final table content equals a
  *     single-threaded replay of every writer's ops in the serialized
  *     (version) order: zero row loss, zero resurrection.
  *
  * Eq/MoR writers keep their fail-loud single-attempt CAS; the test
  * wraps them in the documented client-side retry (re-invoke, which
  * re-reads the head and re-plans — always safe for eq ops because
  * they read no table state beyond the version number).
  */
class RowLevelConcurrencySpec extends SparkSpec {
  import spark.implicits._

  /** All (path, annotations) lines of version v, refs resolved, read
    * straight off the storage format.
    */
  private def rawLines(root: String, v: Int): Seq[String] = {
    def readFile(p: String): Seq[String] =
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
        .linesIterator.toVector
    readFile(s"$root/_manifests/v$v.manifest").flatMap { l =>
      if (l.startsWith(">"))
        readFile(l.drop(1).replaceFirst("^[a-zA-Z0-9]+:(//)?", ""))
      else Seq(l)
    }.filterNot(_.startsWith("#")).filter(_.nonEmpty)
  }

  private def seqOf(l: String): Option[Long] =
    l.split('\t').tail.collectFirst {
      case a if a.startsWith("_seq=") => a.stripPrefix("_seq=").toLong
      case a if a.startsWith("_eqseq=") => a.stripPrefix("_eqseq=").toLong
    }

  private def retryEq[A](body: => A): A = {
    var left = 60
    while (true) {
      try return body
      catch {
        case _: IllegalStateException if left > 0 =>
          left -= 1; Thread.sleep(2L + scala.util.Random.nextInt(6))
      }
    }
    sys.error("unreachable")
  }

  test("appends racing eq deletes/upserts: commit-time seq assignment + serializable replay") {
    val root = "/tmp/graft_test/rowlevel_concurrency"
    SnapshotTable.drop(spark, root)
    // v1 bootstrap: keys 0..9, generation -1
    SnapshotTable.commit(spark, root,
      (0 until 10).map(k => (k, -1)).toDF("k", "gen"))

    // each buffer is written by exactly one thread and read after join
    val opsA = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Seq[(Int, Int)])]
    val opsB = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Seq[(Int, Int)])]
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._

    // writer A: batch appender — fresh keys 100.., generation = i
    val a = Future {
      (0 until 12).foreach { i =>
        val rows = Seq((100 + i, i))
        val v = SnapshotTable.commitAppend(spark, root, rows.toDF("k", "gen"))
        opsA += ((v, "append", rows)); ()
      }
    }
    // writer B: CDC writer — upsertEq over the 0..9 key space and
    // deleteWhereEq of one key, alternating, client-side retry
    val b = Future {
      (0 until 12).foreach { i =>
        if (i % 3 == 2) {
          val k = i % 10
          val v = retryEq(SnapshotTable.deleteWhereEq(spark, root,
            Seq("k"), Seq(k).toDF("k")))
          opsB += ((v, "delete_eq", Seq((k, 0)))); ()
        } else {
          val rows = Seq((i % 10, 1000 + i))
          val v = retryEq(SnapshotTable.upsertEq(spark, root, Seq("k"), rows.toDF("k", "gen")))
          opsB += ((v, "upsert_eq", rows)); ()
        }
      }
    }
    Await.result(Future.sequence(Seq(a, b)), 600.seconds)
    pool.shutdown()

    val top = SnapshotTable.currentVersion(spark, root)
    assert(top === 25, "1 bootstrap + 12 appends + 12 eq commits, all serialized")

    // --- property 1: commit-time sequence assignment ---------------
    // lines NEW at v (not present at v-1) must all carry seq ==
    // max-seq-visible-at(v-1) + 1; seq history strictly increases
    (2 to top).foreach { v =>
      val prev = rawLines(root, v - 1)
      val curL = rawLines(root, v)
      val prevSet = prev.toSet
      val added = curL.filterNot(prevSet.contains)
      assert(added.nonEmpty, s"every commit here adds lines (v$v)")
      val prevMax = prev.flatMap(seqOf).max
      val newSeqs = added.flatMap(seqOf).distinct
      assert(newSeqs === Seq(prevMax + 1),
        s"v$v: new lines must be stamped against the head they landed on " +
          s"(expected ${prevMax + 1}, got $newSeqs) — a stale staged seq " +
          "is the rebase row-loss bug")
    }

    // --- property 2: serializable replay ---------------------------
    val log = (opsA ++ opsB).sortBy(_._1)
    assert(log.map(_._1).toSeq === (2 to top), "each version claimed exactly once")
    var state = (0 until 10).map(k => k -> -1).toMap // k -> gen (keys unique per replay)
    log.foreach {
      case (_, "append", rows) => state = state ++ rows
      case (_, "upsert_eq", rows) => state = state ++ rows
      case (_, "delete_eq", rows) => state = state -- rows.map(_._1)
      case other => fail(s"unexpected op $other")
    }
    val got = SnapshotTable.read(spark, root).as[(Int, Int)].collect().sorted.toSeq
    assert(got === state.toSeq.sorted,
      "final content must equal the serialized replay — no loss, no resurrection")
  }

  test("a forced rebase over an append + eq delete keeps the appended row alive") {
    // DETERMINISTIC replay of the exact ADVICE r9 interleaving: after
    // commitAppend has stamped and staged its fragment but BEFORE its
    // CAS, (a) a concurrent append bumps the max data seq and (b) an
    // eq DELETE of the very key being appended lands with a higher
    // _eqseq. A committer that kept its pre-CAS staged seq would land
    // the rebase with seq < eqseq and its rows would be wrongly
    // suppressed by a delete issued before they were visible.
    // Commit-time re-stamping must keep the row alive. The
    // interleaving is injected via an FS hook that fires exactly once,
    // synchronously inside the staged-fragment create — no sleeps, no
    // thread scheduling luck.
    val root = "graftseam:///tmp/graft_test/rowlevel_rebase"
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftseam.impl", classOf[FragSeamFs].getName)
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, Seq((1, "old"), (2, "keep")).toDF("k", "v"))

    FragSeamFs.armOnce { () =>
      // (a) unrelated append bumps max _seq past the staged value…
      SnapshotTable.commit(spark, root, Seq((50, "bump")).toDF("k", "v"))
      // (b) …then the CDC writer eq-deletes key 1 at a higher _eqseq
      SnapshotTable.deleteWhereEq(spark, root, Seq("k"), Seq(1).toDF("k"))
    }
    val vApp =
      try SnapshotTable.commitAppend(spark, root, Seq((1, "new")).toDF("k", "v"))
      finally FragSeamFs.disarm()

    assert(vApp === 4, "append must have rebased over the two injected commits")
    val byK = SnapshotTable.read(spark, root).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(byK(2) === "keep")
    assert(byK(50) === "bump")
    assert(byK.get(1) === Some("new"),
      "the appended row must survive an eq delete issued BEFORE it was " +
        "visible — stale staged _seq (the r9 ADVICE bug) would suppress it")
    // and the landed manifest line really carries the re-stamped seq
    val lines = rawLines(root.stripPrefix("graftseam://"), vApp)
    val prevMax = rawLines(root.stripPrefix("graftseam://"), vApp - 1).flatMap(seqOf).max
    val prevSet = rawLines(root.stripPrefix("graftseam://"), vApp - 1).toSet
    assert(lines.filterNot(prevSet.contains).flatMap(seqOf).distinct === Seq(prevMax + 1))
  }
}

/** Local FS with a one-shot seam: runs an injected action synchronously
  * at the START of creating a commitAppend STAGED fragment (name
  * `c-*.frag`) — i.e. exactly between seq stamping and the version
  * CAS, the window the rebase re-stamp closes.
  */
class FragSeamFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftseam:///")
  // both overloads: FileSystem.create(Path, boolean) routes through the
  // permission-less one on RawLocalFileSystem, never the FsPermission one
  override def create(
      f: org.apache.hadoop.fs.Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    val name = f.getName
    if (name.startsWith("c-") && name.endsWith(".frag")) FragSeamFs.fire()
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }
  override def create(
      f: org.apache.hadoop.fs.Path, permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    val name = f.getName
    if (name.startsWith("c-") && name.endsWith(".frag")) FragSeamFs.fire()
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }
}

object FragSeamFs {
  private val hook = new java.util.concurrent.atomic.AtomicReference[() => Unit](null)
  def armOnce(f: () => Unit): Unit = hook.set(f)
  def disarm(): Unit = hook.set(null)
  private[graft] def fire(): Unit = {
    val f = hook.getAndSet(null) // one-shot: the injected ops write
    if (f != null) f()           // fragments too — no re-entry
  }
}
