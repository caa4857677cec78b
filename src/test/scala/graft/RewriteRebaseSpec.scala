package graft

import graft.lake.SnapshotTable

/** Maintenance-rewrite concurrency (Iceberg `RewriteDataFiles`
  * semantics): [[SnapshotTable.compactDeletes]] is content-preserving,
  * so it must REBASE over concurrent appends — a fail-loud compaction
  * on a table with streaming appends would never win the CAS and the
  * table would degrade forever — while anything whose effect the
  * rewrite could silently drop (a row-level delete targeting replaced
  * files, another rewrite/overwrite, a schema change) stays a loud
  * conflict. The interleaving is injected deterministically via an FS
  * hook that fires synchronously inside the manifest-tmp create —
  * after the rewrite has planned and staged, immediately before its
  * CAS — no sleeps, no scheduling luck.
  */
class RewriteRebaseSpec extends SparkSpec {
  import spark.implicits._

  private val scheme = "graftmseam://"

  private def setup(name: String): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftmseam.impl", classOf[ManifestSeamFs].getName)
    val root = s"$scheme/tmp/graft_test/$name"
    SnapshotTable.drop(spark, root)
    root
  }

  private def manifestText(root: String, v: Int): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      s"${root.stripPrefix(scheme)}/_manifests/v$v.manifest")), "UTF-8")

  test("compactDeletes rebases over a concurrent append: no starvation, no row loss") {
    val root = setup("rw_rebase_append")
    SnapshotTable.commit(spark, root,
      (0 until 20).map(k => (k, s"r$k")).toDF("k", "v"))
    SnapshotTable.deleteWhereMor(spark, root, org.apache.spark.sql.functions.col("k") < 5)
    assert(SnapshotTable.deleteFiles(spark, root, 2).nonEmpty)

    ManifestSeamFs.armOnce { () =>
      SnapshotTable.commit(spark, root, Seq((100, "late")).toDF("k", "v"))
    }
    val v =
      try SnapshotTable.compactDeletes(spark, root)
      finally ManifestSeamFs.disarm()

    assert(v === 4, "append v3 landed under the rewrite; rewrite rebased to v4")
    assert(manifestText(root, v).contains("#rebased_over=1"))
    assert(SnapshotTable.deleteFiles(spark, root, v).isEmpty,
      "the rebased rewrite still folded the pending deletes")
    val got = SnapshotTable.read(spark, root).as[(Int, String)].collect().sorted.toSeq
    val want = ((5 until 20).map(k => (k, s"r$k")) :+ (100, "late")).sorted
    assert(got === want,
      "survivors + the concurrently appended row, nothing lost or resurrected")
  }

  test("compactDeletes fails loud on a concurrent row-level delete, then re-plans clean") {
    val root = setup("rw_conflict_delete")
    SnapshotTable.commit(spark, root,
      (0 until 20).map(k => (k, s"r$k")).toDF("k", "v"))
    SnapshotTable.deleteWhereMor(spark, root, org.apache.spark.sql.functions.col("k") < 5)

    ManifestSeamFs.armOnce { () =>
      SnapshotTable.deleteWhereMor(spark, root,
        org.apache.spark.sql.functions.col("k") === 10)
    }
    val e =
      try intercept[IllegalStateException](SnapshotTable.compactDeletes(spark, root))
      finally ManifestSeamFs.disarm()
    assert(e.getMessage.contains("row-level delete"),
      s"conflict must name the cause, got: ${e.getMessage}")

    // the documented recovery — re-plan against the new head — folds BOTH
    val v = SnapshotTable.compactDeletes(spark, root)
    assert(SnapshotTable.deleteFiles(spark, root, v).isEmpty)
    val got = SnapshotTable.read(spark, root).as[(Int, String)].collect().sorted.toSeq
    assert(got === (5 until 20).filterNot(_ == 10).map(k => (k, s"r$k")).sorted)
  }

  test("compactDeletes fails loud on a concurrent overwrite (removed lines)") {
    val root = setup("rw_conflict_overwrite")
    SnapshotTable.commit(spark, root,
      (0 until 20).map(k => (k, s"r$k")).toDF("k", "v"))
    SnapshotTable.deleteWhereMor(spark, root, org.apache.spark.sql.functions.col("k") < 5)

    ManifestSeamFs.armOnce { () =>
      SnapshotTable.commit(spark, root, Seq((1, "fresh")).toDF("k", "v"), append = false)
    }
    val e =
      try intercept[IllegalStateException](SnapshotTable.compactDeletes(spark, root))
      finally ManifestSeamFs.disarm()
    assert(e.getMessage.contains("removed"),
      s"overwrite conflict must be loud, got: ${e.getMessage}")
    // the overwrite's content won — the aborted rewrite changed nothing
    assert(SnapshotTable.read(spark, root).as[(Int, String)].collect().toSeq ===
      Seq((1, "fresh")))
  }
}

/** Local FS with a one-shot seam firing synchronously at the START of
  * a version-manifest TMP create (`*.manifest.tmp`) — i.e. after a
  * committer has planned and staged everything, immediately before its
  * CAS. The injected ops commit manifests too; the one-shot latch
  * prevents re-entry.
  */
class ManifestSeamFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftmseam:///")
  private def maybeFire(f: org.apache.hadoop.fs.Path): Unit =
    if (f.getName.endsWith(".manifest.tmp")) ManifestSeamFs.fire()
  override def create(
      f: org.apache.hadoop.fs.Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    maybeFire(f)
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }
  override def create(
      f: org.apache.hadoop.fs.Path, permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    maybeFire(f)
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }
}

object ManifestSeamFs {
  private val hook = new java.util.concurrent.atomic.AtomicReference[() => Unit](null)
  def armOnce(f: () => Unit): Unit = hook.set(f)
  def disarm(): Unit = hook.set(null)
  private[graft] def fire(): Unit = {
    val f = hook.getAndSet(null)
    if (f != null) f()
  }
}
