package graft

import graft.lake.SnapshotTable

/** VERDICT r6 item 1: commit metadata I/O must be O(files touched),
  * not O(table). These specs measure the actual bytes a commit writes
  * under `_manifests/` and pin the manifest-list invariants: old
  * fragments are re-referenced verbatim (never rewritten), small
  * appends write small fragments, copy-on-write rewrites only the
  * fragments containing affected files, and expire reclaims fragments
  * no live version references.
  */
class ManifestListSpec extends SparkSpec {
  import spark.implicits._

  /** (name → size) of every file under root/_manifests. */
  private def manifestFiles(root: String): Map[String, Long] = {
    val dir = new java.io.File(s"$root/_manifests")
    if (!dir.exists) Map.empty
    else dir.listFiles.filterNot(_.getName.startsWith("."))
      .map(f => f.getName -> f.length).toMap
  }

  private def refsOf(root: String, v: Int): Seq[String] = {
    val src = scala.io.Source.fromFile(s"$root/_manifests/v$v.manifest", "UTF-8")
    try src.getLines().filter(_.startsWith(">")).toList
    finally src.close()
  }

  test("appending 1 file to a 1000-file table writes O(1) metadata, not the file list") {
    val root = "/tmp/graft_test/mlist_odelta"
    SnapshotTable.drop(spark, root)
    // a table of ~1k files across four commits (each fragment immutable)
    (1 to 4).foreach { i =>
      // 2048 rows over 256 hash partitions: every partition (hence
      // file) is non-empty with overwhelming probability
      SnapshotTable.commit(spark, root,
        spark.range(2048L * (i - 1), 2048L * i).toDF("x").repartition(256))
    }
    val total = SnapshotTable.dataFiles(spark, root, 4).size
    assert(total >= 1000, s"expected ~1024 data files, got $total")
    val before = manifestFiles(root)
    val beforeBytes = before.values.sum
    SnapshotTable.commit(spark, root, Seq(99999L).toDF("x").coalesce(1))
    val after = manifestFiles(root)
    // no pre-existing manifest file was touched (fragments immutable)
    before.foreach { case (name, size) =>
      assert(after.get(name).contains(size), s"$name was rewritten by an append")
    }
    // the commit wrote exactly one fragment + one manifest list
    val created = after.keySet -- before.keySet
    assert(created.size === 2, s"append created $created")
    val commitBytes = created.toSeq.map(after).sum
    // bytes written ≪ total manifest metadata (the full file list):
    // one file line + 4 ref lines vs ~1024 file lines
    assert(commitBytes * 50 < beforeBytes,
      s"append wrote $commitBytes bytes vs $beforeBytes of table metadata — not O(Δ)")
    assert(SnapshotTable.dataFiles(spark, root, 5).size === total + 1)
    assert(SnapshotTable.read(spark, root).count() === 4 * 2048 + 1)
  }

  test("append cost is constant in table size (list grows by refs only)") {
    def appendCost(root: String, priorCommits: Int): Long = {
      SnapshotTable.drop(spark, root)
      (1 to priorCommits).foreach { i =>
        SnapshotTable.commit(spark, root,
          spark.range(512L * (i - 1), 512L * i).toDF("x").repartition(64))
      }
      val before = manifestFiles(root)
      SnapshotTable.commit(spark, root, Seq(-1L).toDF("x").coalesce(1))
      val after = manifestFiles(root)
      (after.keySet -- before.keySet).toSeq.map(after).sum
    }
    val small = appendCost("/tmp/graft_test/mlist_c1", 1) //  64 files
    val big = appendCost("/tmp/graft_test/mlist_c4", 4)   // 256 files
    // 4× the table adds only 3 ref lines (~a few hundred bytes) to the
    // list — nowhere near 4× the commit bytes
    assert(big < small + 1024,
      s"append into 4x table cost $big vs $small bytes — scaling with table size")
  }

  test("copy-on-write delete re-references fragments with no affected files") {
    val root = "/tmp/graft_test/mlist_cow"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, (1 to 100).toDF("x").repartition(4))
    SnapshotTable.commit(spark, root, (101 to 200).toDF("x").repartition(4))
    val v1Refs = refsOf(root, 1)
    assert(v1Refs.size === 1)
    // delete rows that live only in v2's files
    val v3 = SnapshotTable.deleteWhere(spark, root, org.apache.spark.sql.functions.col("x") > 150)
    assert(v3 === 3)
    val v3Refs = refsOf(root, 3)
    // v1's fragment survives VERBATIM; v2's fragment was rewritten
    assert(v3Refs.contains(v1Refs.head), "untouched fragment was not re-referenced")
    assert(!v3Refs.exists(refsOf(root, 2).diff(v1Refs).contains(_)),
      "affected fragment still referenced after copy-on-write")
    assert(SnapshotTable.read(spark, root).count() === 150)
    assert(SnapshotTable.read(spark, root, 2).count() === 200) // time travel intact
  }

  test("metadata-only commits copy refs verbatim (rename over a wide table)") {
    val root = "/tmp/graft_test/mlist_meta"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, (1 to 50).toDF("a").repartition(8))
    val before = manifestFiles(root)
    SnapshotTable.renameColumn(spark, root, "a", "b")
    val after = manifestFiles(root)
    val created = after.keySet -- before.keySet
    // a rename writes ONLY the new manifest list — zero fragments
    assert(created.size === 1 && created.head == "v2.manifest", s"rename created $created")
    assert(refsOf(root, 2) === refsOf(root, 1))
    assert(SnapshotTable.read(spark, root).columns.toSeq === Seq("b"))
  }

  test("expire reclaims fragments referenced only by expired versions") {
    val root = "/tmp/graft_test/mlist_expire"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, Seq(1, 2).toDF("x"))
    SnapshotTable.commit(spark, root, Seq(3).toDF("x"), append = false) // v1's fragment orphaned
    SnapshotTable.commit(spark, root, Seq(4).toDF("x"))
    val fragsBefore = manifestFiles(root).keySet.filter(_.endsWith(".frag"))
    assert(fragsBefore.size === 3)
    val (expired, _) = SnapshotTable.expire(spark, root, keepLast = 2)
    assert(expired === Seq(1))
    val fragsAfter = manifestFiles(root).keySet.filter(_.endsWith(".frag"))
    assert(fragsAfter.size === 2, s"v1's orphaned fragment not reclaimed: $fragsAfter")
    assert(SnapshotTable.read(spark, root).collect().map(_.getInt(0)).toSet === Set(3, 4))
  }
}
