package graft

import org.apache.spark.sql.functions.col

import graft.lake.SnapshotTable

/** [[SnapshotTable.compactDeleteFiles]] (Iceberg
  * `rewrite_position_delete_files`): pending positional delete files
  * consolidate into one with zero data-byte movement, duplicates
  * across overlapping deletes collapse, equality deletes are left
  * untouched, below-threshold tables are a no-op, and the publish
  * rebases over a concurrent append.
  */
class DeleteFileConsolidationSpec extends SparkSpec {
  import spark.implicits._

  test("three trickle deletes consolidate to one file; reads identical; dedup exact") {
    val root = "/tmp/graft_test/dfc_basic"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root,
      (0 until 50).map(k => (k.toLong, s"r$k")).toDF("id", "v").repartition(4))
    SnapshotTable.deleteWhereMor(spark, root, col("id") === 1)
    SnapshotTable.deleteWhereMor(spark, root, col("id") === 2)
    // overlapping delete: ids 2 and 3 — (file,pos) of id 2 appears in
    // TWO delete files and must collapse to one row
    SnapshotTable.deleteWhereMor(spark, root, col("id").isin(2L, 3L))
    assert(SnapshotTable.deleteFiles(spark, root, 4).size === 3)
    val dataBefore = SnapshotTable.dataFiles(spark, root, 4).toSet
    val v = SnapshotTable.compactDeleteFiles(spark, root)
    assert(v === 5)
    val dels = SnapshotTable.deleteFiles(spark, root, v)
    assert(dels.size === 1)
    assert(SnapshotTable.dataFiles(spark, root, v).toSet === dataBefore)
    assert(spark.read.parquet(dels.head).count() === 3,
      "duplicate (file,pos) rows across overlapping deletes must collapse")
    assert(SnapshotTable.read(spark, root).as[(Long, String)].collect().sorted.toSeq ===
      (0 until 50).filterNot(Seq(1, 2, 3).contains(_)).map(k => (k.toLong, s"r$k")))
    assert(SnapshotTable.recordCount(spark, root, v) === 47,
      "metadata row count must agree after dedup")
  }

  test("below minFiles is a no-op; equality deletes are not touched") {
    val root = "/tmp/graft_test/dfc_noop"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root,
      (0 until 20).map(k => (k.toLong, s"r$k")).toDF("id", "v"))
    SnapshotTable.deleteWhereMor(spark, root, col("id") === 1)
    assert(SnapshotTable.compactDeleteFiles(spark, root) === 2,
      "one delete file is below the default threshold")
    SnapshotTable.deleteWhereEq(spark, root, Seq("id"), Seq(5L).toDF("id"))
    SnapshotTable.deleteWhereMor(spark, root, col("id") === 2)
    val v = SnapshotTable.compactDeleteFiles(spark, root)
    assert(v === 5)
    assert(SnapshotTable.deleteFiles(spark, root, v).size === 1)
    // the eq delete still applies after consolidation
    val ids = SnapshotTable.read(spark, root).select("id").as[Long].collect().toSet
    assert(!ids.contains(5L) && !ids.contains(1L) && !ids.contains(2L))
    assert(ids.size === 17)
  }

  test("publish rebases over a concurrent append") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftmseam.impl", classOf[ManifestSeamFs].getName)
    val root = "graftmseam:///tmp/graft_test/dfc_rebase"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root,
      (0 until 20).map(k => (k.toLong, s"r$k")).toDF("id", "v"))
    SnapshotTable.deleteWhereMor(spark, root, col("id") === 1)
    SnapshotTable.deleteWhereMor(spark, root, col("id") === 2)
    ManifestSeamFs.armOnce { () =>
      SnapshotTable.commit(spark, root, Seq((100L, "late")).toDF("id", "v"))
    }
    val v =
      try SnapshotTable.compactDeleteFiles(spark, root)
      finally ManifestSeamFs.disarm()
    assert(v === 5, "append landed under the consolidation; it rebased")
    val got = SnapshotTable.read(spark, root).as[(Long, String)].collect().sorted.toSeq
    assert(got === ((0 until 20).filterNot(Seq(1, 2).contains(_))
      .map(k => (k.toLong, s"r$k")) :+ (100L, "late")).sorted)
  }
}
