package graft

import org.apache.hadoop.fs.Path

import graft.lake.SnapshotTable

/** [[SnapshotTable.removeOrphans]] (Iceberg `remove_orphan_files`)
  * safety invariants beyond the lake_orphan_cleanup entry: files
  * referenced ONLY by an old version or a branch head must survive
  * (time travel and WAP audits stay readable), the grace period is
  * mtime-based (an old debris file is reclaimed while a fresh one is
  * protected), partitioned-layout debris is found inside partition
  * subdirectories, and reclaiming empties + removes crashed commit
  * directories.
  */
class OrphanCleanupSpec extends SparkSpec {
  import spark.implicits._

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def touch(root: String, rel: String): String = {
    val p = new Path(s"$root/$rel")
    val out = fs(root).create(p, false)
    try out.write("debris\n".getBytes("UTF-8")) finally out.close()
    p.toString
  }

  test("files referenced only by an old version survive (time travel intact)") {
    val root = "/tmp/graft_test/orph_oldver"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val v1Files = SnapshotTable.dataFiles(spark, root, 1)
    // overwrite: v2 references NONE of v1's files
    SnapshotTable.commit(spark, root, Seq((3, "c")).toDF("id", "v"), append = false)
    val removed = SnapshotTable.removeOrphans(spark, root, graceMs = 0)
    val removedSet = removed.toSet
    v1Files.foreach(f => assert(!removedSet.contains(SnapshotTable.canon(spark, f)),
      s"v1-only file $f must survive while v1 is un-expired"))
    assert(SnapshotTable.read(spark, root, version = 1).count() == 2,
      "time travel to v1 must still read after cleanup")
    assert(SnapshotTable.read(spark, root).count() == 1)
  }

  test("files referenced only by a branch head survive; branch stays readable") {
    val root = "/tmp/graft_test/orph_branch"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, Seq((1, "a")).toDF("id", "v"))
    SnapshotTable.createBranch(spark, root, "audit")
    SnapshotTable.commitToBranch(spark, root, "audit", Seq((2, "b")).toDF("id", "v"))
    val orphan = touch(root, "data/c-crashed/stray.parquet")
    val removed = SnapshotTable.removeOrphans(spark, root, graceMs = 0)
    assert(removed.contains(SnapshotTable.canon(spark, orphan)))
    assert(SnapshotTable.readBranch(spark, root, "audit").count() == 2,
      "branch-staged rows must survive the reclaim")
  }

  test("grace is mtime-based: old debris reclaimed, fresh debris protected") {
    val root = "/tmp/graft_test/orph_grace"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, Seq((1, "a")).toDF("id", "v"))
    val oldDebris = touch(root, "data/c-old/stray.parquet")
    val freshDebris = touch(root, "data/c-fresh/stray.parquet")
    fs(root).setTimes(new Path(oldDebris), System.currentTimeMillis - 86400000L, -1)
    val removed = SnapshotTable.removeOrphans(spark, root, graceMs = 3600 * 1000L)
    assert(removed == Seq(SnapshotTable.canon(spark, oldDebris)),
      s"only the day-old file qualifies under a 1h grace, got $removed")
    assert(fs(root).exists(new Path(freshDebris)), "fresh debris must be protected")
  }

  test("partitioned layout: stray file inside a partition subdir is found, live files survive") {
    val root = "/tmp/graft_test/orph_part"
    SnapshotTable.drop(spark, root)
    val df = Seq(
      (1, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (2, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"))).toDF("id", "ts")
    SnapshotTable.commitPartitionedByDay(spark, root, df, "ts")
    val stray = touch(root, "data/v1/_graft_day=2024-01-01/stray.parquet")
    val before = SnapshotTable.read(spark, root).count()
    val removed = SnapshotTable.removeOrphans(spark, root, graceMs = 0)
    assert(removed.contains(SnapshotTable.canon(spark, stray)))
    assert(SnapshotTable.read(spark, root).count() == before)
  }

  test("crashed commit directory is removed once emptied; second pass finds nothing") {
    val root = "/tmp/graft_test/orph_dirs"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, Seq((1, "a")).toDF("id", "v"))
    touch(root, "data/c-crashed/part-0.parquet")
    touch(root, "data/c-crashed/part-1.parquet")
    SnapshotTable.removeOrphans(spark, root, graceMs = 0)
    assert(!fs(root).exists(new Path(s"$root/data/c-crashed")),
      "emptied crashed commit dir must be removed")
    assert(SnapshotTable.removeOrphans(spark, root, graceMs = 0, dryRun = true).isEmpty)
  }

  test("dry run removes nothing") {
    val root = "/tmp/graft_test/orph_dry"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, Seq((1, "a")).toDF("id", "v"))
    val stray = touch(root, "data/c-x/stray.parquet")
    val named = SnapshotTable.removeOrphans(spark, root, graceMs = 0, dryRun = true)
    assert(named.contains(SnapshotTable.canon(spark, stray)))
    assert(fs(root).exists(new Path(stray)), "dry run must not delete")
  }

  test("interop exports (_iceberg, _delta_log) survive cleanup past the grace period") {
    val root = "/tmp/graft_test/orph_interop"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, Seq((1, "a")).toDF("id", "v"))
    // interop metadata is never manifest-referenced, so without the
    // protectedTop entries it would be swept as loose debris the
    // moment it aged past the grace — killing every external-engine
    // mount of the table on the first nightly maintenance run
    val ice = touch(root, "_iceberg/v1.metadata.json")
    val delta = touch(root, "_delta_log/00000000000000000001.json")
    val sweepable = touch(root, "loose_debris.txt")
    // graceMs = 0: every candidate is "past the grace period"
    val removed = SnapshotTable.removeOrphans(spark, root, graceMs = 0)
    assert(fs(root).exists(new Path(ice)),
      "_iceberg export must survive remove_orphan_files")
    assert(fs(root).exists(new Path(delta)),
      "_delta_log export must survive remove_orphan_files")
    assert(removed.contains(SnapshotTable.canon(spark, sweepable)),
      "protection must not leak to genuine loose debris")
    // the scheduled path (Maintenance.run drives the same reclaim)
    graft.lake.Maintenance.run(spark, root,
      graft.lake.Maintenance.Policy(orphanGraceMs = 0))
    assert(fs(root).exists(new Path(ice)) && fs(root).exists(new Path(delta)),
      "_iceberg/_delta_log must survive the scheduled maintenance sweep")
  }
}
