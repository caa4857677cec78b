package graft

import org.apache.spark.sql.functions._

import graft.lake.SnapshotTable

/** SnapshotTable over a NON-`file:` scheme end-to-end. The FS-API
  * claim (SnapshotTable's manifest/data IO goes through
  * `org.apache.hadoop.fs.FileSystem`, so object-store roots work)
  * is only credible if the suite actually runs one: `graftfs://` is
  * local disk behind a distinct URI scheme, which forces every path
  * comparison (manifest line vs `_metadata.file_path`, canonical
  * file identity in copy-on-write and CDF diffs) to carry
  * scheme+authority instead of assuming a bare absolute path.
  */
class SchemeMatrixSpec extends SparkSpec {
  import spark.implicits._

  private def enableScheme(): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)

  private def freshRoot(name: String): String = {
    enableScheme()
    val local = s"/tmp/graft_schemefs/$name"
    SnapshotTable.drop(spark, s"graftfs://$local")
    s"graftfs://$local"
  }

  test("canon preserves scheme and authority, unifies path spellings") {
    enableScheme()
    // the three spellings of one local file agree...
    val a = SnapshotTable.canon(spark, "/tmp/x/part-0.parquet")
    val b = SnapshotTable.canon(spark, "file:/tmp/x/part-0.parquet")
    val c = SnapshotTable.canon(spark, "file:///tmp/x/part-0.parquet")
    assert(a == b && b == c, s"$a / $b / $c")
    // ...but distinct schemes and authorities never collapse
    val g = SnapshotTable.canon(spark, "graftfs:///tmp/x/part-0.parquet")
    assert(g != c && g.startsWith("graftfs://"))
    val b1 = SnapshotTable.canon(spark, "s3a://bucket-a/x/part-0.parquet")
    val b2 = SnapshotTable.canon(spark, "s3a://bucket-b/x/part-0.parquet")
    assert(b1 != b2)
  }

  test("commit with stats+bloom, read, metadata-only counts on graftfs://") {
    val root = freshRoot("snap_basic")
    val df = (1 to 100).map(i => (i.toLong, i % 7, s"k$i")).toDF("id", "grp", "k")
    val v1 = SnapshotTable.commit(spark, root, df,
      statsCols = Seq("id"), bloomCols = Seq("k"))
    assert(v1 == 1)
    assert(SnapshotTable.read(spark, root).count() == 100)
    // _rows annotations were written under the scheme-full path — a
    // canon mismatch would have produced 0 here
    assert(SnapshotTable.recordCount(spark, root, 1) == 100)
    // every manifest-listed data file carries the scheme (Hadoop Path
    // renders a null authority as `graftfs:/...` — check the URI)
    assert(SnapshotTable.dataFiles(spark, root, 1)
      .forall(f => new org.apache.hadoop.fs.Path(f).toUri.getScheme == "graftfs"))
  }

  test("stats skipping prunes files under the foreign scheme") {
    val root = freshRoot("snap_skip")
    // two disjoint-range commits → two file sets with disjoint id stats
    SnapshotTable.commit(spark, root,
      (1 to 50).map(_.toLong).toDF("id").coalesce(1), statsCols = Seq("id"))
    SnapshotTable.commit(spark, root,
      (1000 to 1050).map(_.toLong).toDF("id").coalesce(1), statsCols = Seq("id"))
    val pruned = SnapshotTable.readWhere(spark, root, col("id") < 10)
    assert(pruned.count() == 9)
    val all = SnapshotTable.dataFiles(spark, root, 2)
    assert(pruned.inputFiles.length < all.length,
      s"expected pruning: read ${pruned.inputFiles.length} of ${all.length}")
  }

  test("copy-on-write delete + update resolve files across path spellings") {
    val root = freshRoot("snap_cow")
    SnapshotTable.commit(spark, root,
      (1 to 20).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val v2 = SnapshotTable.deleteWhere(spark, root, col("id") <= 5)
    assert(v2 == 2)
    assert(SnapshotTable.read(spark, root).count() == 15)
    val v3 = SnapshotTable.updateWhere(spark, root, col("id") === 6,
      Map("v" -> lit("updated")))
    assert(v3 == 3)
    val vs = SnapshotTable.read(spark, root)
      .where(col("id") === 6).select("v").as[String].collect()
    assert(vs.toSeq == Seq("updated"))
    // time travel untouched by the rewrites
    assert(SnapshotTable.read(spark, root, 1).count() == 20)
  }

  test("merge-on-read delete/update/compaction resolve identities under the foreign scheme") {
    // positional delete rows store the scan's `_metadata.file_path`
    // spelling while manifests store the writer's — compactDeletes and
    // the CoW stale-delete rewrite compare them through canon(), which
    // must carry scheme+authority here or silently match nothing
    val root = freshRoot("snap_mor")
    SnapshotTable.commit(spark, root,
      (1 to 20).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(2))
    val files = SnapshotTable.dataFiles(spark, root, 1).toSet
    val v2 = SnapshotTable.deleteWhereMor(spark, root, col("id") <= 5)
    assert(v2 == 2)
    assert(SnapshotTable.dataFiles(spark, root, 2).toSet == files,
      "MoR delete must re-reference every data file verbatim")
    assert(SnapshotTable.read(spark, root).count() == 15)
    assert(SnapshotTable.recordCount(spark, root, 2) == 15)
    val v3 = SnapshotTable.updateWhereMor(spark, root, col("id") === 6,
      Map("v" -> lit("updated")))
    assert(v3 == 3)
    assert(SnapshotTable.read(spark, root)
      .where(col("id") === 6).select("v").as[String].collect().toSeq == Seq("updated"))
    val v4 = SnapshotTable.compactDeletes(spark, root)
    assert(SnapshotTable.deleteFiles(spark, root, v4).isEmpty,
      "compaction must fold every delete ref across the scheme-full canon compare")
    assert(SnapshotTable.read(spark, root).count() == 15)
    assert(SnapshotTable.read(spark, root, 1).count() == 20) // time travel intact
  }

  test("CDF changes() diff file identities under the foreign scheme") {
    val root = freshRoot("snap_cdf")
    SnapshotTable.commit(spark, root, (1 to 10).map(_.toLong).toDF("id"))
    SnapshotTable.deleteWhere(spark, root, col("id") === 3)
    val ch = SnapshotTable.changes(spark, root, 1, 2)
      .groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ch == Map("delete" -> 1L))
  }
}
