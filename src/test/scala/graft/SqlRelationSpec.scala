package graft

import org.apache.spark.sql.functions.col

import graft.lake.SnapshotTable
import graft.streaming.GraftSnapshotRelation

/** Batch face of `format("graft-snapshot")`
  * ([[GraftSnapshotRelation]]): lake tables queryable through
  * `spark.read` and plain SQL with pushed filters driving the
  * manifest file skip, merge-on-read deletes applied, and time travel
  * via options — the Trino-over-Iceberg query surface as a native
  * Spark relation.
  */
class SqlRelationSpec extends SparkSpec {
  import spark.implicits._

  private def load(root: String, opts: (String, String)*) = {
    val r = spark.read.format("graft-snapshot").option("path", root)
    opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("batch load equals the engine read; MoR deletes applied") {
    val root = "/tmp/graft_test/rel_basic"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root,
      (0 until 100).map(k => (k.toLong, s"r$k")).toDF("id", "v"))
    SnapshotTable.deleteWhereMor(spark, root, col("id") < 10)
    val got = load(root).as[(Long, String)].collect().sorted.toSeq
    assert(got === (10 until 100).map(k => (k.toLong, s"r$k")))
  }

  test("pushed filter reaches the manifest prune (stats skipping)") {
    val root = "/tmp/graft_test/rel_prune"
    SnapshotTable.drop(spark, root)
    // 4 commits with disjoint id ranges, stats on id: an id point
    // filter must open ONE file
    (0 until 4).foreach { i =>
      SnapshotTable.commit(spark, root,
        (i * 100 until (i + 1) * 100).map(k => (k.toLong, s"r$k")).toDF("id", "v")
          .coalesce(1),
        statsCols = Seq("id"))
    }
    val total = SnapshotTable.dataFiles(spark, root, 4).size
    assert(total === 4)
    val rows = load(root).filter(col("id") === 250L).collect()
    assert(rows.length === 1 && rows.head.getString(1) === "r250")
    assert(GraftSnapshotRelation.lastScanFiles === 1,
      s"a stats-pruned point lookup must open 1 of $total files, " +
        s"opened ${GraftSnapshotRelation.lastScanFiles}")
  }

  test("SQL end-to-end through a USING-registered view, filters pushed") {
    val root = "/tmp/graft_test/rel_sql"
    SnapshotTable.drop(spark, root)
    (0 until 4).foreach { i =>
      SnapshotTable.commit(spark, root,
        (i * 100 until (i + 1) * 100).map(k => (k.toLong, s"r$k")).toDF("id", "v")
          .coalesce(1),
        statsCols = Seq("id"))
    }
    spark.sql("DROP TABLE IF EXISTS rel_sql_lake")
    spark.sql(
      s"CREATE TABLE rel_sql_lake USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      val n = spark.sql(
        "SELECT count(*) AS n FROM rel_sql_lake WHERE id >= 300").head.getLong(0)
      assert(n === 100)
      assert(GraftSnapshotRelation.lastScanFiles === 1,
        "the SQL range filter must prune to the one matching file")
    } finally spark.sql("DROP TABLE IF EXISTS rel_sql_lake")
  }

  test("time travel via version and timestamp_ms options") {
    val root = "/tmp/graft_test/rel_tt"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, Seq((1L, "a")).toDF("id", "v"))
    val t1 = SnapshotTable.committedAt(spark, root, 1)
    SnapshotTable.commit(spark, root, Seq((2L, "b")).toDF("id", "v"))
    assert(load(root).count() === 2)
    assert(load(root, "version" -> "1").count() === 1)
    assert(load(root, "timestamp_ms" -> t1.toString).count() === 1)
  }

  test("renamed-column table serves the logical schema") {
    val root = "/tmp/graft_test/rel_rename"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, Seq((1L, "a")).toDF("id", "v"))
    SnapshotTable.renameColumn(spark, root, "v", "label")
    val df = load(root)
    assert(df.columns.toSeq === Seq("id", "label"))
    assert(df.filter(col("label") === "a").count() === 1)
  }

  test("untranslatable filter shapes still answer correctly (no pruning, Spark re-filters)") {
    val root = "/tmp/graft_test/rel_residual"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root,
      (0 until 100).map(k => (k.toLong, s"r$k")).toDF("id", "v"))
    // modulo is not a source Filter shape at all — it must simply work
    val n = load(root).filter("id % 7 = 0").count()
    assert(n === (0 until 100).count(_ % 7 == 0))
  }
}
