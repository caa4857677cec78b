package graft

import org.apache.spark.sql.functions._

import graft.lake.SnapshotTable
import graft.streaming.GraftSnapshotRelation

/** [[graft.sources.GraftCatalog]] — the DataSourceV2 catalog that
  * gives snapshot tables PLAIN SQL time travel (`VERSION AS OF` /
  * `TIMESTAMP AS OF`), DDL (CREATE/DROP/SHOW), INSERT, and
  * manifest-pruned reads through the V1Scan shim.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val wh = "/tmp/graft_test/v2cat_wh"

  private def enable(): Unit = {
    spark.conf.set("spark.sql.catalog.gcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.warehouse", wh)
  }

  test("CREATE / INSERT / SELECT / DROP through the catalog") {
    enable()
    SnapshotTable.drop(spark, s"$wh/lake/t1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lake")
    spark.sql("DROP TABLE IF EXISTS gcat.lake.t1")
    spark.sql("CREATE TABLE gcat.lake.t1 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gcat.lake.t1 VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gcat.lake.t1 VALUES (3, 'c')")
    assert(spark.sql("SELECT * FROM gcat.lake.t1").count() === 3)
    // the SQL inserts are REAL engine commits: empty v1 + two appends
    assert(SnapshotTable.currentVersion(spark, s"$wh/lake/t1") === 3)
    spark.sql("INSERT OVERWRITE gcat.lake.t1 VALUES (9, 'z')")
    assert(spark.sql("SELECT * FROM gcat.lake.t1").as[(Long, String)]
      .collect().toSeq === Seq((9L, "z")))
    assert(spark.sql("SHOW TABLES IN gcat.lake").collect()
      .map(_.getString(1)).contains("t1"))
    spark.sql("DROP TABLE gcat.lake.t1")
    assert(SnapshotTable.currentVersion(spark, s"$wh/lake/t1") === 0,
      "managed drop removes the data")
  }

  test("VERSION AS OF and TIMESTAMP AS OF in plain SQL") {
    enable()
    val root = s"$wh/lake/tt"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root,
      (0 until 50).map(k => (k.toLong, s"r$k")).toDF("id", "v"))
    val t1 = SnapshotTable.committedAt(spark, root, 1)
    SnapshotTable.commitAppend(spark, root,
      (50 until 80).map(k => (k.toLong, s"r$k")).toDF("id", "v"))
    SnapshotTable.deleteWhere(spark, root, col("id") < 10)
    assert(spark.sql("SELECT count(*) AS n FROM gcat.lake.tt").head.getLong(0) === 70)
    assert(spark.sql(
      "SELECT count(*) AS n FROM gcat.lake.tt VERSION AS OF 1").head.getLong(0) === 50)
    assert(spark.sql(
      "SELECT count(*) AS n FROM gcat.lake.tt VERSION AS OF 2").head.getLong(0) === 80)
    val ts = new java.sql.Timestamp(t1).toString
    assert(spark.sql(
      s"SELECT count(*) AS n FROM gcat.lake.tt TIMESTAMP AS OF '$ts'")
      .head.getLong(0) === 50)
    // a write to a time-traveled relation must refuse
    intercept[Exception] {
      spark.sql("INSERT INTO gcat.lake.tt VERSION AS OF 1 VALUES (999, 'x')")
    }
  }

  test("pushed filters reach the manifest prune through the V2 scan") {
    enable()
    val root = s"$wh/lake/pruned"
    SnapshotTable.drop(spark, root)
    (0 until 4).foreach { i =>
      SnapshotTable.commit(spark, root,
        (i * 100 until (i + 1) * 100).map(k => (k.toLong, s"r$k")).toDF("id", "v")
          .coalesce(1),
        statsCols = Seq("id"))
    }
    GraftSnapshotRelation.recordScans = true
    try {
      val rows = spark.sql(
        "SELECT v FROM gcat.lake.pruned WHERE id = 250").collect()
      assert(rows.map(_.getString(0)).toSeq === Seq("r250"))
    } finally GraftSnapshotRelation.recordScans = false
    assert(GraftSnapshotRelation.lastScanFilesFor(root) === 1,
      "the V2 scan must open 1 of 4 files for a stats-pruned point lookup")
    // column pruning reaches the scan: only v + the filter column
    val plan = spark.sql("SELECT v FROM gcat.lake.pruned WHERE id = 250")
      .queryExecution.executedPlan.toString
    assert(plan.contains("RowDataSourceScan") || plan.contains("Scan"),
      s"expected a V1-shim scan in: $plan")
  }

  test("LOCATION registers an existing table; DROP keeps external data") {
    enable()
    val ext = "/tmp/graft_test/v2cat_external"
    SnapshotTable.drop(spark, ext)
    SnapshotTable.commit(spark, ext, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ext")
    spark.sql("DROP TABLE IF EXISTS gcat.ext.reg")
    spark.sql(s"CREATE TABLE gcat.ext.reg (id BIGINT, v STRING) LOCATION '$ext'")
    assert(spark.sql("SELECT count(*) AS n FROM gcat.ext.reg").head.getLong(0) === 2)
    spark.sql("DROP TABLE gcat.ext.reg")
    assert(SnapshotTable.currentVersion(spark, ext) === 1,
      "external drop unregisters but keeps the data")
    assert(SnapshotTable.read(spark, ext).count() === 2)
  }

  test("MoR deletes and renames serve through the catalog read") {
    enable()
    val root = s"$wh/lake/morv2"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root,
      (0 until 20).map(k => (k.toLong, s"r$k")).toDF("id", "v"))
    SnapshotTable.deleteWhereMor(spark, root, col("id") === 3L)
    SnapshotTable.renameColumn(spark, root, "v", "label")
    val got = spark.sql("SELECT id, label FROM gcat.lake.morv2 ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got.size === 19 && !got.exists(_._1 == 3L) && got.head._2 === "r0")
  }
}
