package graft

import org.apache.spark.sql.functions._

import graft.endpoint.SqlEndpoint
import graft.sources.{Catalog, PersistentCatalog, Tables}

/** Durable catalog: definitions must survive the death of the session
  * that registered them. The in-memory session catalog is simulated
  * dead by DROP DATABASE CASCADE (a real JVM exit loses exactly that
  * state — the registry's files on the table store are all that
  * remain), and restoration happens in a *new* SparkSession.
  */
class PersistentCatalogSpec extends SparkSpec {

  private val root = "/tmp/graft_registry_spec"

  private def wipe(): Unit = {
    val d = new java.io.File(root)
    if (d.exists) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete()
      }
      rm(d)
    }
  }

  test("save → drop db → restore in a NEW session serves every table") {
    wipe()
    Catalog.register(spark, sf())
    val v = PersistentCatalog.save(spark, root)
    assert(v == 1)
    spark.sql(s"DROP DATABASE ${Catalog.DB} CASCADE")

    // session B: fresh session state; only the registry files exist.
    // (newSession shares the external catalog object, which is why the
    // DROP above is what models the JVM boundary: nothing of graft.*
    // survives it but the registry.)
    val s2 = spark.newSession()
    val restored = PersistentCatalog.restore(s2, root)
    assert(restored.sorted == Tables.all.sorted)

    val listed = s2.sql(s"SHOW TABLES IN ${Catalog.DB}")
      .where(!col("isTemporary"))
      .select("tableName").collect().map(_.getString(0)).sorted
    assert(listed.toSeq == Tables.all.sorted)

    // a restored table answers queries (and the view rebuilds its ts)
    assert(s2.table(s"${Catalog.DB}.nation").count() == 25)
    assert(s2.table(s"${Catalog.DB}.events").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val joined = s2.sql(
      s"""SELECT count(*) AS n FROM ${Catalog.DB}.customer c
         |JOIN ${Catalog.DB}.orders o ON c.c_custkey = o.o_custkey""".stripMargin)
      .first().getLong(0)
    assert(joined > 0)
  }

  test("registry versions are catalog history: v1 readable after re-save") {
    wipe()
    Catalog.register(spark, sf())
    PersistentCatalog.save(spark, root)
    val v2 = PersistentCatalog.save(spark, root) // idempotent re-save
    assert(v2 == 2)
    val v1Names = graft.lake.SnapshotTable.read(spark, root, 1)
      .select("table_name").collect().map(_.getString(0)).sorted
    assert(v1Names.toSeq == Tables.all.sorted)
  }

  test("restored catalog is servable over JDBC (BI client after restart)") {
    wipe()
    Catalog.register(spark, sf())
    PersistentCatalog.save(spark, root)
    spark.sql(s"DROP DATABASE ${Catalog.DB} CASCADE")
    // the Thrift singleton serves `spark` (single-session mode), so
    // restore into it — the serving session after a "restart"
    SqlEndpoint.serve(spark, root)
    val (_, rows) = SqlEndpoint.jdbcQuery(spark,
      s"SELECT count(*) AS n FROM ${Catalog.DB}.region")
    assert(rows.head.head.asInstanceOf[Number].longValue == 5L)
  }

  test("restored tables keep pushdown (external parquet, not a copy)") {
    wipe()
    Catalog.register(spark, sf())
    PersistentCatalog.save(spark, root)
    spark.sql(s"DROP DATABASE ${Catalog.DB} CASCADE")
    val s2 = spark.newSession()
    PersistentCatalog.restore(s2, root)
    val p = s2.table(s"${Catalog.DB}.lineitem")
      .where(col("l_quantity") < 5).select("l_orderkey")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"), p.take(1200))
  }

  test("a registered SNAPSHOT table serves its true state through spark.table") {
    import spark.implicits._
    wipe()
    val loc = "/tmp/graft_test/pcat_snap"
    graft.lake.SnapshotTable.drop(spark, loc)
    graft.lake.SnapshotTable.commit(spark, loc,
      (0 until 50).map(k => (k.toLong, s"r$k")).toDF("id", "v"))
    graft.lake.SnapshotTable.deleteWhereMor(spark, loc, col("id") < 10)
    Catalog.register(spark, sf())
    PersistentCatalog.registerTable(spark, s"${Catalog.DB}.pcat_snap", "parquet", loc)
    // current state, MoR delete applied — registering the root as raw
    // parquet would serve ZERO rows (data lives in versioned subdirs)
    assert(spark.table(s"${Catalog.DB}.pcat_snap").count() === 40)
    // and the registration survives the save → drop → restore loop
    PersistentCatalog.save(spark, root)
    spark.sql(s"DROP DATABASE ${Catalog.DB} CASCADE")
    val s2 = spark.newSession()
    PersistentCatalog.restore(s2, root)
    assert(s2.table(s"${Catalog.DB}.pcat_snap").count() === 40)
    assert(s2.sql(
      s"SELECT count(*) FROM ${Catalog.DB}.pcat_snap WHERE id >= 40")
      .head.getLong(0) === 10)
    spark.sql(s"DROP TABLE IF EXISTS ${Catalog.DB}.pcat_snap")
  }
}
