package graft

import org.apache.spark.sql.functions._

import graft.sources.{Catalog, Tables}

/** Named-table catalog surface: SHOW TABLES / DESCRIBE over the
  * driver lake, registered as `graft.*` external tables + the events
  * view (reference RUNBOOK.md:95 `SHOW TABLES FROM iceberg.yfinance`).
  */
class CatalogSpec extends SparkSpec {

  test("register is idempotent and lists exactly the lake tables") {
    Catalog.register(spark, sf())
    Catalog.register(spark, sf()) // re-run must not throw or duplicate
    val listed = spark.sql(s"SHOW TABLES IN ${Catalog.DB}")
      .where(!col("isTemporary"))
      .select("tableName").collect().map(_.getString(0)).sorted
    assert(listed.toSeq == Tables.all.sorted)
  }

  test("named reads match the path-based loader row-for-row") {
    Catalog.register(spark, sf())
    for (t <- Seq("nation", "events")) {
      val byName = spark.table(s"${Catalog.DB}.$t")
      val byPath = Tables.load(spark, sf(), t)
      assert(byName.count() == byPath.count(), s"$t count")
      assert(byName.schema == byPath.schema, s"$t schema")
    }
  }

  test("listing carries correct row and column counts") {
    val rows = Catalog.tablesListing(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet == Tables.all.toSet)
    assert(rows("region") == ((5L, 2L)))
    assert(rows("events")._2 == 6L)
    assert(rows("lineitem")._1 == Tables.load(spark, sf(), "lineitem").count())
  }

  test("describe reports Spark type names incl. the rebuilt events ts") {
    val d = Catalog.describeAll(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(d(("events", "ts")) == "timestamp")
    assert(d(("embeddings", "embedding")) == "array<float>")
    assert(d(("lineitem", "l_quantity")) == "double")
    assert(d(("lineitem", "l_shipdate")) == "timestamp_ntz")
  }

  test("named tables keep pushdown: filter on graft.lineitem reaches the scan") {
    Catalog.register(spark, sf())
    val p = spark.table(s"${Catalog.DB}.lineitem")
      .where(col("l_quantity") < 5).select("l_orderkey")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"), p.take(1200))
  }
}
