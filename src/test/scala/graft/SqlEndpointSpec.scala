package graft

import java.sql.DriverManager

import graft.sources.Catalog

/** Drives the in-process Thrift/JDBC endpoint the way a BI tool
  * would: two concurrent JDBC clients listing the catalog and running
  * aggregates over the named tables.
  */
class SqlEndpointSpec extends SparkSpec {

  // startOnce: the Thrift server is a JVM singleton, and QueriesSpec's
  // endpoint_sql_agg smoke may have bound it already in this JVM
  private lazy val port: Int = {
    Catalog.register(spark, sf())
    graft.endpoint.SqlEndpoint.startOnce(spark)
  }

  private def connect(): java.sql.Connection = {
    // the server binds asynchronously; retry briefly
    var last: Throwable = null
    for (_ <- 1 to 30) {
      try return DriverManager.getConnection(s"jdbc:hive2://localhost:$port/default", "", "")
      catch { case t: Throwable => last = t; Thread.sleep(1000) }
    }
    throw last
  }

  test("JDBC client sees the graft catalog and query results match spark.sql") {
    val conn = connect()
    try {
      val st = conn.createStatement()
      val rs = st.executeQuery("SHOW TABLES IN graft")
      val names = Iterator.continually(rs).takeWhile(_.next()).map(_.getString(2)).toSet
      assert(Set("lineitem", "events", "embeddings").subsetOf(names), names.toString)
      val rs2 = st.executeQuery(
        "SELECT count(*) AS n, count(distinct l_orderkey) AS k FROM graft.lineitem")
      assert(rs2.next())
      val direct = spark.sql(
        "SELECT count(*) AS n, count(distinct l_orderkey) AS k FROM graft.lineitem").head()
      assert(rs2.getLong(1) == direct.getLong(0) && rs2.getLong(2) == direct.getLong(1))
    } finally conn.close()
  }

  test("two concurrent clients run independent queries") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = Seq(
      "SELECT count(*) FROM graft.orders",
      "SELECT count(*) FROM graft.customer").map { q =>
      Future {
        val c = connect()
        try {
          val rs = c.createStatement().executeQuery(q)
          rs.next(); rs.getLong(1)
        } finally c.close()
      }
    }
    val Seq(nOrders, nCust) = Await.result(Future.sequence(fs), 120.seconds)
    assert(nOrders > 0 && nCust > 0 && nOrders != nCust)
  }

  test("graft_* functions are callable over JDBC") {
    val conn = connect()
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c")
      assert(rs.next() && math.abs(rs.getDouble(1) - 1.0) < 1e-9)
    } finally conn.close()
  }

  test("a BI client reads a cataloged LAKE table with engine semantics over JDBC") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val loc = "/tmp/graft_test/jdbc_lake"
    graft.lake.SnapshotTable.drop(spark, loc)
    graft.lake.SnapshotTable.commit(spark, loc,
      (0 until 60).map(k => (k.toLong, s"r$k")).toDF("id", "v"))
    graft.lake.SnapshotTable.deleteWhereMor(spark, loc, col("id") < 20)
    graft.sources.PersistentCatalog.registerTable(
      spark, "graft.jdbc_lake", "parquet", loc)
    val conn = connect()
    try {
      // current version with the MoR delete applied — what the raw
      // parquet-on-root registration could never serve
      val rs = conn.createStatement().executeQuery(
        "SELECT count(*) AS n, min(id) AS lo FROM graft.jdbc_lake")
      assert(rs.next() && rs.getLong(1) == 40 && rs.getLong(2) == 20,
        "JDBC must see the engine's read: 40 live rows starting at id 20")
    } finally {
      conn.close()
      spark.sql("DROP TABLE IF EXISTS graft.jdbc_lake")
    }
  }

  test("time travel against two dirs in ONE session serves each dir's data") {
    // ADVICE r11 (medium): Spark's CatalogManager caches a V2 catalog
    // instance per session after first use, so a FIXED catalog name
    // would keep serving the first dir's events_tt after the session
    // is pointed at a second dir. endpointTimeTravel derives the
    // catalog name from the dir — pin that both dirs round-trip their
    // OWN v1 aggregate through JDBC in one session, in both orders.
    import org.apache.spark.sql.functions._
    def expected(dir: String): Seq[(String, Long)] =
      graft.sources.Tables.load(spark, dir, "events")
        .filter(col("event_id") % 2 === 0)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    def served(dir: String): Seq[(String, Long)] =
      graft.endpoint.SqlEndpoint.endpointTimeTravel(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val (small, big) = (sf("0.001"), sf("0.01"))
    assert(expected(small) !== expected(big),
      "precondition: the two dirs must disagree for the pin to bite")
    assert(served(small) === expected(small))
    assert(served(big) === expected(big))
    // and back to the first dir: still its own data, not a stale cache
    assert(served(small) === expected(small))
  }
}
