package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base for all suites (one JVM-wide session). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
    // static conf for SqlEndpointSpec: serve JDBC clients from this
    // session so temp state stays visible (see SqlEndpoint.start)
    .config("spark.sql.hive.thriftServer.singleSession", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def sf(s: String = "0.001"): String = s"/root/testdata/sf$s"
}
