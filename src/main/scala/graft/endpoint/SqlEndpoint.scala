package graft.endpoint

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2

/** Multi-client SQL endpoint: the reference serves Metabase /
  * CloudBeaver / DBeaver through Trino's JDBC surface (reference
  * RUNBOOK.md §10); graft serves the same clients through Spark's
  * Thrift/JDBC server started IN-PROCESS against the live session —
  * every `graft.*` catalog table, temp view, and graft_* SQL function
  * is visible to any HiveServer2-protocol client
  * (`jdbc:hive2://host:port`). On a real cluster this runs on the
  * driver and fans queries out to the executors like any other job.
  */
object SqlEndpoint {

  /** Start the Thrift server on `port` against `spark`'s catalog.
    * Returns after the server is bound. Embedded metastore/scratch
    * state is pointed at /tmp so the repo tree stays clean.
    */
  def start(spark: SparkSession, port: Int): Unit = {
    // Single-session mode serves every client from THIS session, so
    // temp views and runtime-registered graft_* functions stay
    // visible. It is a STATIC conf — set it when building the host
    // session. The per-client-isolation alternative: build the host
    // session .withExtensions(new GraftExtensions), whose injected
    // functions survive the newSession() each connection gets.
    val single = spark.conf.getOption(
      "spark.sql.hive.thriftServer.singleSession").contains("true")
    if (!single) throw new IllegalStateException(
      "SqlEndpoint needs spark.sql.hive.thriftServer.singleSession=true " +
        "at session build time (static conf), or a session built with " +
        "GraftExtensions for per-client isolation")
    graft.functions.GraftFunctions.register(spark)
    System.setProperty("derby.stream.error.file", s"/tmp/graft_derby_$port.log")
    val sc = spark.sqlContext
    sc.setConf("hive.server2.thrift.port", port.toString)
    sc.setConf("hive.server2.thrift.bind.host", "localhost")
    sc.setConf("javax.jdo.option.ConnectionURL",
      s"jdbc:derby:;databaseName=/tmp/graft_metastore_$port;create=true")
    sc.setConf("hive.exec.scratchdir", s"/tmp/graft_hive_scratch_$port")
    sc.setConf("hive.server2.enable.doAs", "false")
    HiveThriftServer2.startWithContext(sc)
  }
}
