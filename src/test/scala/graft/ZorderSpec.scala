package graft

import org.apache.spark.sql.functions._

/** Observes the point of z-order clustering: per-file min/max ranges
  * on BOTH clustered dimensions shrink vs an unclustered write, which
  * is what lets scans skip files on either predicate.
  */
class ZorderSpec extends SparkSpec {

  private def avgFileRange(dir: String, column: String): Double = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.toString).filter(_.endsWith(".parquet"))
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(column)).cast("double"), max(col(column)).cast("double")).collect()(0)
      r.getDouble(1) - r.getDouble(0)
    }
    ranges.sum / ranges.length
  }

  test("z-ordered files carry tighter ranges than unclustered files on both dims") {
    functions.GraftFunctions.register(spark)
    val ev = sources.Tables.load(spark, sf(), "events")
    val base = "/tmp/graft_test/zorder"
    lake.SnapshotTable.drop(spark, base)
    ev.repartition(8).write.parquet(s"$base/plain")
    lake.ZorderWriter.write(ev, Seq("user_id", "value"), s"$base/zorder", nPartitions = 8)
    val plainUser = avgFileRange(s"$base/plain", "user_id")
    val zUser = avgFileRange(s"$base/zorder", "user_id")
    val plainValue = avgFileRange(s"$base/plain", "value")
    val zValue = avgFileRange(s"$base/zorder", "value")
    assert(zUser < plainUser * 0.8, s"user_id range $zUser !< ${plainUser * 0.8}")
    assert(zValue < plainValue * 0.8, s"value range $zValue !< ${plainValue * 0.8}")
  }
}
