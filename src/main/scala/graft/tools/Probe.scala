package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe: schema/read sanity for the driver testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- graft.sources.Tables.all) {
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"== $t: ${df.count()} rows")
        df.printSchema()
        if (t == "events" || t == "region") df.show(3, false)
      } catch { case e: Throwable => println(s"== $t FAILED: ${e.getMessage.take(300)}") }
    }
    spark.stop()
  }
}
