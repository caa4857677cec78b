package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: mimics the driver's t1 smoke (SparkEntry.entry rows>0). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, false)
    println(s"ENTRY_ROWS=$n")
    spark.stop()
  }
}
