package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: show scan schemas for an un-preselected as-of join. */
object AsOfPruneProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val l = ev.filter(col("event_type") === "purchase")
    val r = ev.filter(col("event_type") === "view")
      .withColumnRenamed("event_id", "v_event_id")
      .withColumnRenamed("user_id", "v_user_id")
      .withColumnRenamed("ts", "v_ts")
    val joined = graft.plans.AsOf.join(l, r, "user_id", "v_user_id", "ts", "v_ts")
      .select("event_id", "v_event_id")
    joined.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("ReadSchema"))
      .foreach(line => println("SCHEMA " + line.trim.split("ReadSchema: ")(1).take(120)))
    spark.stop()
  }
}
