package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: per-row agreement between limited and unlimited as-of. */
object LimitProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val l = ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val r = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_event_id"), col("user_id").as("v_user_id"), col("ts").as("v_ts"))
    def run(lim: Option[Int]) = {
      val j = graft.plans.AsOf.join(l, r, "user_id", "v_user_id", "ts", "v_ts")
        .select("event_id", "v_event_id")
      lim.fold(j)(j.limit).collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    }
    val full = run(None)
    val limited = run(Some(25))
    val disagree = limited.count { case (k, v) => full(k) != v }
    println(s"LIMIT_PROBE limited=${limited.size} disagreements_vs_full=$disagree")
    spark.stop()
  }
}
