package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: drives the `spark.sql.extensions` config-string install
  * path (how a cluster deploys graft), then uses a function and the
  * as-of operator with no runtime registration calls.
  */
object ExtProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val cos = spark.sql("SELECT graft_cosine(array(3.0F,4.0F), array(3.0F,4.0F))").collect()(0).getDouble(0)
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))).toDF("uid", "t")
    val r = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), "v")).toDF("r_uid", "r_t", "tag")
    // note: no GraftFunctions.register / no AsOf strategy injection here
    val plan = graft.plans.AsOf.join(l, r, "uid", "r_uid", "t", "r_t")
    val tag = plan.select("tag").collect()(0).getString(0)
    println(s"EXT_PROBE cosine=$cos asof_tag=$tag")
    spark.stop()
  }
}
