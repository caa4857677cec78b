package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: pathological chain graph through the public CC API. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // one chain 0-1-2-...-99 plus an isolated pair 1000-1001
    val edges = ((0L until 99L).map(i => (i, i + 1)) :+ (1000L, 1001L)).toDF("src", "dst")
    val vertices = ((0L until 100L) ++ Seq(1000L, 1001L)).toDF("id")
    val labels = graft.dedup.ConnectedComponents.run(edges, vertices, maxIter = 8)
    val comps = labels.groupBy("component").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    println(s"CC_PROBE components=${comps.mkString(" ")}")
    spark.stop()
  }
}
