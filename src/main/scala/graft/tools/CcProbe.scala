package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: how many pointer-jumping rounds does the sf0.1 1-NN
  * graph actually need, and where does ccClusters' time go?
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    var t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup.exactSelf1nn(spark, e)
      .select(col("vec_id").as("src"), col("nn_id").as("dst"))
      .localCheckpoint()
    println(f"PROBE 1nn ${(System.nanoTime() - t0) / 1e9}%.2f s, edges ${pairs.count()}")
    t0 = System.nanoTime()
    val labels = graft.dedup.ConnectedComponents.run(
      pairs, e.select(col("vec_id").as("id")), maxIter = 8, verbose = true)
    val n = labels.select(countDistinct("component")).head().getLong(0)
    println(f"PROBE cc ${(System.nanoTime() - t0) / 1e9}%.2f s, components $n")
    spark.stop()
  }
}
