package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: observes Lloyd refinement moving IVF centroids and
  * balancing inverted lists vs the raw seeds. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .select("vec_id", "embedding")
    val seeds = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("c_emb"))
    val refined = graft.ann.Ann.refineCentroids(e, seeds, iters = 2)
    def listSizes(cents: org.apache.spark.sql.DataFrame) =
      e.join(broadcast(cents))
        .select(col("vec_id"), expr("graft_cosine(embedding, c_emb)").as("c"), col("cid"))
        .groupBy("vec_id").agg(expr("graft_topk(c, cid, 1)").as("t"))
        .select(col("t")(0).getField("id").as("cid"))
        .groupBy("cid").count().select("count").collect().map(_.getLong(0)).sorted
    val s0 = listSizes(seeds)
    val s1 = listSizes(refined)
    // did centroids move? compare a refined c_emb against the seed vector
    val moved = refined.as("r").join(seeds.as("s"), col("r.cid") === col("s.cid"))
      .select(expr("graft_cosine(r.c_emb, s.c_emb)").as("cos"))
      .agg(min("cos"), avg("cos")).collect()(0)
    println(s"IVF_PROBE seed list sizes: min=${s0.head} max=${s0.last}")
    println(s"IVF_PROBE kmeans list sizes: min=${s1.head} max=${s1.last}")
    println(f"IVF_PROBE centroid movement: min cos=${moved.getDouble(0)}%.3f avg cos=${moved.getDouble(1)}%.3f (1.0 = unmoved)")
    spark.stop()
  }
}
