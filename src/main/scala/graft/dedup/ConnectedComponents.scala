package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative min-label propagation for connected components —
  * the step that turns pairwise near-dup EDGES into dedup CLUSTERS
  * (keep one doc per component).
  *
  * Each iteration is one shuffle (edge join + groupBy min); labels
  * propagate one hop per iteration, so `maxIter` bounds the handled
  * component diameter. `localCheckpoint` truncates the growing plan
  * lineage each round — without it iteration i re-executes rounds
  * 0..i-1 and the job goes quadratic. At petabyte scale you'd switch
  * to the large-star/small-star algorithm (fewer rounds); the
  * dataflow here is the same shape.
  */
object ConnectedComponents {

  /** @param edges    (src, dst) undirected edge list
    * @param vertices single `id` column
    * @return (id, component) — component = min vertex id reachable
    *         within maxIter hops
    */
  def run(edges: DataFrame, vertices: DataFrame, maxIter: Int = 8): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    var labels = vertices.select(col("id"), col("id").as("component"))
    (1 to maxIter).foreach { _ =>
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "dst_id"), col("dst") === col("dst_id"))
        .groupBy(col("src").as("nid"))
        .agg(min("component").as("ncomp"))
      labels = labels
        .join(neighborMin, col("id") === col("nid"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("ncomp"), col("component"))).as("component"))
        .localCheckpoint()
    }
    labels
  }
}
