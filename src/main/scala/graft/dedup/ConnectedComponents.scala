package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative min-label propagation for connected components —
  * the step that turns pairwise near-dup EDGES into dedup CLUSTERS
  * (keep one doc per component).
  *
  * Each round propagates labels one hop through the edge graph and
  * then pointer-jumps through the label graph (adopt the label of
  * your label), doubling the effective distance → O(log diameter)
  * rounds. `localCheckpoint` truncates the growing plan lineage each
  * round — without it round i re-executes rounds 0..i-1 and the job
  * goes quadratic. The convergence count is served from the
  * checkpoint's cached blocks, so early termination costs one cheap
  * job per round.
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
      .localCheckpoint() // edges are reused every round - materialize once
    var labels = vertices.select(col("id"), col("id").as("component"))
    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "dst_id"), col("dst") === col("dst_id"))
        .groupBy(col("src").as("nid"))
        .agg(min("component").as("ncomp"))
      val stepped = labels
        .join(neighborMin, col("id") === col("nid"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("ncomp"), col("component"))).as("component"),
          col("component").as("prev"))
      // pointer jumping: also adopt the label OF the current label
      // (component -> label[component]), doubling the effective hop
      // distance per round -> O(log diameter) rounds instead of
      // O(diameter)
      val byId = stepped.select(col("id").as("cid"), col("component").as("ccomp"))
      val updated = stepped
        .join(byId, col("component") === col("cid"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("ccomp"), col("component"))).as("component"),
          col("prev"))
        .localCheckpoint()
      // the checkpoint materialized `updated`, so this count is served
      // from cached blocks - one cheap job, and it doubles as the
      // convergence test that stops diameter-short graphs early
      changed = updated.filter(col("component") =!= col("prev")).count()
      labels = updated.select("id", "component")
      iter += 1
    }
    labels
  }
}
