package graft.dedup

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative min-label propagation for connected components —
  * the step that turns pairwise near-dup EDGES into dedup CLUSTERS
  * (keep one doc per component).
  *
  * Each round propagates labels one hop through the edge graph and
  * then pointer-jumps through the label graph (adopt the label of
  * your label), doubling the effective distance → O(log diameter)
  * rounds.
  *
  * The loop runs on co-partitioned RDDs, not DataFrames — the one
  * place in this engine where dropping below Catalyst is the right
  * call (GraphX makes the same choice). A DataFrame loop re-analyzes,
  * re-optimizes, and re-codegens the 3-join round plan on every
  * iteration and eagerly re-materializes it through localCheckpoint;
  * at bench scale that fixed ~1 s/round of driver work dominated the
  * query. Here the edge RDD and the label RDD share one
  * HashPartitioner, so each round's edge⋈label join is NARROW (zero
  * shuffle); only the three key-changing steps (neighbor-min
  * reduceByKey, pointer-jump rekey, and the rekey back to vertex id)
  * shuffle, and they ship bare (Long, Long) pairs.
  */
object ConnectedComponents {

  /** @param edges    (src, dst) undirected edge list
    * @param vertices single `id` column
    * @param maxIter  soft round target: pointer jumping converges in
    *                 O(log diameter) rounds, so this is normally never
    *                 reached — but if labels are still changing there
    *                 the loop KEEPS GOING (with a warning) rather than
    *                 silently returning wrong components (r3 advice),
    *                 up to the `hardStop` round bound.
    * @param hardStop hard cost bound on rounds (clamped to >= maxIter).
    *                 Callers that used maxIter to bound latency can pin
    *                 hardStop = maxIter to restore a strict budget; the
    *                 default keeps convergence-over-budget semantics.
    * @return (id, component) — component = min reachable vertex id
    */
  def run(edges: DataFrame, vertices: DataFrame, maxIter: Int = 8,
          verbose: Boolean = false, hardStop: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // ~500k KEYED ROWS per task, sized by max(vertices, symmetric
    // edges) — a small graph still runs single-task rounds instead of
    // paying session-width scheduling 2×/round, but the round cost is
    // O(edges), not O(vertices): a clone-heavy corpus (near-dup dedup
    // is exactly that) can carry 25× more edges than vertices, and
    // sizing by n alone ran sf5 ccAnn's loop (100k vertices, 4.9M sym
    // entries) on ONE partition — 36 s of single-task rounds for a
    // ~1 s edge-generation query (r17 CcAnnProfile attribution). The
    // edge volume is counted on the cached symmetric RDD, so the edge
    // PIPELINE (which may be an expensive join) still runs once.
    val n = vertices.count()
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toLong
    val symRaw: RDD[(Long, Long)] = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].rdd
      .flatMap { case (s, d) => Iterator((s, d), (d, s)) }
      .cache()
    val m = symRaw.count()
    val part = new HashPartitioner(
      math.max(1L, math.min(sessionParts, math.max(n, m) / 500000L + 1L)).toInt)

    // symmetric edge set keyed by ONE endpoint: because the set is
    // symmetric, "keyed by src" and "keyed by dst" are the same RDD —
    // one copy serves the label-of-neighbor lookup. NOT deduplicated:
    // every caller already emits distinct pairs (cappedPairs
    // dropDuplicates / 1-NN top-1), duplicate edges would be
    // CORRECTNESS-harmless anyway (reduceByKey(min) is idempotent —
    // they only add join fan-out), and the old global distinct() was
    // a full extra shuffle of the symmetric set every run.
    val sym: RDD[(Long, Long)] = symRaw
      .partitionBy(part)
      .cache()
    sym.count() // materialize so the pre-partition copy can be released
    symRaw.unpersist(blocking = false)

    var labels: RDD[(Long, Long)] = vertices
      .select(col("id").cast("long")).as[Long].rdd
      .map(id => (id, id))
      .partitionBy(part)

    val stopAt = math.max(maxIter, hardStop)
    var iter = 0
    var changed = 1L
    var prevCache: RDD[(Long, (Long, Long))] = null
    while (iter < stopAt && changed > 0) {
      if (iter == maxIter && maxIter < stopAt)
        System.err.println(s"[graft-cc] labels still changing after soft target " +
          s"maxIter=$maxIter rounds; continuing to convergence (hard stop $stopAt)")
      // min label among neighbors: sym is keyed by the neighbor-side
      // endpoint, so the join is narrow; the rekey to the receiving
      // vertex is shuffle #1.
      val neighborMin = sym.join(labels)
        .map { case (_, (receiver, neighborLabel)) => (receiver, neighborLabel) }
        .reduceByKey(part, math.min(_: Long, _: Long))
      // stepped feeds both the pointer-jump rekey AND the label
      // lookup below — cache it so its join isn't computed twice.
      val stepped = labels.leftOuterJoin(neighborMin)
        .mapValues { case (c, nOpt) => (c, math.min(c, nOpt.getOrElse(c))) }
        .cache()
      // pointer jumping: adopt the label OF the current label
      // (component -> label[component]); the rekey by component is
      // shuffle #2, the lookup join against `stepped` is narrow, the
      // rekey back to vertex id is shuffle #3.
      val byComp = stepped
        .map { case (id, (prev, c)) => (c, (id, prev)) }
        .partitionBy(part)
      val updated = byComp
        .leftOuterJoin(stepped.mapValues(_._2))
        .map { case (c, ((id, prev), jumpOpt)) =>
          (id, (prev, math.min(c, jumpOpt.getOrElse(c))))
        }
        .partitionBy(part)
        .cache()
      // one action per round: the count both materializes the cache
      // and serves as the convergence test. Round 0 always changes
      // labels when any edge joins two distinct ids, so only the
      // materializing count runs there.
      changed = if (iter == 0) { updated.count(); 1L }
        else updated.filter { case (_, (prev, c)) => prev != c }.count()
      stepped.unpersist(blocking = false)
      if (prevCache != null) prevCache.unpersist(blocking = false)
      prevCache = updated
      labels = updated.mapValues(_._2)
      if (verbose) println(s"[cc] round $iter changed=$changed")
      iter += 1
    }
    if (changed > 0)
      System.err.println(s"[graft-cc] WARNING: not converged after $stopAt rounds; " +
        "components may be split (pathological diameter)")
    // the RDD lineage ends here; hand Catalyst a checkpointed scan so
    // downstream plans don't re-run the loop, and release the round
    // caches.
    val out = labels.toDF("id", "component").localCheckpoint()
    sym.unpersist(blocking = false)
    if (prevCache != null) prevCache.unpersist(blocking = false)
    out
  }
}
