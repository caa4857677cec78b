package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.GraftFunctions
import graft.sources.Tables

/** §2E similarity search over the embeddings table.
  *
  * Scale architecture: the query set is always the small side →
  * broadcast it; the corpus streams. Brute force scores
  * |corpus|×|queries| pairs with the codegen'd cosine expression; the
  * LSH variant prunes the corpus to matching hyperplane buckets first
  * (signatures are deterministic functions of (seed, plane, dim), so
  * no RNG state needs to ship to executors).
  */
object Ann {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings").select("vec_id", "embedding")

  // ---------------------------------------------------------------
  /** Brute-force top-5 cosine neighbors for every 50th vector. */
  def bruteForce(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = e.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        expr("graft_cosine(q_emb, embedding)").as("cos"))
    // bounded top-k aggregate: map side forwards ≤5 pairs per query
    // instead of the whole score set (vs. a window sort of all pairs)
    scored
      .groupBy("q_id")
      .agg(expr("graft_topk(cos, neighbor_id, 5)").as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("neighbor_id"), round(col("col.score"), 6).as("cos"))
      .orderBy("q_id", "rank")
  }

  val bruteForceOracle: String =
    """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id % 50 = 0),
      |scored AS (
      | SELECT q.q_id, e.vec_id AS neighbor_id,
      |  list_sum(list_transform(range(1, LEN(q.q_emb) + 1),
      |    i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
      |  / (sqrt(list_sum(list_transform(range(1, LEN(q.q_emb) + 1),
      |    i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))))
      |   * sqrt(list_sum(list_transform(range(1, LEN(e.embedding) + 1),
      |    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) AS cos
      | FROM q, embeddings e WHERE e.vec_id <> q.q_id)
      |SELECT q_id, rank, neighbor_id, ROUND(cos, 6) AS cos
      |FROM (SELECT q_id, neighbor_id, cos,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
      |      FROM scored) t
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------
  /** LSH-bucketed ANN: two 8-bit hyperplane tables prune candidates;
    * exact cosine re-ranks within buckets. Approximate → rows-only.
    */
  def lsh(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = emb(s, dir)
    val tables = Seq(1L, 2L)
    val bucketed = tables.map { seed =>
      e.select(col("vec_id"), col("embedding"), lit(seed).as("tbl"),
        expr(s"graft_lsh_bucket(embedding, 8, $seed)").as("bucket"))
    }.reduce(_ unionByName _)
    val q = bucketed.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("tbl"), col("bucket"))
    val cand = bucketed.join(broadcast(q),
        Seq("tbl", "bucket")).filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("q_emb"), col("vec_id").as("neighbor_id"), col("embedding"))
      .dropDuplicates("q_id", "neighbor_id")
      .withColumn("cos", expr("graft_cosine(q_emb, embedding)"))
    cand
      .groupBy("q_id")
      .agg(expr("graft_topk(cos, neighbor_id, 3)").as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("neighbor_id"), round(col("col.score"), 6).as("cos"))
      .orderBy("q_id", "rank")
  }

  // ---------------------------------------------------------------
  /** Lloyd refinement: reassign vectors to nearest centroid, then
    * recompute each centroid as the per-dimension mean of its list.
    * Means are computed via posexplode → (cid, dim) partial-agg —
    * one shuffle of (cid, dim, sum, count) per round, never the
    * vectors themselves.
    */
  def refineCentroids(e: DataFrame, init: DataFrame, iters: Int): DataFrame = {
    var cents = init
    (1 to iters).foreach { _ =>
      val assigned = e.join(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("cid"),
          expr("graft_cosine(embedding, c_emb)").as("c_cos"))
        .groupBy("vec_id", "embedding")
        .agg(expr("graft_topk(c_cos, cid, 1)").as("top"))
        .select(col("embedding"), col("top")(0).getField("id").as("cid"))
      cents = assigned
        .select(col("cid"), posexplode(col("embedding")))
        .groupBy("cid", "pos")
        .agg(avg(col("col")).as("mean"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(pos, mean))), x -> CAST(x.mean AS FLOAT))")
          .as("c_emb"))
        .localCheckpoint()
    }
    cents
  }

  /** IVF-style ANN: a k-means coarse quantizer (16 seed centroids +
    * 2 Lloyd rounds) partitions the corpus into inverted lists; each
    * query probes its 4 nearest lists only. The scan cost drops from
    * |corpus| to |probed lists| per query — the standard
    * billion-vector scale path. Approximate → rows-only.
    */
  def ivf(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = emb(s, dir)
    val seeds = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("c_emb"))
    val centroids = refineCentroids(e, seeds, iters = 2)
    // inverted lists: every vector → nearest centroid
    val assigned = e.join(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cid"),
        expr("graft_cosine(embedding, c_emb)").as("c_cos"))
      .groupBy("vec_id")
      .agg(expr("graft_topk(c_cos, cid, 1)").as("top"))
      .select(col("vec_id"), col("top")(0).getField("id").as("cid"))
      .join(e, Seq("vec_id"))
    // queries probe their 4 nearest lists
    val probes = e.filter(col("vec_id") % 50 === 0)
      .join(broadcast(centroids))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("cid"),
        expr("graft_cosine(embedding, c_emb)").as("c_cos"))
      .groupBy("q_id", "q_emb")
      .agg(expr("graft_topk(c_cos, cid, 4)").as("top"))
      .select(col("q_id"), col("q_emb"), explode(expr("transform(top, t -> t.id)")).as("cid"))
    // search only within probed lists
    probes.join(assigned, Seq("cid"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", expr("graft_cosine(q_emb, embedding)"))
      .groupBy("q_id")
      .agg(expr("graft_topk(cos, vec_id, 3)").as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("neighbor_id"), round(col("col.score"), 6).as("cos"))
      .orderBy("q_id", "rank")
  }

  // ---------------------------------------------------------------
  val queries: Seq[Q] = Seq(
    Q("ann_bruteforce", bruteForce, Some(bruteForceOracle)),
    Q("ann_lsh", lsh, None),
    Q("ann_ivf", ivf, None))
}
