package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.lake.SnapshotTable

/** OFFLINE IVF-PQ index lifecycle — completes what [[IvfIndex]]
  * started (VERDICT r6 flagged ann_pq re-training BOTH quantizer
  * levels inside every query as the remaining production smell; at
  * sf5 that entry spends 90 s, most of it redundantly re-deriving
  * artifacts that never change). The persisted index is three
  * SnapshotTables under one root:
  *
  *  - `coarse` — the coarse quantizer (cid, c_emb), metadata-sized;
  *  - `books` — the m per-subspace residual codebooks
  *    (sub_idx, code, c_chunk), metadata-sized;
  *  - `codes` — the COMPRESSED corpus, ONE row per vector
  *    (vec_id, cid, codes array&lt;tinyint&gt;[m]): byte-scale codes
  *    instead of float vectors (dims/m compression),
  *    range-clustered by cid with per-file cid blooms so a probe's
  *    `cid IN (…)` read opens only the probed lists' code files.
  *    The array-per-vector shape (not row-per-subspace) is what lets
  *    serving score each (query, vector) pair with one expression
  *    over a broadcast distance table instead of an m-way shuffle.
  *
  * Training and encoding are [[Ann.pqTrain]]/[[Ann.pqEncode]] — the
  * SAME deterministic chain as the in-query [[Ann.pqKnn]], so served
  * ranks are bit-equal to in-query-trained ranks (PqServedSpec) and
  * the full two-level oracle still replays end-to-end. Serving is
  * [[Ann.pqServe]]: ADC distance tables against the stored books,
  * scored only over bloom-fetched probed lists.
  */
object PqIndex {

  /** Stored-codes layout version; bumped when the codes schema
    * changes so an index persisted by an older build is treated as
    * stale and rebuilt rather than mis-read. v2 = array-of-m-codes
    * per vector (v1 was row-per-subspace).
    */
  private val CodesFormat = "arr_v2"

  private[graft] def indexRoot(dir: String): String =
    s"/tmp/graft_ann_index/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/pq"

  /** Build (or reuse, fingerprint-guarded) the stored index. */
  def ensure(s: SparkSession, dir: String, corpus: DataFrame,
             m: Int, ksub: Int, nLists: Int, lloydIters: Int = 2): String = {
    val root = indexRoot(dir)
    val coarseRoot = s"$root/coarse"
    val fp = IvfIndex.fingerprint(dir)
    // an unreadable stored index (pre-trailer format, torn publish)
    // is simply stale — rebuild, same as a corpus change
    val fresh = try {
      SnapshotTable.currentVersion(s, coarseRoot) > 0 && {
        val head = SnapshotTable.commitMeta(s, coarseRoot,
          SnapshotTable.currentVersion(s, coarseRoot))
        head.get("corpus_fp").contains(fp) &&
          head.get("codes_fmt").contains(CodesFormat)
      }
    } catch { case _: IllegalStateException => false }
    if (!fresh) buildAt(s, root, corpus, m, ksub, nLists, lloydIters,
      meta = Map("corpus_fp" -> fp))
    root
  }

  /** Train + encode + persist at an explicit root (no staleness
    * guard — callers own it). One index-build job at 100 TB; every
    * serving query thereafter is probe-only.
    */
  def buildAt(s: SparkSession, root: String, corpus: DataFrame,
              m: Int, ksub: Int, nLists: Int, lloydIters: Int,
              meta: Map[String, String] = Map.empty): Unit = {
    GraftFunctions.register(s)
    val dims = corpus.select(size(col("embedding"))).head.getInt(0)
    require(dims % m == 0, s"dims $dims not divisible by m=$m subspaces")
    val sub = dims / m
    Seq("coarse", "books", "codes").foreach(t => SnapshotTable.drop(s, s"$root/$t"))
    val (coarse, books) = Ann.pqTrain(s, corpus, m, ksub, nLists, lloydIters)
    val codes = Ann.pqEncode(s, coarse, books, corpus, m, sub)
    val full = meta ++ Map("m" -> m.toString, "sub" -> sub.toString,
      "ksub" -> ksub.toString, "n_lists" -> nLists.toString,
      "codes_fmt" -> CodesFormat)
    SnapshotTable.commit(s, s"$root/codes",
      codes.repartitionByRange(8, col("cid"), col("vec_id")),
      meta = full, bloomCols = Seq("cid"))
    SnapshotTable.commit(s, s"$root/books", books, meta = full)
    SnapshotTable.commit(s, s"$root/coarse", coarse, meta = full)
  }

  /** Probe-only ADC serving from the stored artifact: quantizers read
    * back (metadata-sized, broadcast), probed list ids collected
    * (O(nLists)), and ONLY those lists' code files opened via the
    * bloom-pruned read.
    */
  def serve(s: SparkSession, root: String, queries: DataFrame,
            k: Int, nProbes: Int): DataFrame = {
    GraftFunctions.register(s)
    val coarseRoot = s"$root/coarse"
    val headMeta = SnapshotTable.commitMeta(s, coarseRoot,
      SnapshotTable.currentVersion(s, coarseRoot))
    val m = headMeta("m").toInt
    val sub = headMeta("sub").toInt
    val coarse = SnapshotTable.read(s, coarseRoot)
    val books = SnapshotTable.read(s, s"$root/books")
    val probedCids = queries
      .join(broadcast(coarse))
      .select(col("q_id"), col("cid"),
        expr("graft_cosine(q_emb, c_emb)").as("c_cos"))
      .groupBy("q_id")
      .agg(expr(s"graft_topk(c_cos, cid, $nProbes)").as("top"))
      .select(explode(expr("transform(top, t -> t.id)")).as("cid"))
      .distinct().collect().map(_.getLong(0)).sorted
    val codes = SnapshotTable.readWhere(s, s"$root/codes",
      col("cid").isin(probedCids.toIndexedSeq: _*))
    Ann.pqServe(s, coarse, books, codes, queries, k, m, sub, nProbes)
  }
}
