package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.lake.SnapshotTable

/** OFFLINE ANN index lifecycle (VERDICT r6 item 5): at 100 TB an IVF
  * quantizer is trained ONCE by an index-build job and queries are
  * served from the stored artifact — training inside every query
  * (fine for the correctness gate) is wrong in production. The index
  * is two SnapshotTables under one root:
  *
  *  - `centroids` — the coarse quantizer (cid, c_emb), metadata-sized;
  *  - `lists` — the corpus with its list assignment (cid, vec_id,
  *    embedding), written RANGE-CLUSTERED by cid with per-file cid
  *    bloom filters, so a probe's `cid IN (…)` read opens only the
  *    files holding the probed inverted lists (SnapshotTable bloom
  *    skipping doubles as the inverted-list fetch — the same files-
  *    pruned-by-metadata mechanic Iceberg gives the reference).
  *
  * Training is the SAME deterministic pipeline as the in-query
  * [[Ann.ivfKnn]] (bounded sample, first-n seeds, local Lloyd), so a
  * served query is bit-equal to an in-query-trained one — spec-pinned
  * by IvfServedSpec and hash-gated by the ann_ivf_served oracle. The
  * build is fingerprint-guarded: a corpus change (size/mtime of the
  * source) rebuilds, an unchanged corpus reuses the stored artifact
  * across JVMs (the bench's later reps and every serving query pay
  * probe cost only).
  */
object IvfIndex {

  private[graft] def indexRoot(dir: String): String =
    s"/tmp/graft_ann_index/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/ivf"

  /** Source fingerprint: (leaf name, size, mtime) of the embeddings
    * table — same staleness guard as the streaming staging dir.
    */
  private[ann] def fingerprint(dir: String): String = {
    val src = java.nio.file.Paths.get(s"$dir/embeddings.parquet")
    val leaves: Seq[java.nio.file.Path] =
      if (java.nio.file.Files.isDirectory(src)) {
        val st = java.nio.file.Files.list(src)
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala.filter(_.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
        } finally st.close()
      } else Seq(src)
    // "fmt2" prefix: bumped when the on-disk table format changes
    // (e.g. the manifest EOF trailer) so stale persisted indexes
    // rebuild instead of tripping the completeness check
    leaves.map { p =>
      s"${p.getFileName}:${java.nio.file.Files.size(p)}:" +
        s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
    }.mkString("fmt2|", "|", "")
  }

  /** Build (or reuse) the stored index; returns its root. */
  def ensure(s: SparkSession, dir: String, corpus: DataFrame,
             nLists: Int, lloydIters: Int): String = {
    GraftFunctions.register(s)
    val root = indexRoot(dir)
    val centRoot = s"$root/centroids"
    val listRoot = s"$root/lists"
    val fp = fingerprint(dir)
    // an unreadable stored index (pre-trailer format, torn publish)
    // is simply stale — rebuild, same as a corpus change
    val fresh = try {
      SnapshotTable.currentVersion(s, centRoot) > 0 &&
        SnapshotTable.commitMeta(s, centRoot, SnapshotTable.currentVersion(s, centRoot))
          .get("corpus_fp").contains(fp)
    } catch { case _: IllegalStateException => false }
    if (!fresh) buildAt(s, root, corpus, nLists, lloydIters,
      meta = Map("corpus_fp" -> fp))
    root
  }

  /** Assign vectors to their nearest stored centroid — shared by the
    * initial build and incremental appends, so both produce the exact
    * deterministic assignment the oracle replays.
    */
  private def assignToLists(centroids: DataFrame, vecs: DataFrame): DataFrame =
    vecs.join(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cid"),
        expr("graft_cosine(embedding, c_emb)").as("c_cos"))
      .groupBy("vec_id")
      .agg(expr("graft_topk(c_cos, cid, 1)").as("top"))
      .select(col("vec_id"), col("top")(0).getField("id").as("cid"))
      .join(vecs, Seq("vec_id"))
      .select("cid", "vec_id", "embedding")

  /** Train + persist an index at an explicit root from an explicit
    * corpus (no fingerprint guard — callers own staleness).
    */
  def buildAt(s: SparkSession, root: String, corpus: DataFrame,
              nLists: Int, lloydIters: Int,
              meta: Map[String, String] = Map.empty): Unit = {
    GraftFunctions.register(s)
    val centRoot = s"$root/centroids"
    val listRoot = s"$root/lists"
    SnapshotTable.drop(s, centRoot)
    SnapshotTable.drop(s, listRoot)
    val centroids = Ann.trainCoarseLocal(s, corpus, nLists, iters = lloydIters)
    // range-cluster by cid so each file holds few whole lists; the
    // bloom filter then serves as the inverted-list file locator
    SnapshotTable.commit(s, listRoot,
      assignToLists(centroids, corpus).repartitionByRange(8, col("cid"), col("vec_id")),
      meta = meta ++ Map("n_lists" -> nLists.toString), bloomCols = Seq("cid"))
    SnapshotTable.commit(s, centRoot, centroids, meta = meta)
  }

  /** INCREMENTAL index maintenance: assign a new vector batch with
    * the STORED quantizer (no retraining) and append it to the lists
    * table as new cid-clustered, bloom-annotated files — O(batch)
    * compute and I/O; existing list files are never rewritten (the
    * manifest-list commit just re-references them). At 100 TB this is
    * the difference between absorbing a daily embedding drop in
    * minutes and rebuilding a corpus-sized index. Centroid drift under
    * sustained appends is the declared trade — rebuild cadence is an
    * offline policy decision, and [[buildAt]] is that rebuild.
    */
  def appendBatch(s: SparkSession, root: String, batch: DataFrame): Int = {
    GraftFunctions.register(s)
    val centroids = SnapshotTable.read(s, s"$root/centroids")
    SnapshotTable.commit(s, s"$root/lists",
      assignToLists(centroids, batch)
        .repartitionByRange(4, col("cid"), col("vec_id")),
      append = true, bloomCols = Seq("cid"))
  }

  /** Probe-only serving path: no training, centroids read from the
    * stored table, candidates fetched by bloom-pruned `cid IN (probes)`
    * reads of the stored lists.
    */
  def serve(s: SparkSession, dir: String, corpus: DataFrame, queryPred: Column,
            k: Int, nLists: Int, nProbes: Int, lloydIters: Int = 2): DataFrame = {
    val root = ensure(s, dir, corpus, nLists, lloydIters)
    probe(s, root,
      corpus.filter(queryPred)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      k, nProbes)
  }

  /** Serve one batch of queries (q_id, q_emb) from a stored index —
    * the shared probe path for batch serving AND per-micro-batch
    * streaming serving ([[graft.streaming.Streaming.qStreamAnnServe]]).
    * Stateless given the index root, so any number of serving jobs can
    * hit the same stored artifact concurrently.
    */
  def probe(s: SparkSession, root: String, queries: DataFrame,
            k: Int, nProbes: Int): DataFrame = {
    GraftFunctions.register(s)
    val centroids = SnapshotTable.read(s, s"$root/centroids")
    val probes = queries
      .join(broadcast(centroids))
      .select(col("q_id"), col("q_emb"), col("cid"),
        expr("graft_cosine(q_emb, c_emb)").as("c_cos"))
      .groupBy("q_id", "q_emb")
      .agg(expr(s"graft_topk(c_cos, cid, $nProbes)").as("top"))
      .select(col("q_id"), col("q_emb"),
        explode(expr("transform(top, t -> t.id)")).as("cid"))
    // the probed list ids are O(nLists) — collect and push them into
    // the stored table's bloom-skipping read so only the files holding
    // those lists open
    val probedCids = probes.select("cid").distinct()
      .collect().map(_.getLong(0)).sorted
    val lists = SnapshotTable.readWhere(s, s"$root/lists",
      col("cid").isin(probedCids.toIndexedSeq: _*))
    val scored = probes.join(lists, Seq("cid"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", expr("graft_cosine(q_emb, embedding)"))
      .withColumn("neighbor_id", col("vec_id"))
    Ann.explodeTopK(scored, k)
  }
}
