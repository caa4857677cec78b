package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.GraftFunctions
import graft.sources.Tables

/** §2D deduplication over the documents table.
  *
  * Scale architecture (100 TB of documents):
  *  - exact: hash-groupBy on a 128-bit content hash — one shuffle of
  *    (hash, id), never the text.
  *  - MinHash-LSH: ONE pass per doc computes the k=64 signature
  *    (custom expression, no shingle explosion); only
  *    (band, bandKey, doc_id) tuples shuffle — 16 rows/doc. Candidate
  *    pairs join back to text for exact-Jaccard verification, so the
  *    quadratic step touches candidates only.
  *  - SimHash: 64-bit signature per doc; 4×16-bit band exact-match
  *    generates candidates; popcount(xor) verifies Hamming ≤ 3.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // ---------------------------------------------------------------
  /** Exact dedup by content hash: every doc gets its group size and a
    * canonical keep flag (min doc_id wins).
    */
  def exact(s: SparkSession, dir: String): DataFrame = {
    val hashed = docs(s, dir).select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
    val w = Window.partitionBy("h")
    hashed
      .withColumn("dup_count", count(lit(1)).over(w))
      .withColumn("keep", col("doc_id") === min("doc_id").over(w))
      .orderBy("doc_id")
  }

  val exactOracle: String =
    """SELECT doc_id, h,
      | COUNT(*) OVER (PARTITION BY h) AS dup_count,
      | (doc_id = MIN(doc_id) OVER (PARTITION BY h)) AS keep
      |FROM (SELECT doc_id, MD5(text) AS h FROM documents) t
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** (band, bandKey, doc_id) tuples: 16 bands × 4 rows over the k=64
    * MinHash signature.
    */
  private def minhashBands(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    docs(s, dir)
      .select(col("doc_id"), expr("graft_minhash(text, 64, 3)").as("sig"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 15), b -> xxhash64(slice(sig, b*4+1, 4)))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
  }

  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val d = docs(s, dir).select("doc_id", "text")
    val bands = minhashBands(s, dir)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val verified = cand
      .join(d.select(col("doc_id").as("id_a"), col("text").as("text_a")), Seq("id_a"))
      .join(d.select(col("doc_id").as("id_b"), col("text").as("text_b")), Seq("id_b"))
      .withColumn("jaccard", expr("graft_ngram_jaccard(text_a, text_b, 3)"))
      .filter(col("jaccard") >= 0.8)
      .select("id_a", "id_b")
    // rep(doc) = smallest partner seen; docs without a dup partner rep themselves
    val reps = verified.groupBy(col("id_b").as("doc_id")).agg(min("id_a").as("rep_cand"))
    d.select("doc_id").join(reps, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("rep_cand"), col("doc_id")).as("rep_id"),
        coalesce(col("rep_cand") =!= col("doc_id"), lit(false)).as("is_dup"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------
  def simhash(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val sigs = docs(s, dir).select(col("doc_id"), expr("graft_simhash(text)").as("sig"))
    val bands = sigs.select(col("doc_id"), col("sig"), posexplode(expr(
      "transform(sequence(0, 3), b -> (sig >> (b * 16)) & 65535)")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("a.sig").as("sig_a"),
        col("b.doc_id").as("id_b"), col("b.sig").as("sig_b"))
      .distinct()
      .filter(expr("bit_count(sig_a ^ sig_b) <= 3"))
    val reps = cand.groupBy(col("id_b").as("doc_id")).agg(min("id_a").as("rep_cand"))
    sigs.join(reps, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("sig").as("simhash"),
        coalesce(col("rep_cand"), col("doc_id")).as("rep_id"),
        coalesce(col("rep_cand") =!= col("doc_id"), lit(false)).as("is_dup"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------
  /** Exact n-gram Jaccard on a linear pair set (adjacent doc ids) —
    * exercises the verifier independently of LSH candidate recall.
    */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val d = docs(s, dir).select("doc_id", "text")
    d.as("a").join(d.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select(
        col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("graft_ngram_jaccard(a.text, b.text, 3)").as("jaccard3"),
        expr("graft_ngram_jaccard(a.text, b.text, 1)").as("jaccard1"))
      .orderBy("id_a")
  }

  // ---------------------------------------------------------------
  /** Embedding near-dup: each vector's nearest neighbor by cosine
    * (codegen'd custom expression), flagged against a threshold.
    * DuckDB oracle recomputes the cosine with the same sequential
    * double-precision fold.
    */
  def embedding(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
    val pairs = e.as("a").join(broadcast(e.as("b")), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nn_id"),
        expr("graft_cosine(a.embedding, b.embedding)").as("cos"))
    // top-1 via the bounded aggregate: partial agg keeps one candidate
    // per partition per vector - no window sort of the N² pair set
    pairs
      .groupBy("vec_id")
      .agg(expr("graft_topk(cos, nn_id, 1)").as("top"))
      .select(col("vec_id"), col("top")(0).getField("id").as("nn_id"),
        round(col("top")(0).getField("score"), 6).as("cos"),
        (round(col("top")(0).getField("score"), 6) >= 0.45).as("near_dup"))
      .orderBy("vec_id")
  }

  val embeddingOracle: String =
    """WITH pairs AS (
      | SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
      |  list_sum(list_transform(range(1, LEN(a.embedding) + 1),
      |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |  / (sqrt(list_sum(list_transform(range(1, LEN(a.embedding) + 1),
      |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
      |   * sqrt(list_sum(list_transform(range(1, LEN(b.embedding) + 1),
      |    i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))) AS cos
      | FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id)
      |SELECT vec_id, nn_id, ROUND(cos, 6) AS cos, (ROUND(cos, 6) >= 0.45) AS near_dup
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, nn_id) AS rn FROM pairs) t
      |WHERE rn = 1 ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------
  /** The full dedup product in one call: MinHash-LSH candidates →
    * exact-Jaccard verification → connected components → keep the
    * smallest doc_id per cluster. Returns every doc with its cluster
    * and keep decision — `filter(col("kept"))` IS the deduped corpus.
    */
  def dedupCorpus(s: SparkSession, docs: DataFrame, jaccardThreshold: Double = 0.8): DataFrame = {
    GraftFunctions.register(s)
    val d = docs.select("doc_id", "text")
    val bands = d
      .select(col("doc_id"), expr("graft_minhash(text, 64, 3)").as("sig"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 15), b -> xxhash64(slice(sig, b*4+1, 4)))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val edges = cand
      .join(d.select(col("doc_id").as("id_a"), col("text").as("text_a")), Seq("id_a"))
      .join(d.select(col("doc_id").as("id_b"), col("text").as("text_b")), Seq("id_b"))
      .filter(expr(s"graft_ngram_jaccard(text_a, text_b, 3) >= $jaccardThreshold"))
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val comps = ConnectedComponents.run(edges, d.select(col("doc_id").as("id")))
    comps
      .withColumn("kept", col("id") === col("component"))
      .select(col("id").as("doc_id"), col("component"), col("kept"))
  }

  /** Rows-only query over the pipeline: per-doc cluster + keep flag. */
  def dedupPipeline(s: SparkSession, dir: String): DataFrame =
    dedupCorpus(s, docs(s, dir)).orderBy("doc_id")

  // ---------------------------------------------------------------
  /** Embedding clustering: 1-NN graph → connected components → one
    * cluster label per vector (the "pick a canonical doc per near-dup
    * cluster" step). Approximate graph → rows-only.
    */
  def ccClusters(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
    val pairs = e.as("a").join(broadcast(e.as("b")), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nn_id"),
        expr("graft_cosine(a.embedding, b.embedding)").as("cos"))
      .groupBy("vec_id")
      .agg(expr("graft_topk(cos, nn_id, 1)").as("top"))
      .select(col("vec_id").as("src"), col("top")(0).getField("id").as("dst"))
    val labels = ConnectedComponents.run(
      pairs, e.select(col("vec_id").as("id")), maxIter = 8)
    val sizes = labels.groupBy("component").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("component"))
      .select(col("id").as("vec_id"), col("component"), col("cluster_size"))
      .orderBy("vec_id")
  }

  // ---------------------------------------------------------------
  val queries: Seq[Q] = Seq(
    Q("dedup_pipeline", dedupPipeline, None),
    Q("dedup_cc_clusters", ccClusters, None),
    Q("dedup_exact", exact, Some(exactOracle)),
    Q("dedup_minhash_lsh", minhashLsh, None),
    Q("dedup_simhash", simhash, None),
    Q("dedup_ngram_jaccard", ngramJaccard, None),
    Q("dedup_embedding", embedding, Some(embeddingOracle)))
}
