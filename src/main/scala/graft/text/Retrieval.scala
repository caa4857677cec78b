package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** Sparse text retrieval over the `documents` corpus: BM25 ranking —
  * the lexical-search half of a training-data pipeline (quality
  * filtering by query relevance, dedup-adjacent nearest-text lookup,
  * eval-set contamination checks all start here).
  *
  * Scale shape: tokenize→explode is map-side; term frequencies are
  * ONE shuffle on (doc_id, term); document lengths one on doc_id.
  * Query-term document frequencies filter BEFORE aggregating (|Q|
  * terms survive, not |vocab|) and broadcast back, as does the 1-row
  * corpus-stats frame — no vocabulary-sized shuffle ever forms.
  *
  * Determinism for the oracle gate: each per-term partial score is a
  * pure scalar expression (IEEE-identical in any engine) quantized to
  * integer micro-units; the per-doc SUM is then exact, so parallel
  * summation order cannot wiggle the hash (same trick as
  * OracleSafe.sumMoney).
  */
object Retrieval {

  private val QueryTerms = Seq("spark", "query", "join")
  private val TopK = 20

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  def bm25Search(s: SparkSession, dir: String): DataFrame = {
    val toksCol = filter(split(col("text"), "\\s+"), t => length(t) > lit(0))
    val docToks = docs(s, dir).select(col("doc_id"), explode(toksCol).as("term"))
    val tf = docToks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = docToks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"),
      count(lit(1)).as("n_docs"))
    val tfq = tf.filter(col("term").isin(QueryTerms: _*))
    val dfq = tfq.groupBy("term").agg(count(lit(1)).as("df"))
    // textual formula kept identical to the oracle SQL so the IEEE
    // evaluation order matches term-for-term
    val idf = log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val partTerm = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + (lit(0.75) * col("dl")) / col("avgdl")))
    tfq
      .join(broadcast(dfq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("micro", round(idf * partTerm * lit(1000000)).cast("long"))
      .groupBy("doc_id")
      .agg((sum(col("micro")).cast("double") / lit(1000000.0)).as("bm25"),
        count(lit(1)).as("n_matched"))
      .orderBy(desc("bm25"), col("doc_id"))
      .limit(TopK)
  }

  val bm25SearchOracle: String = {
    val in = QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(LIST_FILTER(regexp_split_to_array(text, '\\s+'), t -> LEN(t) > 0)) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
       |stats AS (SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
       |  COUNT(*) AS n_docs FROM dl),
       |dfq AS (SELECT term, COUNT(*) AS df FROM tf WHERE term IN ($in) GROUP BY 1),
       |scored AS (
       |  SELECT tf.doc_id,
       |   CAST(ROUND(LN(1 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) *
       |     ((tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + (0.75 * dl.dl) / stats.avgdl))) * 1000000) AS BIGINT) AS micro
       |  FROM tf JOIN dfq ON tf.term = dfq.term
       |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
       |  WHERE tf.term IN ($in))
       |SELECT doc_id, CAST(SUM(micro) AS DOUBLE) / 1000000.0 AS bm25, COUNT(*) AS n_matched
       |FROM scored GROUP BY 1 ORDER BY bm25 DESC, doc_id LIMIT $TopK""".stripMargin
  }

  // ---------------------------------------------------------------
  /** TF-IDF top terms per source: which words characterize each
    * source bucket. Classic ltc weighting on the (source, term)
    * matrix; same exact-integer quantization before ranking.
    */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val toksCol = filter(split(col("text"), "\\s+"), t => length(t) > lit(0))
    val srcToks = docs(s, dir).select(col("source"), explode(toksCol).as("term"))
    val tf = srcToks.groupBy("source", "term").agg(count(lit(1)).as("tf"))
    val nSrc = tf.select("source").distinct().count() // tiny (handful of sources)
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // top-5 per source via the partial-aggregable graft_topk_str: map
    // tasks forward ≤5 (score, term) pairs per source — a row_number
    // window would shuffle AND sort the whole (source, term) matrix.
    // micro scores are integers (exact as doubles to 2^53), so the
    // ranking ties break identically to the oracle's (micro, term).
    tf.join(dfT, "term")
      .withColumn("micro",
        round((lit(1) + log(col("tf"))) * log(lit(nSrc.toDouble) / col("df")) * lit(1000000))
          .cast("double"))
      .groupBy("source")
      .agg(expr("graft_topk_str(micro, term, 5)").as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), col("col.tag").as("term"),
        (col("col.score") / lit(1000000.0)).as("tfidf"),
        (col("pos") + 1).cast("long").as("rn"))
      .orderBy("source", "rn")
  }

  val tfidfTopTermsOracle: String =
    """WITH toks AS (
      |  SELECT source, unnest(LIST_FILTER(regexp_split_to_array(text, '\s+'), t -> LEN(t) > 0)) AS term
      |  FROM documents),
      |tf AS (SELECT source, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |n AS (SELECT COUNT(DISTINCT source) AS n_src FROM tf),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT source, tf.term,
      |   CAST(ROUND((1 + LN(tf.tf)) * LN(CAST(n.n_src AS DOUBLE) / df.df) * 1000000) AS BIGINT) AS micro
      |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
      |ranked AS (
      |  SELECT source, term, micro,
      |   ROW_NUMBER() OVER (PARTITION BY source ORDER BY micro DESC, term) AS rn
      |  FROM scored)
      |SELECT source, term, CAST(micro AS DOUBLE) / 1000000.0 AS tfidf, rn
      |FROM ranked WHERE rn <= 5 ORDER BY source, rn""".stripMargin

  // ---------------------------------------------------------------
  /** Eval-set decontamination: flag training documents sharing any
    * 5-gram with the held-out eval slice (doc_id % 10 == 0 plays the
    * eval set). Catches the corpus's planted near-duplicates of eval
    * docs — the leakage a benchmark score silently absorbs. Scale
    * shape: the eval gram set is small by nature (eval sets are
    * thousands of docs, not billions) → distinct + broadcast; the
    * training side streams one exploded-gram pass, no gram×gram
    * shuffle.
    */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    val n = 5
    val toksCol = filter(split(col("text"), "\\s+"), t => length(t) > lit(0))
    val grams = docs(s, dir)
      .select(col("doc_id"), toksCol.as("ts"))
      .filter(size(col("ts")) >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("ts")) - (n - 1)),
          i => concat_ws(" ", slice(col("ts"), i, lit(n))))).as("g"))
    val evalG = grams.filter(col("doc_id") % 10 === 0).select("g").distinct()
    grams.filter(col("doc_id") % 10 =!= 0)
      .join(broadcast(evalG), "g")
      .groupBy("doc_id")
      .agg(countDistinct(col("g")).as("n_shared"))
      .orderBy(desc("n_shared"), col("doc_id"))
      .limit(50)
  }

  val contaminationOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, LIST_FILTER(regexp_split_to_array(text, '\s+'), t -> LEN(t) > 0) AS ts
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, array_to_string(ts[i:i+4], ' ') AS g
      |  FROM toks, UNNEST(generate_series(1, LEN(ts) - 4)) AS t(i)
      |  WHERE LEN(ts) >= 5),
      |eval_g AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0)
      |SELECT grams.doc_id, CAST(COUNT(DISTINCT grams.g) AS BIGINT) AS n_shared
      |FROM grams JOIN eval_g ON grams.g = eval_g.g
      |WHERE grams.doc_id % 10 <> 0
      |GROUP BY 1 ORDER BY n_shared DESC, doc_id LIMIT 50""".stripMargin

  // ---------------------------------------------------------------
  /** Hybrid retrieval: lexical BM25 and dense-cosine rankings fused by
    * Reciprocal Rank Fusion (RRF, Cormack et al.) — the standard
    * sparse+dense combination a retrieval-augmented pipeline runs.
    * Both rankings are micro-quantized with pinned tie-breaks, and the
    * fusion weights 1/(60+rank) are rounded to exact integer
    * micro-units, so the whole hybrid ranking is hash-gated.
    *
    * Scale shape: the lexical side is [[bm25Search]]'s shuffle-lean
    * plan; the dense side broadcasts ONE query vector over a corpus
    * scan (codegen'd cosine) with a bounded TakeOrdered top-k; the
    * fusion joins two ≤[[FuseDepth]]-row frames — constant-size work
    * regardless of corpus size.
    */
  private val RrfK = 60
  private val FuseDepth = 20
  private val HybridTopK = 10

  def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    // ranks computed over the ALREADY top-FuseDepth frames: the
    // single-partition window is k-sized by construction
    val lex = bm25Search(s, dir)
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(desc("bm25"), col("doc_id"))))
      .select(col("doc_id"), col("lex_rank"))
    val e = Tables.load(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val dense = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .withColumn("cos_micro",
        round(expr("graft_cosine(embedding, q_emb)") * lit(1000000)).cast("long"))
      .orderBy(desc("cos_micro"), col("vec_id")).limit(FuseDepth)
      .withColumn("dense_rank",
        row_number().over(Window.orderBy(desc("cos_micro"), col("vec_id"))))
      .select(col("vec_id").as("doc_id"), col("dense_rank"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(round(lit(1000000.0) / (lit(RrfK) + col("lex_rank"))).cast("long"), lit(0L)) +
          coalesce(round(lit(1000000.0) / (lit(RrfK) + col("dense_rank"))).cast("long"), lit(0L)))
      .select(col("doc_id"), col("rrf_micro"),
        col("lex_rank").isNotNull.as("in_lexical"),
        col("dense_rank").isNotNull.as("in_dense"))
      .orderBy(desc("rrf_micro"), col("doc_id")).limit(HybridTopK)
  }

  val hybridRrfOracle: String = {
    val in = QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(LIST_FILTER(regexp_split_to_array(text, '\\s+'), t -> LEN(t) > 0)) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
       |stats AS (SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
       |  COUNT(*) AS n_docs FROM dl),
       |dfq AS (SELECT term, COUNT(*) AS df FROM tf WHERE term IN ($in) GROUP BY 1),
       |scored AS (
       |  SELECT tf.doc_id,
       |   CAST(ROUND(LN(1 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) *
       |     ((tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + (0.75 * dl.dl) / stats.avgdl))) * 1000000) AS BIGINT) AS micro
       |  FROM tf JOIN dfq ON tf.term = dfq.term
       |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
       |  WHERE tf.term IN ($in)),
       |bm AS (SELECT doc_id, CAST(SUM(micro) AS DOUBLE) / 1000000.0 AS bm25
       |  FROM scored GROUP BY 1 ORDER BY bm25 DESC, doc_id LIMIT $FuseDepth),
       |lex AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank FROM bm),
       |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
       |cosd AS (
       |  SELECT e.vec_id AS doc_id,
       |    CAST(ROUND(
       |      list_sum(list_transform(range(1, LEN(e.embedding) + 1),
       |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.q_emb[i] AS DOUBLE)))
       |      / (sqrt(list_sum(list_transform(range(1, LEN(e.embedding) + 1),
       |          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
       |       * sqrt(list_sum(list_transform(range(1, LEN(qv.q_emb) + 1),
       |          i -> CAST(qv.q_emb[i] AS DOUBLE) * CAST(qv.q_emb[i] AS DOUBLE)))))
       |      * 1000000) AS BIGINT) AS cos_micro
       |  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0),
       |densetop AS (SELECT doc_id, cos_micro FROM cosd
       |  ORDER BY cos_micro DESC, doc_id LIMIT $FuseDepth),
       |dense AS (SELECT doc_id,
       |  ROW_NUMBER() OVER (ORDER BY cos_micro DESC, doc_id) AS dense_rank FROM densetop),
       |fused AS (
       |  SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
       |    COALESCE(CAST(ROUND(1000000.0 / ($RrfK + l.lex_rank)) AS BIGINT), 0)
       |      + COALESCE(CAST(ROUND(1000000.0 / ($RrfK + d.dense_rank)) AS BIGINT), 0) AS rrf_micro,
       |    l.lex_rank IS NOT NULL AS in_lexical,
       |    d.dense_rank IS NOT NULL AS in_dense
       |  FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id)
       |SELECT doc_id, rrf_micro, in_lexical, in_dense
       |FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT $HybridTopK""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("text_bm25_search", bm25Search, Some(bm25SearchOracle)),
    Q("text_tfidf_topterms", tfidfTopTerms, Some(tfidfTopTermsOracle)),
    Q("text_contamination", contamination, Some(contaminationOracle)),
    Q("text_hybrid_rrf", hybridRrf, Some(hybridRrfOracle)))
}
