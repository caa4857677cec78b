package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** The COMPOSED pretraining corpus-prep pipeline — the end-to-end run
  * every LLM data team strings together from the pieces this library
  * ships individually: language filter → quality score gate → Gopher
  * rules → exact dedup → deterministic train/valid/test split →
  * token accounting per split. One declarative plan: Catalyst fuses
  * the per-doc scorers into the same scan pass (the quality and
  * Gopher metrics are map-side array ops over one `documents` read),
  * the only shuffles are the Gopher top-word keyed agg, the dedup
  * hash-groupBy, and the final per-split rollup — all linear,
  * partial-agg shapes that hold at 100 TB.
  *
  * Every stage computes the SAME formulas the standalone entries gate
  * (TextAnalysis.quality's score, GopherRules' thresholds,
  * trainSplit's mix64 buckets) but in ONE pass over ONE scan of
  * `documents` — calling the standalone operators would read the
  * corpus once per stage, and at 100 TB four scans where one
  * suffices is the whole game. The composed oracle chains the
  * stages' SQL as CTEs: stage parity is already proven piecewise by
  * the standalone gates, and this entry proves the COMPOSITION —
  * filters and joins don't reorder rows into different dedup winners
  * or split buckets, and the fused single-scan plan computes exactly
  * what the stage-at-a-time run would.
  */
object CorpusPrep {

  private val QualityMin = 0.5
  private val stopwords = Seq("the", "a", "is", "of", "and", "to", "in")

  def corpusPrep(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val toks = filter(split(col("text"), "\\s+"), t => length(t) > lit(0))
    // one scan: tokenization + every per-doc metric as map-side
    // array ops over the same `words` column
    val perDoc = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"), toks.as("words"))
      .withColumn("n_words", size(col("words")).cast("long"))
      .withColumn("n_stop",
        size(filter(col("words"), w => w.isInCollection(stopwords))).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("words"))).cast("long"))
      .withColumn("quality_score",
        least(lit(1.0), col("n_words").cast("double") / lit(100.0)) * lit(0.5)
          + (lit(1.0) - col("n_stop").cast("double") / col("n_words")) * lit(0.3)
          + col("n_distinct").cast("double") / col("n_words") * lit(0.2))
      .withColumn("mean_word_len",
        aggregate(col("words"), lit(0L), (acc, w) => acc + length(w)).cast("double")
          / col("n_words"))
      .withColumn("dup_bigram_frac",
        lit(1.0) - size(array_distinct(transform(
          slice(col("words"), lit(1), size(col("words")) - 1),
          (w, i) => concat(w, lit(" "), element_at(col("words"), i + 2))))).cast("double")
          / (col("n_words") - 1))
    // the one metric that needs a keyed agg: the per-doc top word
    val topWord = perDoc
      .select(col("doc_id"), explode(col("words")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_cnt"))
    val kept = perDoc.join(topWord, "doc_id")
      .filter(col("lang") === "en"
        && col("quality_score") >= QualityMin
        && col("n_words").between(40, 100000)
        && col("mean_word_len").between(3.0, 10.0)
        && (col("n_stop").cast("double") / col("n_words")) >= 0.01
        && (col("top_cnt").cast("double") / col("n_words")) <= 0.125
        && col("dup_bigram_frac") <= 0.75)
      .select(col("doc_id"), col("text"), col("n_words"))
    // exact dedup, first-writer-wins: min doc_id per content hash — a
    // hash-groupBy (map-side partial min), never a per-group window
    val winners = kept.withColumn("h", md5(col("text")))
      .groupBy("h").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    kept.join(winners, "doc_id")
      .withColumn("bucket",
        shiftrightunsigned(expr("graft_mix64(doc_id)"), 7) % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "valid")
          .otherwise("test"))
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("split")
  }

  /** The stage oracles chained as CTEs (quality → gopher → dedup →
    * split), aggregated per split.
    */
  val corpusPrepOracle: String = {
    import graft.functions.{OracleHashSql => H}
    val stop = Seq("the", "a", "is", "of", "and", "to", "in")
      .map(w => s"'$w'").mkString(", ")
    s"""WITH qbase AS (
       | SELECT doc_id,
       |  LEN(LIST_FILTER(regexp_split_to_array(text, '\\s+'), t -> LEN(t) > 0)) AS n_tokens,
       |  LEN(LIST_FILTER(regexp_split_to_array(text, '\\s+'), t -> t IN ($stop))) AS n_stop,
       |  LEN(LIST_DISTINCT(LIST_FILTER(regexp_split_to_array(text, '\\s+'), t -> LEN(t) > 0))) AS n_distinct
       | FROM documents),
       |q AS (
       | SELECT doc_id,
       |  LEAST(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.5
       |   + (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 0.3
       |   + CAST(n_distinct AS DOUBLE) / n_tokens * 0.2 AS quality_score
       | FROM qbase),
       |w AS (
       | SELECT doc_id,
       |  LIST_FILTER(regexp_split_to_array(text, '\\s+'), t -> LEN(t) > 0) AS words
       | FROM documents),
       |gm AS (
       | SELECT doc_id, LEN(words) AS n_words,
       |  CAST(LIST_SUM(LIST_TRANSFORM(words, t -> LEN(t))) AS DOUBLE) / LEN(words) AS mean_word_len,
       |  CAST(LEN(LIST_FILTER(words, t -> t IN ($stop))) AS DOUBLE) / LEN(words) AS stop_frac,
       |  1.0 - CAST(LEN(LIST_DISTINCT(LIST_TRANSFORM(generate_series(1, LEN(words) - 1), i -> words[i] || ' ' || words[i+1]))) AS DOUBLE) / (LEN(words) - 1) AS dup_bigram_frac
       | FROM w),
       |gt AS (
       | SELECT doc_id, MAX(c) AS top_cnt FROM (
       |  SELECT doc_id, COUNT(*) AS c FROM w, UNNEST(words) AS u(word)
       |  GROUP BY doc_id, word) GROUP BY doc_id),
       |g AS (
       | SELECT gm.doc_id,
       |  (n_words BETWEEN 40 AND 100000
       |   AND mean_word_len BETWEEN 3.0 AND 10.0
       |   AND stop_frac >= 0.01
       |   AND CAST(top_cnt AS DOUBLE) / n_words <= 0.125
       |   AND dup_bigram_frac <= 0.75) AS keep
       | FROM gm JOIN gt ON gm.doc_id = gt.doc_id),
       |kept AS (
       | SELECT d.doc_id, d.text FROM documents d
       | JOIN q ON d.doc_id = q.doc_id
       | JOIN g ON d.doc_id = g.doc_id
       | WHERE d.lang = 'en' AND q.quality_score >= $QualityMin AND g.keep),
       |uniq AS (
       | SELECT doc_id, text FROM kept
       | WHERE doc_id IN (SELECT MIN(doc_id) FROM kept GROUP BY md5(text))),
       |ids AS (
       |  SELECT doc_id, CAST(doc_id AS HUGEINT) AS z FROM uniq
       |)${H.mix64Ctes("ids", "m", "u", Seq("doc_id"))}
       |, sp AS (
       |  SELECT doc_id,
       |    CASE WHEN (CAST(u AS UBIGINT) >> 7) % 100 < 80 THEN 'train'
       |         WHEN (CAST(u AS UBIGINT) >> 7) % 100 < 90 THEN 'valid'
       |         ELSE 'test' END AS split
       |  FROM m4)
       |SELECT sp.split, COUNT(*) AS n_docs,
       | CAST(SUM(LEN(LIST_FILTER(regexp_split_to_array(u2.text, '\\s+'), t -> LEN(t) > 0))) AS BIGINT) AS total_tokens,
       | MIN(u2.doc_id) AS first_doc, MAX(u2.doc_id) AS last_doc
       |FROM uniq u2 JOIN sp ON u2.doc_id = sp.doc_id
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("text_corpus_prep", corpusPrep, Some(corpusPrepOracle)))
}
