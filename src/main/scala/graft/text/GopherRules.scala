package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models", table A1 — the standard public pretraining
  * filter set) over the documents table. All per-document and
  * shuffle-free except the top-word rule, which is a keyed
  * (doc_id, word) aggregation — scales linearly, no skew (a doc's
  * words land in one partition group each).
  */
object GopherRules {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private def toks: Column = filter(split(col("text"), "\\s+"), t => length(t) > lit(0))

  private val stopwords = Seq("the", "a", "is", "of", "and", "to", "in")

  // thresholds tuned to the synthetic corpus so the keep flag splits
  // it non-trivially (the rule SHAPES are the Gopher ones; production
  // thresholds are corpus-specific anyway)
  private val MinWords = 40
  private val MaxWords = 100000
  private val MinMeanLen = 3.0
  private val MaxMeanLen = 10.0
  private val MinStopFrac = 0.01
  private val MaxTopWordFrac = 0.125
  private val MaxDupBigramFrac = 0.75

  /** Per-doc rule metrics + keep flag. */
  def gopherRules(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), toks.as("words"))
    val perDoc = base.select(
      col("doc_id"),
      size(col("words")).cast("long").as("n_words"),
      (aggregate(col("words"), lit(0L), (acc, w) => acc + length(w)).cast("double")
        / size(col("words"))).as("mean_word_len"),
      (size(filter(col("words"), w => w.isInCollection(stopwords))).cast("double")
        / size(col("words"))).as("stop_frac"),
      (lit(1.0) - size(array_distinct(transform(
        slice(col("words"), lit(1), size(col("words")) - 1),
        (w, i) => concat(w, lit(" "), element_at(col("words"), i + 2))))).cast("double")
        / (size(col("words")) - 1)).as("dup_bigram_frac"))
    // Gopher "most common word" rule: needs the per-doc mode — a keyed
    // explode+agg, not an array op, so distinct counts never blow the
    // row size.
    val topWord = base
      .select(col("doc_id"), explode(col("words")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_cnt"))
    perDoc.join(topWord, "doc_id")
      .withColumn("top_word_frac", col("top_cnt").cast("double") / col("n_words"))
      .select(
        col("doc_id"), col("n_words"), col("mean_word_len"),
        col("stop_frac"), col("top_word_frac"), col("dup_bigram_frac"),
        (col("n_words").between(MinWords, MaxWords)
          && col("mean_word_len").between(MinMeanLen, MaxMeanLen)
          && col("stop_frac") >= MinStopFrac
          && col("top_word_frac") <= MaxTopWordFrac
          && col("dup_bigram_frac") <= MaxDupBigramFrac).as("keep"))
      .orderBy("doc_id")
  }

  val gopherOracle: String =
    s"""WITH w AS (
       |  SELECT doc_id,
       |    LIST_FILTER(regexp_split_to_array(text, '\\s+'), t -> LEN(t) > 0) AS words
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, words, LEN(words) AS n_words,
       |    CAST(LIST_SUM(LIST_TRANSFORM(words, t -> LEN(t))) AS DOUBLE) / LEN(words) AS mean_word_len,
       |    CAST(LEN(LIST_FILTER(words, t -> t IN ('the','a','is','of','and','to','in'))) AS DOUBLE) / LEN(words) AS stop_frac,
       |    1.0 - CAST(LEN(LIST_DISTINCT(LIST_TRANSFORM(generate_series(1, LEN(words) - 1), i -> words[i] || ' ' || words[i+1]))) AS DOUBLE) / (LEN(words) - 1) AS dup_bigram_frac
       |  FROM w),
       |t AS (
       |  SELECT doc_id, MAX(c) AS top_cnt FROM (
       |    SELECT doc_id, COUNT(*) AS c FROM w, UNNEST(words) AS u(word)
       |    GROUP BY doc_id, word) GROUP BY doc_id)
       |SELECT m.doc_id AS doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len, stop_frac,
       |  CAST(top_cnt AS DOUBLE) / n_words AS top_word_frac, dup_bigram_frac,
       |  (n_words BETWEEN $MinWords AND $MaxWords
       |    AND mean_word_len BETWEEN $MinMeanLen AND $MaxMeanLen
       |    AND stop_frac >= $MinStopFrac
       |    AND CAST(top_cnt AS DOUBLE) / n_words <= $MaxTopWordFrac
       |    AND dup_bigram_frac <= $MaxDupBigramFrac) AS keep
       |FROM m JOIN t ON m.doc_id = t.doc_id
       |ORDER BY doc_id""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("text_gopher_rules", gopherRules, Some(gopherOracle)))
}
