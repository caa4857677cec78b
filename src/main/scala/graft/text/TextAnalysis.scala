package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.GraftFunctions
import graft.sources.Tables

/** §2C text analysis over the documents table — the per-document
  * scoring layer of an LLM training-data pipeline. Everything here is
  * embarrassingly parallel (no shuffle except the final presentation
  * sort): token metrics stay codegen'd built-ins; only the rolling
  * fingerprint needs a custom expression.
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private def toks: Column = filter(split(col("text"), "\\s+"), t => length(t) > lit(0))

  // ---------------------------------------------------------------
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      length(regexp_replace(col("text"), "\\s", "")).cast("long").as("n_token_chars"),
      (length(regexp_replace(col("text"), "\\s", "")).cast("double") / size(toks)).as("avg_token_len"))
      .orderBy("doc_id")

  val tokenCountOracle: String =
    """SELECT doc_id,
      | LEN(LIST_FILTER(regexp_split_to_array(text, '\s+'), t -> LEN(t) > 0)) AS n_tokens,
      | LENGTH(regexp_replace(text, '\s', '', 'g')) AS n_token_chars,
      | CAST(LENGTH(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
      |   / LEN(LIST_FILTER(regexp_split_to_array(text, '\s+'), t -> LEN(t) > 0)) AS avg_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  private val stopwords = Seq("the", "a", "is", "of", "and", "to", "in")

  def quality(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(filter(toks, t => t.isInCollection(stopwords))).cast("long").as("n_stop"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      length(regexp_replace(col("text"), "[a-z0-9\\s]", "")).cast("long").as("n_punct"),
      length(col("text")).cast("long").as("n_chars"))
    base.select(
      col("doc_id"), col("n_tokens"),
      (col("n_stop").cast("double") / col("n_tokens")).as("stopword_ratio"),
      (col("n_distinct").cast("double") / col("n_tokens")).as("diversity"),
      (col("n_punct").cast("double") / col("n_chars")).as("punct_ratio"),
      (least(lit(1.0), col("n_tokens").cast("double") / lit(100.0)) * lit(0.5)
        + (lit(1.0) - col("n_stop").cast("double") / col("n_tokens")) * lit(0.3)
        + col("n_distinct").cast("double") / col("n_tokens") * lit(0.2)).as("quality_score"))
      .orderBy("doc_id")
  }

  val qualityOracle: String = {
    val in = stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH base AS (
       | SELECT doc_id,
       |  LEN(LIST_FILTER(regexp_split_to_array(text, '\\s+'), t -> LEN(t) > 0)) AS n_tokens,
       |  LEN(LIST_FILTER(regexp_split_to_array(text, '\\s+'), t -> t IN ($in))) AS n_stop,
       |  LEN(LIST_DISTINCT(LIST_FILTER(regexp_split_to_array(text, '\\s+'), t -> LEN(t) > 0))) AS n_distinct,
       |  LENGTH(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS n_punct,
       |  LENGTH(text) AS n_chars
       | FROM documents)
       |SELECT doc_id, n_tokens,
       | CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
       | CAST(n_distinct AS DOUBLE) / n_tokens AS diversity,
       | CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
       | LEAST(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.5
       |  + (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 0.3
       |  + CAST(n_distinct AS DOUBLE) / n_tokens * 0.2 AS quality_score
       |FROM base ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  private val langSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "et", "les", "est", "dans"))

  /** Shared CASE (same SQL text runs in Spark and DuckDB). */
  private val predCase: String =
    """CASE WHEN zh_n > 0 THEN 'zh'
      | WHEN en_n >= de_n AND en_n >= es_n AND en_n >= fr_n AND en_n > 0 THEN 'en'
      | WHEN de_n >= es_n AND de_n >= fr_n AND de_n > 0 THEN 'de'
      | WHEN es_n >= fr_n AND es_n > 0 THEN 'es'
      | WHEN fr_n > 0 THEN 'fr'
      | ELSE 'und' END""".stripMargin

  def langId(s: SparkSession, dir: String): DataFrame = {
    val withCounts = langSets.foldLeft(docs(s, dir).toDF()) { case (df, (code, words)) =>
      df.withColumn(s"${code}_n", size(filter(toks, t => t.isInCollection(words))))
    }.withColumn("zh_n", length(regexp_replace(col("text"), "[^\\x{4e00}-\\x{9fff}]", "")))
    withCounts
      .withColumn("predicted", expr(predCase))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  val langIdOracle: String = {
    val countCols = langSets.map { case (code, words) =>
      val in = words.map(w => s"'$w'").mkString(", ")
      s"LEN(LIST_FILTER(regexp_split_to_array(text, '\\s+'), t -> t IN ($in))) AS ${code}_n"
    }.mkString(",\n  ")
    s"""WITH counts AS (
       | SELECT lang,
       |  $countCols,
       |  LENGTH(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS zh_n
       | FROM documents)
       |SELECT lang, $predCase AS predicted, COUNT(*) AS n
       |FROM counts GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // ---------------------------------------------------------------
  /** Rolling-hash winnowing fingerprint (custom Expression,
    * [[graft.functions.RollingFingerprint]]): min splitmix64 of all
    * byte 8-gram FNV-prime polynomial window hashes. Fully oracled:
    * the DuckDB SQL below re-derives every window hash from the UTF-8
    * bytes with HUGEINT modular arithmetic — the two 64-bit finalizer
    * multiplications split into 32-bit halves to stay inside HUGEINT —
    * so the custom expression's exact Long output is hash-gated, not
    * just rows-counted. (Simhash, the other custom hash, is oracled
    * structurally via dedup_simhash's planted-pair gates.)
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    docs(s, dir).select(
      col("doc_id"),
      expr("graft_fingerprint(text, 8)").as("fingerprint"))
      .orderBy("doc_id")
  }

  val fingerprintOracle: String = {
    import graft.functions.{OracleHashSql => H}
    s"""WITH raw AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |         CAST(octet_length(encode(text)) AS INT) AS n
       |  FROM documents
       |), byts AS (
       |  SELECT doc_id, n, ${H.bytesList("hx", "n")} AS bs
       |  FROM raw
       |), wins0 AS (
       |  SELECT doc_id, n, bs,
       |    CAST(UNNEST(range(0, GREATEST(n-8, 0)+1)) AS INT) AS j
       |  FROM byts
       |), wins AS (
       |  SELECT doc_id,
       |    CASE WHEN n <= 8 THEN ${H.fnvFold("bs")}
       |    ELSE ${H.polyFold("bs[j+1 : j+8]")}
       |    END AS z
       |  FROM wins0
       |)${H.mix64Ctes("wins", "s", "m", Seq("doc_id"))}
       |, fp AS (
       |  SELECT doc_id, MIN(m) AS u FROM s4 GROUP BY doc_id
       |)
       |SELECT doc_id, ${H.toSigned("u")} AS fingerprint
       |FROM fp ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  /** Deterministic stratified sampling for training-mix construction:
    * per-language keep-rates applied via pure integer hashing of
    * doc_id — no RNG, identical on any cluster and in the oracle, and
    * the sample is stable under re-runs/retries (a hard requirement
    * for reproducible training data).
    */
  private val mixRates = Seq("en" -> 20, "de" -> 50, "es" -> 50, "fr" -> 50, "zh" -> 80)

  def sampling(s: SparkSession, dir: String): DataFrame = {
    val rate = mixRates.foldLeft(lit(0)) { case (acc, (l, r)) =>
      when(col("lang") === l, r).otherwise(acc)
    }
    docs(s, dir)
      .withColumn("bucket", (col("doc_id") * 1103 + 7) % 100)
      .withColumn("sampled", col("bucket") < rate)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("sampled"), 1)).as("n_sampled"),
        sum(when(col("sampled"), col("n_chars"))).cast("long").as("sampled_chars"))
      .orderBy("lang")
  }

  val samplingOracle: String = {
    val rateCase = "CASE lang " +
      mixRates.map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ") + " ELSE 0 END"
    s"""SELECT lang, COUNT(*) AS n_total,
       | COUNT(CASE WHEN (doc_id * 1103 + 7) % 100 < $rateCase THEN 1 END) AS n_sampled,
       | CAST(SUM(CASE WHEN (doc_id * 1103 + 7) % 100 < $rateCase THEN n_chars END) AS BIGINT) AS sampled_chars
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------
  /** PII-style scrubbing: mask numeric tokens in the semi-structured
    * props column (the shape of phone/SSN/account redaction in a
    * training-data pipeline — codegen'd regexp_replace, no UDF) and
    * account for what was removed.
    */
  def redact(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("event_type"), col("props"),
        regexp_replace(col("props"), "[0-9]+", "#").as("redacted"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        count(when(col("redacted") =!= col("props"), 1)).as("n_changed"),
        sum(length(col("props")) - length(col("redacted"))).cast("long").as("chars_removed"))
      .orderBy("event_type")

  val redactOracle: String =
    """SELECT event_type, COUNT(*) AS n,
      | COUNT(CASE WHEN regexp_replace(props, '[0-9]+', '#', 'g') <> props THEN 1 END) AS n_changed,
      | CAST(SUM(LENGTH(props) - LENGTH(regexp_replace(props, '[0-9]+', '#', 'g'))) AS BIGINT) AS chars_removed
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1: "fraction
    * of duplicate n-grams / most-common-word share") — the filters
    * that kill boilerplate and spam before training. Word-level stats
    * need the per-(doc, word) counts, so one explode + two partial
    * aggregations keyed by doc_id; bigram duplication stays inside the
    * row (zip_with + array_distinct, codegen'd, no shuffle at all).
    * All ratios are exact-integer divisions done in the same IEEE
    * order on both engines.
    */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    val perWord = docs(s, dir)
      .select(col("doc_id"), explode(toks).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
    val wordStats = perWord.groupBy("doc_id").agg(
      sum("c").as("n_words"),
      count(lit(1)).as("n_distinct"),
      max("c").as("top_c"))
    val bigrams = docs(s, dir).select(
      col("doc_id"),
      zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)).as("bs"))
      .select(col("doc_id"),
        size(col("bs")).cast("long").as("n_bigrams"),
        size(array_distinct(col("bs"))).cast("long").as("n_distinct_bigrams"))
    wordStats.join(bigrams, "doc_id")
      .select(
        col("doc_id"),
        col("n_words"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_words"), 6)
          .as("dup_word_ratio"),
        round(col("top_c").cast("double") / col("n_words"), 6).as("top_word_ratio"),
        when(col("n_bigrams") > 0,
          round(lit(1.0) - col("n_distinct_bigrams").cast("double") / col("n_bigrams"), 6))
          .as("dup_bigram_ratio"))
      .orderBy("doc_id")
  }

  val repetitionOracle: String =
    """WITH ws AS (
      |  SELECT doc_id, LIST_FILTER(regexp_split_to_array(text, '\s+'), t -> LEN(t) > 0) AS ws
      |  FROM documents),
      |pw AS (
      |  SELECT doc_id, w AS word, COUNT(*) AS c
      |  FROM (SELECT doc_id, UNNEST(ws) AS w FROM ws) GROUP BY 1, 2),
      |wstats AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
      |         CAST(COUNT(*) AS BIGINT) AS n_distinct, MAX(c) AS top_c
      |  FROM pw GROUP BY 1),
      |bg AS (
      |  SELECT doc_id,
      |   CAST(LEN(ws) - 1 AS BIGINT) AS n_bigrams,
      |   CAST(LEN(list_distinct(list_transform(range(1, LEN(ws)), i -> ws[i] || ' ' || ws[i + 1]))) AS BIGINT) AS n_distinct_bigrams
      |  FROM ws)
      |SELECT w.doc_id, w.n_words,
      | ROUND(1.0 - CAST(w.n_distinct AS DOUBLE) / w.n_words, 6) AS dup_word_ratio,
      | ROUND(CAST(w.top_c AS DOUBLE) / w.n_words, 6) AS top_word_ratio,
      | CASE WHEN b.n_bigrams > 0
      |  THEN ROUND(1.0 - CAST(b.n_distinct_bigrams AS DOUBLE) / b.n_bigrams, 6) END AS dup_bigram_ratio
      |FROM wstats w JOIN bg b ON w.doc_id = b.doc_id
      |ORDER BY w.doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** Corpus-level top-20 bigrams — the n-gram frequency sweep behind
    * contamination screens and n-gram LM stats. Explode is linear in
    * corpus tokens; the count is a partial-agg groupBy keyed by gram
    * (no skew beyond natural Zipf, which AQE handles); the top-k
    * compiles to TakeOrderedAndProject (per-partition heap + driver
    * merge of 20), never a global sort. Total order (n DESC, gram) so
    * the cut is deterministic under ties.
    */
  def ngramFreq(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("gram"))
      .limit(20)

  val ngramFreqOracle: String =
    """WITH ws AS (
      |  SELECT LIST_FILTER(regexp_split_to_array(text, '\s+'), t -> LEN(t) > 0) AS ws
      |  FROM documents),
      |bg AS (
      |  SELECT UNNEST(list_transform(range(1, LEN(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS gram
      |  FROM ws)
      |SELECT gram, COUNT(*) AS n FROM bg GROUP BY 1
      |ORDER BY n DESC, gram LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  // ---------------------------------------------------------------
  /** Deterministic stratified train/valid/test split (80/10/10) via
    * pure integer hashing of doc_id — no RNG, no sampling state:
    * identical on any cluster, in the oracle, and under re-runs or
    * retries (a reproducible split is a hard requirement for training
    * data, and "which split was this doc in for run X" must be
    * answerable from the doc id alone). splitmix64 decorrelates the
    * bucket from dense id order; the top-shifted value mod 100 keeps
    * the arithmetic in non-negative signed range so Spark and DuckDB
    * agree without unsigned-mod gymnastics.
    */
  def trainSplit(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val bucket = shiftrightunsigned(expr("graft_mix64(doc_id)"), 7) % 100
    docs(s, dir).select(
      col("doc_id"), col("lang"),
      when(bucket < 80, "train").when(bucket < 90, "valid")
        .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  val trainSplitOracle: String = {
    import graft.functions.{OracleHashSql => H}
    s"""WITH ids AS (
       |  SELECT doc_id, lang, CAST(doc_id AS HUGEINT) AS z FROM documents
       |)${H.mix64Ctes("ids", "m", "u", Seq("doc_id", "lang"))}
       |, bucketed AS (
       |  SELECT doc_id, lang,
       |    (CAST(u AS UBIGINT) >> 7) % 100 AS bucket
       |  FROM m4
       |)
       |SELECT doc_id, lang,
       |  CASE WHEN bucket < 80 THEN 'train'
       |       WHEN bucket < 90 THEN 'valid'
       |       ELSE 'test' END AS split
       |FROM bucketed ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  /** Sliding-window document chunking (size 64 tokens, stride 48 —
    * 16-token overlap): the context-window preparation step between
    * raw documents and sequence packing. Emits one row per chunk with
    * its token count and boundary tokens as content witnesses; the
    * whole explode is map-side (no shuffle before the presentation
    * sort).
    */
  private val ChunkSize = 64
  private val ChunkStride = 48

  def chunkWindows(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), toks.as("tl"))
      .filter(size(col("tl")) > 0)
      .select(col("doc_id"), col("tl"),
        posexplode(expr(
          s"transform(sequence(0, greatest(size(tl) - $ChunkSize + $ChunkStride - 1, 0) div $ChunkStride), " +
            s"c -> slice(tl, c * $ChunkStride + 1, $ChunkSize))")))
      .filter(size(col("col")) > 0)
      .select(
        col("doc_id"), col("pos").cast("long").as("chunk_id"),
        size(col("col")).cast("long").as("n_tokens"),
        element_at(col("col"), 1).as("first_tok"),
        element_at(col("col"), -1).as("last_tok"))
      .orderBy("doc_id", "chunk_id")

  val chunkWindowsOracle: String =
    s"""WITH toksl AS (
       |  SELECT doc_id, LIST_FILTER(regexp_split_to_array(text, '\\s+'), t -> LEN(t) > 0) AS tl
       |  FROM documents
       |), chunks0 AS (
       |  SELECT doc_id, tl,
       |    CAST(UNNEST(range(0, GREATEST((LEN(tl) - $ChunkSize + $ChunkStride - 1) // $ChunkStride, 0) + 1)) AS INT) AS c
       |  FROM toksl WHERE LEN(tl) > 0
       |), chunks AS (
       |  SELECT doc_id, c AS chunk_id,
       |    tl[c * $ChunkStride + 1 : c * $ChunkStride + $ChunkSize] AS w
       |  FROM chunks0
       |)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |  CAST(LEN(w) AS BIGINT) AS n_tokens,
       |  w[1] AS first_tok, w[LEN(w)] AS last_tok
       |FROM chunks WHERE LEN(w) > 0
       |ORDER BY doc_id, chunk_id""".stripMargin

  // ---------------------------------------------------------------
  /** Corpus-self unigram language-model score (the CCNet / RedPajama
    * "perplexity bucket" quality signal, with the LM induced from the
    * corpus itself): every token's negative log-probability under the
    * corpus unigram distribution, averaged per document — boilerplate
    * and keyword-stuffed docs score low (common tokens), rare-junk
    * docs score high.
    *
    * Scale shape: one linear token explode; the vocabulary is a
    * partial-agg groupBy (distinct-token sized — Heaps-law bounded in
    * clean text but NOT broadcast here: web-scale corpora have
    * unbounded typo/junk vocabularies, so scoring is a shuffle
    * equi-join on the token key, whose natural Zipf skew is absorbed
    * map-side by partial aggregation downstream and AQE skew
    * handling). Per-token scores quantize to integer micro-nats
    * (ROUND(LN·1e6) — the BM25/TF-IDF pattern) so per-doc sums are
    * exact and the whole score is hash-gated; the final average is a
    * single IEEE double division, bit-identical across engines.
    */
  def unigramLogprob(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir).select(col("doc_id"), explode(toks).as("tok"))
    val vocab = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val tot = tok.groupBy().agg(count(lit(1)).as("n_total"))
    val scored = tok.join(vocab, "tok").crossJoin(broadcast(tot))
      .select(col("doc_id"),
        round(log(col("n_total").cast("double") / col("cnt")) * lit(1000000))
          .cast("long").as("nll_micro"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("nll_micro").as("nll_total_micro"))
      .select(col("doc_id"), col("n_tokens"), col("nll_total_micro"),
        (col("nll_total_micro").cast("double") / col("n_tokens") / lit(1000000.0))
          .as("avg_nll"))
      .orderBy("doc_id")
  }

  val unigramLogprobOracle: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    UNNEST(LIST_FILTER(regexp_split_to_array(text, '\s+'), t -> LEN(t) > 0)) AS tok
      |  FROM documents),
      |vocab AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS n_total FROM tok),
      |scored AS (
      |  SELECT t.doc_id,
      |    CAST(ROUND(LN(CAST(tot.n_total AS DOUBLE) / v.cnt) * 1000000) AS BIGINT) AS nll_micro
      |  FROM tok t JOIN vocab v USING (tok) CROSS JOIN tot)
      |SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(nll_micro) AS BIGINT) AS nll_total_micro,
      |  CAST(SUM(nll_micro) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_nll
      |FROM scored GROUP BY 1 ORDER BY doc_id""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("text_unigram_logprob", unigramLogprob, Some(unigramLogprobOracle)),
    Q("text_train_split", trainSplit, Some(trainSplitOracle)),
    Q("text_chunk_windows", chunkWindows, Some(chunkWindowsOracle)),
    Q("text_redact", redact, Some(redactOracle)),
    Q("text_repetition", repetition, Some(repetitionOracle)),
    Q("text_ngram_freq", ngramFreq, Some(ngramFreqOracle)),
    Q("text_mix_sampling", sampling, Some(samplingOracle)),
    Q("text_token_count", tokenCount, Some(tokenCountOracle)),
    Q("text_quality", quality, Some(qualityOracle)),
    Q("text_lang_id", langId, Some(langIdOracle)),
    Q("text_fingerprint", fingerprint, Some(fingerprintOracle)))
}
