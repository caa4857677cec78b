package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** Round-3 product-analytics shapes over the events stream: cohort
  * retention and fixed-width histograms — the two aggregations every
  * BI tool pointed at the reference lake (Metabase, RUNBOOK.md §10)
  * generates constantly.
  *
  * Scale notes: retention reduces the raw event stream to DISTINCT
  * (user, week) pairs before any join — the panel is bounded by
  * users × weeks, orders of magnitude under the tick count, and the
  * first-week join shuffles only that panel on user_id. The histogram
  * is a single hash aggregate on a computed bucket key; no sort, no
  * window, partial-combined map-side.
  */
object Relational5 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---------------------------------------------------------------
  /** Weekly cohort retention: users grouped by first-active week;
    * cell (cohort, k) counts how many came back k weeks later.
    * Monday-start weeks (`date_trunc("week", …)`) match DuckDB's
    * convention, so week arithmetic is always an exact multiple of
    * 7 days.
    */
  def retentionCohort(s: SparkSession, dir: String): DataFrame = {
    val wk = t(s, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val cohort = wk.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    wk.join(cohort, "user_id")
      .withColumn("weeks_since",
        (datediff(col("wk"), col("cohort_wk")) / 7).cast("long"))
      .groupBy(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
        col("weeks_since"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "weeks_since")
  }

  val retentionCohortOracle: String =
    """WITH wk AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
      |cohort AS (SELECT user_id, MIN(wk) AS cohort_wk FROM wk GROUP BY 1)
      |SELECT CAST(CAST(cohort_wk AS DATE) AS VARCHAR) AS cohort_week,
      | CAST(DATE_DIFF('day', cohort_wk, wk) / 7 AS BIGINT) AS weeks_since,
      | COUNT(DISTINCT user_id) AS n_users
      |FROM wk JOIN cohort USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  /** Fixed-width histogram of order line notional: bucket =
    * floor(price / 5000). Bucket bounds are exact integers, counts and
    * the fixed-point revenue sum are order-independent.
    */
  def histogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(floor(col("l_extendedprice") / 5000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        OracleSafe.sumMoney(col("l_extendedprice")).as("total"))
      .withColumn("lo", col("bucket") * 5000)
      .withColumn("hi", (col("bucket") + 1) * 5000)
      .select("bucket", "lo", "hi", "n", "total")
      .orderBy("bucket")

  val histogramOracle: String =
    s"""SELECT bucket, bucket * 5000 AS lo, (bucket + 1) * 5000 AS hi,
       | COUNT(*) AS n, ${OracleSafe.sqlSumMoney("l_extendedprice", "total")}
       |FROM (SELECT CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) AS bucket,
       |       l_extendedprice FROM lineitem) t
       |GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------
  /** Next-event transition matrix (first-order Markov over the event
    * stream): P(next_type | type) per user journey. One window pass
    * keyed by user_id produces the (type, next) pairs; the transition
    * counts are an ordinary hash agg, and the row-normalizing
    * probabilities divide by a window sum over the 5×5 matrix — the
    * post-agg result, never the raw stream.
    */
  def transitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val counts = t(s, dir, "events")
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type")
      .agg(count(lit(1)).as("n"))
    val wSrc = Window.partitionBy("event_type")
    counts
      .withColumn("p", round(col("n").cast("double") / sum("n").over(wSrc), 6))
      .orderBy("event_type", "next_type")
  }

  val transitionsOracle: String =
    """WITH pairs AS (
      | SELECT event_type,
      |  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      | FROM events),
      |counts AS (
      | SELECT event_type, next_type, COUNT(*) AS n FROM pairs
      | WHERE next_type IS NOT NULL GROUP BY 1, 2)
      |SELECT event_type, next_type, n,
      | ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY event_type), 6) AS p
      |FROM counts ORDER BY event_type, next_type""".stripMargin

  // ---------------------------------------------------------------
  val queries: Seq[Q] = Seq(
    Q("q_retention_cohort", retentionCohort, Some(retentionCohortOracle)),
    Q("q_histogram", histogram, Some(histogramOracle)),
    Q("q_transition_matrix", transitions, Some(transitionsOracle)))
}
