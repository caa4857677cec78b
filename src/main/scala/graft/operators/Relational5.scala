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
  val queries: Seq[Q] = Seq(
    Q("q_retention_cohort", retentionCohort, Some(retentionCohortOracle)),
    Q("q_histogram", histogram, Some(histogramOracle)))
}
