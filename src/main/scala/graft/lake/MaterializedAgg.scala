package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized aggregate (incremental view maintenance):
  * a (key → count, sum) summary maintained as a SnapshotTable. Each
  * appended batch is aggregated ALONE and merged with the previous
  * summary version — sums and counts are associative, so the merge is
  * a groupBy over (|summary| + |batch keys|) rows, never a recompute
  * over history. This is what keeps a dashboard aggregate (the
  * reference's Metabase AVG-close-by-ticker card, RUNBOOK.md §9)
  * fresh at 100 TB: per-refresh cost is O(batch), not O(corpus).
  *
  * Sums are kept in fixed-point cents (exact, order-independent), so
  * the maintained summary is bit-identical to a from-scratch rebuild.
  */
object MaterializedAgg {

  /** Schema of the summary: keyCols ++ (n, sum_cents). */
  private def aggregate(batch: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(round(col(valueCol) * 100).cast("long")).as("sum_cents"))

  /** Fold a new batch into the summary table; returns new version. */
  def refresh(s: SparkSession, summaryRoot: String,
      batch: DataFrame, keyCols: Seq[String], valueCol: String): Int = {
    val batchAgg = aggregate(batch, keyCols, valueCol)
    val merged =
      if (SnapshotTable.currentVersion(s, summaryRoot) == 0) batchAgg
      else SnapshotTable.read(s, summaryRoot)
        .unionByName(batchAgg)
        .groupBy(keyCols.map(col): _*)
        .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"))
    // overwrite commit: the new version supersedes, old versions stay
    // readable (summary-as-of-batch-k time travel)
    SnapshotTable.commit(s, summaryRoot, merged, append = false)
  }

  /** Present the summary with derived avg, as a query would read it. */
  def read(s: SparkSession, summaryRoot: String, version: Int = -1): DataFrame =
    SnapshotTable.read(s, summaryRoot, version)
      .withColumn("total", col("sum_cents").cast("double") / lit(100.0))
      .withColumn("avg", col("sum_cents").cast("double") / lit(100.0) / col("n"))
      .drop("sum_cents")
}
