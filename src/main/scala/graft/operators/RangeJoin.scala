package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables
import graft.operators.OracleSafe._

/** Point-in-interval range join, bin-bucketed so it runs as a shuffle
  * EQUI-join at any interval-set size. Spark plans a bare
  * `p >= lo AND p < hi` join as BroadcastNestedLoopJoin — O(N×M) and
  * driver-bound by the broadcast; with both sides large it simply
  * dies. Bucketing by `floor(x / binWidth)` turns it into an
  * equi-join on the bin: intervals explode to the bins they span
  * (cost Σ span/binWidth rows), points map to exactly one bin, and
  * each matching (point, interval) pair meets in precisely the
  * point's bin — no dedup needed. Residual `[lo, hi)` evaluates only
  * within co-bucketed pairs. Same blocking idea as the LSH band join
  * in dedup (Dedup.scala) applied to 1-D numeric ranges.
  */
object RangeJoin {

  /** Join `points` to the intervals they fall in: lo <= point < hi.
    * Column names must be unambiguous across the two inputs. Pick
    * `binWidth` near the typical interval span: wider bins explode
    * fewer rows per interval but co-bucket more non-matching pairs.
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      point: Column, lo: Column, hi: Column,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val w = lit(binWidth)
    // an interval whose exclusive hi sits exactly on a bin boundary
    // gets listed in one extra bin; the residual filter makes that a
    // (tiny) efficiency cost, never a correctness one
    val binned = intervals.withColumn("_graft_bin",
      explode(sequence(
        floor(lo / w).cast("long"),
        floor(hi / w).cast("long"))))
    points.withColumn("_graft_bin", floor(point / w).cast("long"))
      .join(binned, "_graft_bin")
      .filter(point >= lo && point < hi)
      .drop("_graft_bin")
  }

  // ---------------------------------------------------------------
  /** Overlapping price-band classification of the tick stream: 50
    * bands of width 20 overlapping by 10, so each tick lands in up to
    * two bands — a genuine interval join, not a bucketize. The bands
    * are a derived dimension (spark.range), the ticks are the fact;
    * at 100 TB both sides may be large, hence the bin bucketing.
    */
  def rangeJoinBands(s: SparkSession, dir: String): DataFrame = {
    val bands = s.range(50).select(
      col("id").as("band_id"),
      (col("id") * 10.0 - 5.0).as("lo"),
      (col("id") * 10.0 + 15.0).as("hi"))
    val ticks = Tables.load(s, dir, "events")
    pointInInterval(ticks, bands, col("value"), col("lo"), col("hi"), 20.0)
      .groupBy("band_id")
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("total_value"))
      .orderBy("band_id")
  }

  val rangeJoinBandsOracle: String =
    s"""SELECT band_id, COUNT(*) AS n, ${sqlSumMoney("value", "total_value")}
       |FROM events JOIN (
       |  SELECT i AS band_id, i * 10.0 - 5 AS lo, i * 10.0 + 15 AS hi
       |  FROM generate_series(0, 49) t(i)) bands
       | ON value >= lo AND value < hi
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_range_join", rangeJoinBands, Some(rangeJoinBandsOracle)))
}
