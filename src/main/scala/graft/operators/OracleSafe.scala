package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers that make float aggregates bit-identical between Spark and
  * the DuckDB oracle.
  *
  * A parallel `SUM(double)` is order-dependent, so Spark (32-way
  * partial agg) and DuckDB (sequential) can differ in the last few
  * ulps — enough to flip a rounded digit and fail a hash compare.
  * Instead we scale to fixed-point BIGINT *before* aggregating
  * (exact, associative, order-independent) and convert back with the
  * same IEEE ops on both sides. The SQL strings in SparkEntry.oracleSql
  * mirror these expression trees op-for-op.
  */
object OracleSafe {
  /** Fixed-point cents: round(x * 100) as BIGINT. */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** Fixed-point 1e-4: round(x * 10000) as BIGINT. */
  def tenK(c: Column): Column = round(c * lit(10000)).cast("long")

  /** Order-independent SUM with 2-decimal fidelity, as DOUBLE. */
  def sumMoney(c: Column): Column =
    sum(cents(c)).cast("double") / lit(100.0)

  /** Order-independent AVG with 4-decimal input fidelity, as DOUBLE. */
  def avgFixed(c: Column): Column =
    sum(tenK(c)).cast("double") / lit(10000.0) / count(c)

  // --- DuckDB-side mirrors (string builders for oracleSql) ---
  def sqlSumMoney(x: String, as: String): String =
    s"CAST(SUM(CAST(ROUND(($x) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS $as"
  def sqlAvgFixed(x: String, as: String): String =
    s"CAST(SUM(CAST(ROUND(($x) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 / COUNT($x) AS $as"
}
