package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability = one named query + (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness
  * oracle. Modules expose `queries: Seq[Q]`; SparkEntry aggregates.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
