package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** Data-quality layer: profiling and expectation gates — the checks a
  * lake runs before promoting a batch from raw to curated (the
  * reference does this manually via notebook verification cells and
  * the pandas/SQL comparison, notebook cell 6).
  *
  * Both ops are single-pass aggregations (one scan, map-side partial
  * agg, no joins) so they cost one read of the batch at any scale.
  */
object DataQuality {

  /** Per-column profile of the events table: null count, distinct
    * count, numeric min/max — one scan, all columns at once.
    */
  def qProfile(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val cols = Seq("event_id", "user_id", "value")
    val profiled = ev.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))): _*)
    // pivot the single wide row into (column, metric...) rows
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }
    profiled.select(explode(array(rows: _*)).as("p"))
      .select("p.column", "p.n_nulls", "p.n_distinct", "p.min_value", "p.max_value")
      .orderBy("column")
  }

  val qProfileOracle: String = {
    def one(c: String) =
      s"""SELECT '$c' AS "column", COUNT(*) - COUNT($c) AS n_nulls,
         | CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         | CAST(MIN($c) AS DOUBLE) AS min_value, CAST(MAX($c) AS DOUBLE) AS max_value
         |FROM events""".stripMargin
    Seq("event_id", "user_id", "value").map(one).mkString("\nUNION ALL\n") +
      "\nORDER BY \"column\""
  }

  // ---------------------------------------------------------------
  /** Expectation gate: named constraints with violation counts — the
    * promote/quarantine decision input.
    */
  def qExpectations(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val checks = Seq(
      "value_non_negative" -> (col("value") >= 0),
      "known_event_type" -> col("event_type").isInCollection(
        Seq("click", "error", "purchase", "signup", "view")),
      "ts_in_range" -> (col("ts") >= lit("2024-01-01").cast("timestamp") &&
        col("ts") < lit("2025-01-01").cast("timestamp")),
      "user_id_present" -> col("user_id").isNotNull)
    val agged = ev.agg(
      count(lit(1)).as("n_rows"),
      checks.map { case (name, pred) =>
        count(when(!coalesce(pred, lit(false)), 1)).as(s"viol__$name")
      }: _*)
    val rows = checks.map { case (name, _) =>
      struct(lit(name).as("expectation"),
        col(s"viol__$name").as("n_violations"),
        (col(s"viol__$name") === 0).as("passed"))
    }
    agged.select(explode(array(rows: _*)).as("e"))
      .select("e.expectation", "e.n_violations", "e.passed")
      .orderBy("expectation")
  }

  val qExpectationsOracle: String = {
    val checks = Seq(
      "value_non_negative" -> "value >= 0",
      "known_event_type" -> "event_type IN ('click','error','purchase','signup','view')",
      "ts_in_range" -> "ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2025-01-01'",
      "user_id_present" -> "user_id IS NOT NULL")
    checks.map { case (name, pred) =>
      s"""SELECT '$name' AS expectation,
         | COUNT(CASE WHEN NOT COALESCE($pred, FALSE) THEN 1 END) AS n_violations,
         | COUNT(CASE WHEN NOT COALESCE($pred, FALSE) THEN 1 END) = 0 AS passed
         |FROM events""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY expectation"
  }

  // ---------------------------------------------------------------
  val queries: Seq[Q] = Seq(
    Q("q_profile", qProfile, Some(qProfileOracle)),
    Q("q_expectations", qExpectations, Some(qExpectationsOracle)))
}
