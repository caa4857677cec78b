package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every capability from SURVEY.md §2, one Q each. */
  def registry: Seq[Q] =
    operators.Relational.queries ++ operators.Relational2.queries ++ operators.Relational3.queries ++ operators.Relational4.queries ++ operators.Relational5.queries ++ operators.Advanced.queries ++ operators.Finance.queries ++ operators.RangeJoin.queries ++ lake.LakeOps.queries ++
      text.TextAnalysis.queries ++ text.GopherRules.queries ++ text.Packing.queries ++ text.Retrieval.queries ++ text.CorpusPrep.queries ++
      dedup.Dedup.queries ++ ann.Ann.queries ++
      multimodal.Multimodal.queries ++ streaming.Streaming.queries ++
      quality.DataQuality.queries ++ sources.Catalog.queries ++ sources.PersistentCatalog.queries ++ endpoint.SqlEndpoint.queries ++ endpoint.RestCatalog.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference's headline query (avg value by key and day —
    * RUNBOOK.md §9) on the events table.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.qDateTruncDaily(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
