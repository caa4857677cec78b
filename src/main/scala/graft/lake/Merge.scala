package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE INTO (SCD1 upsert) semantics as a single-shuffle plan.
  *
  * The reference upserts curated rows into Iceberg through Trino
  * (notebooks/test_airflow_yfinance.ipynb cell 5 — chunked INSERT of
  * the latest curated batch). At 100 TB the scalable form is:
  * union(target, updates) → one hash shuffle on the key → keep the
  * winning row per key. No broadcast of either side is required, no
  * full outer join, and partial aggregation does not apply — this is
  * exactly one exchange.
  */
object Merge {

  /** One row per key. Updates beat target rows; ties within a side
    * resolve by `orderCols` descending (pass e.g. event-time, then a
    * unique id as the last tiebreaker for determinism).
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame =
    merged(target, updates, keys, orderCols, isDelete = lit(false))

  /** CDC MERGE with tombstones — `WHEN MATCHED AND isDelete THEN
    * DELETE / WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED AND NOT
    * isDelete THEN INSERT` — in the same single-shuffle plan.
    * `isDelete` is evaluated against update rows (the CDC convention:
    * the source row IS the delete marker). A key whose winning row is
    * a tombstone disappears; a later non-delete update outranking the
    * tombstone by `orderCols` keeps the key (latest-wins CDC).
    */
  def upsertWithDeletes(
      target: DataFrame, updates: DataFrame,
      keys: Seq[String], orderCols: Seq[Column], isDelete: Column): DataFrame =
    merged(target, updates, keys, orderCols, isDelete)

  private def merged(
      target: DataFrame, updates: DataFrame,
      keys: Seq[String], orderCols: Seq[Column], isDelete: Column): DataFrame = {
    val srcCol = "_graft_src"
    val rnCol = "_graft_rn"
    val delCol = "_graft_del"
    val unioned = target.withColumn(srcCol, lit(0)).withColumn(delCol, lit(false))
      .unionByName(updates.withColumn(srcCol, lit(1))
        .withColumn(delCol, coalesce(isDelete, lit(false))))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(srcCol).desc +: orderCols.map(_.desc): _*)
    unioned
      .withColumn(rnCol, row_number().over(w))
      .filter(col(rnCol) === 1)
      .filter(!col(delCol))
      .withColumn("updated", col(srcCol) === 1)
      .drop(srcCol, rnCol, delCol)
  }
}
