package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q

/** Named-table catalog over the driver lake — the reference's
  * `SHOW TABLES FROM iceberg.yfinance` / `DESCRIBE` surface
  * (reference RUNBOOK.md:95) re-expressed through Spark's session
  * catalog: external parquet tables registered in a `graft` database,
  * plus a catalog VIEW for the nanos-timestamped events table (the
  * same rebuild Tables.load does, but addressable by name). Listing
  * and describe are catalog metadata ops — O(tables), no data scan;
  * only the row counts touch data, and those are parquet
  * footer-count scans.
  */
object Catalog {

  val DB = "graft"

  /** Idempotent (re)registration of every lake table under `graft.*`.
    * At cluster scale `dir` is an object-store prefix and this is the
    * one-time DDL a platform team runs; here it doubles as test setup.
    *
    * Steady-state fast path (opt guide §1.2 — DDL is one-time work,
    * not per-query work): when every table is ALREADY registered at
    * exactly these locations and the events view already points at
    * this dir, re-issuing ~21 DDL statements per entry is pure
    * overhead — a visible slice of every catalog/REST/endpoint
    * entry's wall time. The check reads only session-catalog
    * metadata (no jobs, no data); ANY mismatch — missing table,
    * different location, different dir, dropped db — falls through
    * to the full re-registration, so behavior is unchanged.
    */
  def register(s: SparkSession, dir: String): Unit = {
    if (alreadyRegistered(s, dir)) return
    s.sql(s"CREATE DATABASE IF NOT EXISTS $DB")
    // events.parquet's physical ts layout varies by driver run (nanos
    // or micros): expose a view rebuilding a proper TimestampType, so
    // `graft.events` shows the same schema a DuckDB/Trino user sees.
    // The expression must match what the raw file loads as — same
    // normalization contract as Tables.load.
    Tables.all.filterNot(_ == "events").foreach { n =>
      s.sql(s"DROP TABLE IF EXISTS $DB.$n")
      // explicit footer schema: registering with schema inference
      // schedules a 1-task job per table; the footer probe is the
      // same information read driver-side
      s.catalog.createTable(s"$DB.$n", "parquet",
        Footer.schemaOf(s, s"$dir/$n.parquet"),
        Map("path" -> s"$dir/$n.parquet"))
    }
    s.sql(s"CREATE OR REPLACE VIEW $DB.events AS\n${eventsViewSelect(s, dir)}")
  }

  /** The events view body — shared by [[register]] and the fast-path
    * equality check (stored viewText must match char-for-char).
    * Footer probe runs on the driver: no 1-task inference job.
    */
  private def eventsViewSelect(s: SparkSession, dir: String): String = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawTs = Footer.schemaOf(s, s"$dir/events.parquet")("ts").dataType
    s"""SELECT event_id, ${Tables.eventsTsSql(rawTs)} AS ts,
       |       user_id, event_type, value, props
       |FROM parquet.`$dir/events.parquet`""".stripMargin
  }

  private def alreadyRegistered(s: SparkSession, dir: String): Boolean =
    try {
      if (!s.catalog.databaseExists(DB)) return false
      val cat = s.sessionState.catalog
      import org.apache.spark.sql.catalyst.TableIdentifier
      import org.apache.spark.sql.catalyst.catalog.CatalogTableType
      def located(n: String): Boolean = {
        val id = TableIdentifier(n, Some(DB))
        cat.tableExists(id) && {
          val m = cat.getTableMetadata(id)
          m.provider.exists(_.equalsIgnoreCase("parquet")) &&
            m.storage.locationUri.exists(u =>
              new org.apache.hadoop.fs.Path(u).toUri.getPath ==
                new org.apache.hadoop.fs.Path(s"$dir/$n.parquet").toUri.getPath)
        }
      }
      Tables.all.filterNot(_ == "events").forall(located) && {
        val id = TableIdentifier("events", Some(DB))
        cat.tableExists(id) && {
          val m = cat.getTableMetadata(id)
          m.tableType == CatalogTableType.VIEW &&
            m.viewText.contains(eventsViewSelect(s, dir))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => false }

  /** SHOW TABLES equivalent: names straight from the catalog listing
    * (filtered to the database — temp views excluded), one count(*)
    * per table. The collect() is catalog metadata (tens of names),
    * not data.
    */
  def tablesListing(s: SparkSession, dir: String): DataFrame = {
    register(s, dir)
    listing(s)
  }

  /** The listing alone, from whatever is ALREADY registered in `$DB` —
    * used by [[PersistentCatalog.roundtrip]] to prove a restored
    * catalog serves the same tables without touching `register`.
    */
  def listing(s: SparkSession): DataFrame = {
    val names = s.sql(s"SHOW TABLES IN $DB")
      .where(!col("isTemporary"))
      .select("tableName").collect().map(_.getString(0)).sorted
    names.map { n =>
      val df = s.table(s"$DB.$n")
      df.agg(count(lit(1)).as("n_rows"))
        .select(
          lit(n).as("table_name"), col("n_rows"),
          lit(df.schema.size).cast("long").as("n_cols"))
    }.reduce(_ union _).orderBy("table_name")
  }

  /** DESCRIBE parity: (table, column, type) for every registered
    * table, through the real `DESCRIBE TABLE` surface.
    */
  def describeAll(s: SparkSession, dir: String): DataFrame = {
    register(s, dir)
    Tables.all.sorted.map { n =>
      s.sql(s"DESCRIBE TABLE $DB.$n")
        .where(!col("col_name").startsWith("#") && col("col_name") =!= "")
        .select(
          lit(n).as("table_name"),
          col("col_name").as("column_name"),
          col("data_type"))
    }.reduce(_ union _).orderBy("table_name", "column_name")
  }

  // ----------------------------------------------------------------
  // oracles: DuckDB recomputes the listing from its own metadata
  // (pragma_table_info over the same parquet views), with its type
  // names mapped to Spark's simpleString spelling.

  // Raw parquet timestamps (isAdjustedToUTC=false) surface in Spark as
  // TIMESTAMP_NTZ; the events view deliberately rebuilds an instant
  // (TimestampType), so its mapping differs per table.
  private def typeCase(table: String) = {
    val ts = if (table == "events") "timestamp" else "timestamp_ntz"
    s"""CASE type WHEN 'INTEGER' THEN 'int' WHEN 'BIGINT' THEN 'bigint'
       | WHEN 'VARCHAR' THEN 'string' WHEN 'DOUBLE' THEN 'double'
       | WHEN 'TIMESTAMP' THEN '$ts' WHEN 'FLOAT[]' THEN 'array<float>'
       | ELSE lower(type) END""".stripMargin.replace("\n", "")
  }

  /** Shared with [[PersistentCatalog]]: a restored catalog must
    * hash-match the very same oracle the live one does.
    */
  def tablesOracleSql: String = tablesOracle

  private def tablesOracle: String =
    Tables.all.sorted.map { n =>
      s"""SELECT '$n' AS table_name, (SELECT count(*) FROM "$n") AS n_rows,
         | (SELECT count(*) FROM pragma_table_info('$n')) AS n_cols""".stripMargin.replace("\n", "")
    }.mkString("SELECT table_name, n_rows, n_cols FROM (", " UNION ALL ", ") ORDER BY table_name")

  private def describeOracle: String =
    Tables.all.sorted.map { n =>
      s"SELECT '$n' AS table_name, name AS column_name, ${typeCase(n)} AS data_type FROM pragma_table_info('$n')"
    }.mkString(
      "SELECT table_name, column_name, data_type FROM (",
      " UNION ALL ",
      ") ORDER BY table_name, column_name")

  def queries: Seq[Q] = Seq(
    Q("catalog_tables", (s, dir) => tablesListing(s, dir), Some(tablesOracle)),
    Q("catalog_describe", (s, dir) => describeAll(s, dir), Some(describeOracle)))
}
