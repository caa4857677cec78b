package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-generated parquet lake layout.
  *
  * Mirrors the reference lake's catalog surface (tables addressed by
  * name inside a warehouse prefix — cf. /root/reference/RUNBOOK.md §7,
  * `iceberg.yfinance.fact_price`), re-expressed as Spark parquet reads.
  * Reads are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning capability; at cluster scale the same API points
  * at an object-store prefix instead of a local dir.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Driver runs have written `events.ts` under several physical
    // layouts over time: parquet TIMESTAMP(NANOS) (which vanilla Spark
    // rejects unless nanosAsLong surfaces it as a long of nanos) and
    // TIMESTAMP(MICROS) (read natively as Timestamp or TimestampNTZ
    // depending on isAdjustedToUTC). Branch on the type actually
    // loaded so any of them normalizes to the same µs-precision
    // session-TZ TimestampType column — the loader contract every
    // downstream query and oracle assumes (pinned by TablesLoadSpec).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** SQL expression normalizing a raw `ts` column of the given loaded
    * type to µs TimestampType (for SQL-text paths like the catalog
    * view — must stay in lockstep with [[normalizeEventsTs]]).
    */
  def eventsTsSql(raw: org.apache.spark.sql.types.DataType): String = raw match {
    case org.apache.spark.sql.types.LongType      => "timestamp_micros(ts div 1000)"
    case org.apache.spark.sql.types.TimestampType => "ts"
    case _                                        => "CAST(ts AS TIMESTAMP)"
  }

  /** Normalize an events frame's `ts` to µs TimestampType whatever the
    * physical layout loaded as (long-of-nanos under nanosAsLong,
    * TimestampNTZ from unadjusted TIMESTAMP(MICROS), or native
    * Timestamp).
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampType => df
      case t => df.withColumn("ts", expr(eventsTsSql(t)))
    }
  }

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Spread a COMPUTE-DENSE stage to cluster width when its scan
    * arrives narrower (opt guide §2.5 "input skew: one huge
    * unsplittable file … repartition immediately after the read"):
    * tokenize/window/decode stages do ~10³× the work per byte of a
    * plain scan, so a table that arrives as one small file leaves the
    * rest of the cluster idle for the whole stage. No-op whenever the
    * scan already carries at least `defaultParallelism` splits — at
    * cluster scale the input is many splits and NOTHING is inserted,
    * so this can never add a shuffle to a big read. Only apply it
    * under per-row work heavy enough to dwarf one pass of the rows
    * over the wire.
    */
  def spreadForCompute(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
