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
    // The driver writes `events.ts` as parquet TIMESTAMP(NANOS), which
    // vanilla Spark rejects (PARQUET_TYPE_ILLEGAL). Read nanos as long
    // and rebuild a proper TimestampType (values are µs-precision, so
    // the ns→µs truncation is lossless).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
