package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftSqlInternals, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.lake.SnapshotTable

/** Structured Streaming CDC source over a [[SnapshotTable]]:
  * `spark.readStream.format("graft-snapshot").option("path", root)`
  * turns the table's commit log into a stream of row changes. The
  * offset IS the snapshot version — each micro-batch is
  * `changes(startVersion, endVersion)` (insert/delete images,
  * manifest-diff file skipping), so a batch reads only the data files
  * the covered commits touched, never the table. Restart recovery is
  * the engine's own offset checkpointing; the source is stateless.
  *
  * This is the streaming face of the reference's ingest-then-query
  * loop (Airflow appends → consumers read, RUNBOOK.md §8): downstream
  * syncs subscribe to the table instead of polling
  * [[SnapshotTable.changesSince]] by hand.
  */
class SnapshotSource(
    sqlContext: SQLContext, root: String, sourceSchema: StructType) extends Source {

  private def spark = sqlContext.sparkSession

  override def getOffset: Option[Offset] = {
    val v = SnapshotTable.currentVersion(spark, root)
    if (v == 0) None else Some(SnapshotSource.VersionOffset(v))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(SnapshotSource.versionOf).getOrElse(0)
    val to = SnapshotSource.versionOf(end)
    GraftSqlInternals.asStreaming(SnapshotTable.changes(spark, root, from, to))
  }

  override def schema: StructType = sourceSchema

  override def stop(): Unit = ()
}

object SnapshotSource {
  final case class VersionOffset(version: Int) extends Offset {
    override def json: String = version.toString
  }

  private[streaming] def versionOf(o: Offset): Int = o match {
    case VersionOffset(v) => v
    case other => other.json.trim.toInt // engine replays SerializedOffset from the checkpoint log
  }

  /** The changes() schema for a table: its current read schema plus
    * the change_type column.
    */
  def changeSchema(spark: org.apache.spark.sql.SparkSession, root: String): StructType =
    StructType(SnapshotTable.read(spark, root).schema.fields :+
      StructField("change_type", StringType, nullable = false))
}

/** `format("graft-snapshot")` registration (META-INF service file). */
class SnapshotSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-snapshot requires .option(\"path\", <table root>)"))

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      SnapshotSource.changeSchema(sqlContext.sparkSession, rootOf(parameters))))

  override def createSource(
      sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val root = rootOf(parameters)
    new SnapshotSource(sqlContext, root,
      schema.getOrElse(SnapshotSource.changeSchema(sqlContext.sparkSession, root)))
  }
}
