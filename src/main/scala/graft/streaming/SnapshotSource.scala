package graft.streaming

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlInternals, Row, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
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

/** BATCH face of `format("graft-snapshot")`: a SQL-queryable relation
  * over a [[SnapshotTable]] with filter pushdown INTO MANIFEST
  * PRUNING. `spark.read.format("graft-snapshot").option("path", root)`
  * — or `CREATE TABLE t USING \`graft-snapshot\` OPTIONS (path '…')` —
  * serves the table's current (or time-traveled) state: merge-on-read
  * deletes applied, renames/widens resolved, and pushed filters
  * driving the partition/stats/bloom file skip through
  * [[SnapshotTable.readWhere]]. This is what lets any SQL client (the
  * JDBC endpoint, a notebook, `spark.sql`) hit a lake table without
  * calling the Scala API — the Trino-over-Iceberg query surface
  * (RUNBOOK.md §7/§9) as a first-class Spark relation.
  *
  * Pushdown is for FILE PRUNING only: every filter is returned as
  * unhandled, so Spark re-evaluates the full predicate above the scan
  * and correctness never depends on the Filter→Column translation
  * being complete — an untranslatable shape just prunes less.
  */
class GraftSnapshotRelation(
    @transient override val sqlContext: SQLContext,
    root: String, version: Int)
  extends BaseRelation with PrunedFilteredScan {

  private def spark = sqlContext.sparkSession

  override lazy val schema: StructType =
    SnapshotTable.read(spark, root, version).schema

  // rows come straight off the engine's own plan as InternalRow
  // (toRdd); declaring no conversion skips the Row round-trip a V1
  // relation would otherwise pay per row
  override def needConversion: Boolean = false

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(
      requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val pred = filters.toSeq.flatMap(GraftSnapshotRelation.toColumn)
      .reduceOption(_ && _)
    val base = pred match {
      case Some(p) => SnapshotTable.readWhere(spark, root, p, version)
      case None => SnapshotTable.read(spark, root, version)
    }
    // observability hook (spec-pinned): how many files the pruned
    // scan actually opens — metadata-sized to compute
    GraftSnapshotRelation.lastScanFiles = base.inputFiles.length
    val projected =
      if (requiredColumns.isEmpty) base.select() // count(*)-style scan
      else base.select(requiredColumns.map(col).toIndexedSeq: _*)
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

object GraftSnapshotRelation {

  /** Files opened by the most recent buildScan in this JVM — the
    * spec's window onto whether pushed filters reached the manifest
    * prune. Test observability only, never consulted by the engine.
    */
  @volatile private[graft] var lastScanFiles: Int = -1

  /** Source Filter → Column, for pruning. `None` = shape we don't
    * translate (it then simply doesn't prune; Spark still applies it
    * above the scan). An AND uses whichever sides translate — sound,
    * since pruning by a weaker predicate only keeps extra files — an
    * OR needs both.
    */
  private[graft] def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) =>
      (toColumn(l).toSeq ++ toColumn(r).toSeq).reduceOption(_ && _)
    case Or(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case _ => None
  }
}

/** `format("graft-snapshot")` registration (META-INF service file).
  * Streaming: the CDC source above. Batch: [[GraftSnapshotRelation]],
  * with time travel via `.option("version", n)` or
  * `.option("timestamp_ms", epochMillis)`.
  */
class SnapshotSourceProvider extends StreamSourceProvider with DataSourceRegister
    with RelationProvider {

  override def shortName(): String = "graft-snapshot"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-snapshot requires .option(\"path\", <table root>)"))

  override def createRelation(
      sqlContext: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val root = rootOf(parameters)
    val s = sqlContext.sparkSession
    val version = parameters.get("version").map(_.trim.toInt)
      .orElse(parameters.get("timestamp_ms").map { raw =>
        val ts = raw.trim.toLong
        val cur = SnapshotTable.currentVersion(s, root)
        (1 to cur).filter(SnapshotTable.committedAt(s, root, _) <= ts)
          .maxOption.getOrElse(throw new IllegalArgumentException(
            s"no version of $root committed at or before $ts"))
      })
      .getOrElse(-1)
    new GraftSnapshotRelation(sqlContext, root, version)
  }

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
