package graft

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import graft.endpoint.SqlEndpoint
import graft.lake.SnapshotTable

/** VERDICT r6 item 8: a point query against the indexed events view
  * must open only the file(s) whose manifest stats/bloom admit the
  * key — pinned on the OPTIMIZED plan's scan, which is what both
  * session and JDBC queries execute.
  */
class EndpointPointLookupSpec extends SparkSpec {

  private val dir = sf("0.001")

  private def scanFileCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        lr.relation.asInstanceOf[HadoopFsRelation].location.inputFiles.length
    }.sum

  test("WHERE key = ? prunes the snapshot scan to one file via manifest metadata") {
    SqlEndpoint.ensureIndexedEvents(spark, dir)
    val view = spark.table(SqlEndpoint.IndexedEventsView)
    val total = scanFileCount(view.filter(col("event_id") >= Long.MinValue))
    assert(total === 8, s"expected the 8 range-clustered files, saw $total")
    val point = view.filter(col("event_id") === 777L)
    assert(scanFileCount(point) === 1,
      "point lookup did not prune to the single file holding the key")
    // the pruned scan still answers correctly
    assert(point.select("event_id").collect().map(_.getLong(0)).toSeq === Seq(777L))
    // a small IN set opens at most one file per key
    val in3 = view.filter(col("event_id").isin(7L, 77L, 777L))
    assert(scanFileCount(in3) <= 3)
    assert(in3.count() === 3)
  }

  test("pruning never drops files the metadata cannot exclude (miss returns empty, not wrong)") {
    SqlEndpoint.ensureIndexedEvents(spark, dir)
    val view = spark.table(SqlEndpoint.IndexedEventsView)
    // a key beyond every file's max: all files excluded, empty result
    val miss = view.filter(col("event_id") === 10000000L)
    assert(miss.count() === 0)
    // a non-key predicate gets no file pruning (metadata can't exclude)
    val nonKey = view.filter(col("event_type") === "click")
    assert(scanFileCount(nonKey) === 8)
    assert(nonKey.count() ===
      graft.sources.Tables.load(spark, dir, "events")
        .filter(col("event_type") === "click").count())
  }
}
