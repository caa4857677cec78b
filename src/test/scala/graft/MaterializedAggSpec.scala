package graft

import org.apache.spark.sql.functions._

import graft.lake.{MaterializedAgg, SnapshotTable}

class MaterializedAggSpec extends SparkSpec {

  test("incrementally maintained summary is bit-identical to a full rebuild") {
    val root = "/tmp/graft_test/matagg"
    SnapshotTable.drop(spark, root)
    val ev = sources.Tables.load(spark, sf(), "events")
    val cut = lit("2024-01-15").cast("timestamp")
    val b1 = ev.filter(col("ts") < cut)
    val b2 = ev.filter(col("ts") >= cut)

    assert(MaterializedAgg.refresh(spark, root, b1, Seq("event_type"), "value") === 1)
    assert(MaterializedAgg.refresh(spark, root, b2, Seq("event_type"), "value") === 2)

    val maintained = MaterializedAgg.read(spark, root)
      .select("event_type", "n", "total", "avg").orderBy("event_type").collect()
    // from-scratch rebuild over ALL events, same fixed-point math
    val rebuilt = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")).cast("double") / lit(100.0)).as("total"))
      .withColumn("avg", col("total") * 100.0 / lit(100.0) / col("n")) // same op shape as read()
      .select("event_type", "n", "total", "avg").orderBy("event_type").collect()
    assert(maintained.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      === rebuilt.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)

    // time travel: version 1 only covers batch 1
    val v1total = MaterializedAgg.read(spark, root, 1)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(v1total === b1.count())
  }
}
