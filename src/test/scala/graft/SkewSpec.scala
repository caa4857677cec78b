package graft

import org.apache.spark.sql.functions._

/** Observes AQE's skew-join splitting on a deliberately skewed join —
  * the runtime complement to the hash-salting strategy in
  * operators.Advanced.qSaltedJoin.
  */
class SkewSpec extends SparkSpec {

  test("salted ingest spreads a hot date over tasks, file count stays O(dates)") {
    lake.LakeOps.ingestPartitioned(spark, sf()).collect()
    val out = new java.io.File(s"/tmp/graft_lake/${sf().replaceAll("[^A-Za-z0-9.]", "_")}/curated_events")
    val dateDirs = out.listFiles().filter(d => d.isDirectory && d.getName.startsWith("date="))
    assert(dateDirs.nonEmpty)
    val filesPerDate = dateDirs.map(_.listFiles().count(_.getName.endsWith(".parquet")))
    // bounded: never more than the salt-bucket count per date
    assert(filesPerDate.forall(n => n >= 1 && n <= 4), s"file counts: ${filesPerDate.mkString(",")}")
    // spread: the busiest date used more than one writer task
    assert(filesPerDate.max > 1, "hot date should spread over multiple tasks")
  }

  test("AQE splits a skewed sort-merge join partition") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      import spark.implicits._
      // 95% of fact rows share one key; payload inflates partition bytes
      val facts = spark.range(120000)
        .select((when(col("id") % 20 =!= 0, 7L).otherwise(col("id") % 100)).as("k"),
          lpad(col("id").cast("string"), 64, "x").as("payload"))
      val dim = spark.range(100).select(col("id").as("k"), col("id").as("w"))
      val joined = facts.join(dim, Seq("k"))
      // collect() drives joined's OWN query execution so the final
      // adaptive plan (isFinalPlan=true) is inspectable afterwards
      assert(joined.collect().length > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
