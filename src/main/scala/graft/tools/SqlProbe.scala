package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: test dialect-shared SQL texts against Spark's parser. */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val tests = Map(
      "values" -> "SELECT t.s AS seg, COUNT(*) AS n FROM (VALUES ('BUILDING'), ('MACHINERY')) AS t(s) JOIN customer ON c_mktsegment = t.s GROUP BY 1 ORDER BY 1",
      "intersect_all" -> "SELECT c_nationkey AS nk FROM customer INTERSECT ALL SELECT c_nationkey FROM customer WHERE c_acctbal > 0 ORDER BY nk LIMIT 5",
      "first_last" -> "SELECT o_custkey, FIRST_VALUE(o_orderkey) OVER w AS first_ok, LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) LIMIT 3",
      "lateral" -> "SELECT c_custkey, t.o_orderkey FROM customer, LATERAL (SELECT o_orderkey FROM orders WHERE o_custkey = c_custkey ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t LIMIT 3")
    tests.foreach { case (name, sql) =>
      try {
        val n = spark.sql(sql).collect().length
        println(s"SQLPROBE $name OK rows=$n")
      } catch { case e: Throwable => println(s"SQLPROBE $name ERR ${e.getMessage.take(150)}") }
    }
    spark.stop()
  }
}
