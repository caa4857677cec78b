package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("point-in-interval: lo inclusive, hi exclusive, overlaps multiply") {
    val points = Seq(0.0, 5.0, 9.999, 10.0, 15.0, 25.0).toDF("x")
    val intervals = Seq(
      ("a", 0.0, 10.0),   // [0,10)
      ("b", 5.0, 15.0),   // [5,15) — overlaps a
      ("c", 10.0, 10.0)   // empty
    ).toDF("iv", "lo", "hi")
    val got = RangeJoin
      .pointInInterval(points, intervals, col("x"), col("lo"), col("hi"), 4.0)
      .select("x", "iv").collect().map(r => (r.getDouble(0), r.getString(1))).toSet
    assert(got === Set(
      (0.0, "a"), (5.0, "a"), (5.0, "b"), (9.999, "a"), (9.999, "b"),
      (10.0, "b")))
  }

  test("interval spanning many bins matches each point exactly once") {
    val points = Seq(1.0, 50.0, 99.0).toDF("x")
    val wide = Seq(("w", 0.0, 100.0)).toDF("iv", "lo", "hi")
    val got = RangeJoin
      .pointInInterval(points, wide, col("x"), col("lo"), col("hi"), 2.0)
      .groupBy("x").count().collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
    assert(got === Map(1.0 -> 1L, 50.0 -> 1L, 99.0 -> 1L))
  }

  test("negative coordinates bin correctly") {
    val points = Seq(-7.5, -0.1, 0.1).toDF("x")
    val intervals = Seq(("n", -10.0, 0.0)).toDF("iv", "lo", "hi")
    val got = RangeJoin
      .pointInInterval(points, intervals, col("x"), col("lo"), col("hi"), 3.0)
      .select("x").collect().map(_.getDouble(0)).toSet
    assert(got === Set(-7.5, -0.1))
  }
}
