package graft

import java.sql.Timestamp

import graft.plans.AsOf

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof picks most recent right row at or before left time, null when none") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3")) // no view for user 2
      .toDF("uid", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), "v1"),
      (1L, ts("2024-01-01 11:59:59"), "v2"),
      (3L, ts("2024-01-01 08:00:00"), "v3"))
      .toDF("r_uid", "r_t", "r_tag")
    val out = AsOf.join(left, right, "uid", "r_uid", "t", "r_t")
      .select("tag", "r_tag").collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out === Map("p1" -> "v1", "p2" -> "v2", "p3" -> null))
  }

  test("exact time equality matches (<= semantics)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("uid", "t", "tag")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), "v")).toDF("r_uid", "r_t", "r_tag")
    val out = AsOf.join(left, right, "uid", "r_uid", "t", "r_t")
      .select("r_tag").collect()(0).getString(0)
    assert(out === "v")
  }

  test("forward as-of picks the earliest right row at or after left time") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 11:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3")) // user 2 has no later view
      .toDF("uid", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:30:00"), "v1"),
      (1L, ts("2024-01-01 12:00:00"), "v2"),
      (2L, ts("2024-01-01 08:00:00"), "v0"))
      .toDF("r_uid", "r_t", "r_tag")
    val out = AsOf.join(left, right, "uid", "r_uid", "t", "r_t", forward = true)
      .select("tag", "r_tag").collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out === Map("p1" -> "v1", "p2" -> "v2", "p3" -> null))
  }

  test("tolerance nulls matches outside the bound (both directions)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("uid", "t", "tag")
    val right = Seq((1L, ts("2024-01-01 08:00:00"), "old"),
      (1L, ts("2024-01-01 13:00:00"), "late")).toDF("r_uid", "r_t", "r_tag")
    val hourMicros = 3600L * 1000000L
    val back = AsOf.join(left, right, "uid", "r_uid", "t", "r_t",
      toleranceMicros = Some(hourMicros)) // nearest predecessor is 2h old -> null
    assert(back.select("r_tag").collect()(0).isNullAt(0))
    val backWide = AsOf.join(left, right, "uid", "r_uid", "t", "r_t",
      toleranceMicros = Some(3 * hourMicros))
    assert(backWide.select("r_tag").collect()(0).getString(0) === "old")
    val fwd = AsOf.join(left, right, "uid", "r_uid", "t", "r_t",
      forward = true, toleranceMicros = Some(2 * hourMicros)) // next is 3h away -> null
    assert(fwd.select("r_tag").collect()(0).isNullAt(0))
  }

  test("nearest as-of picks the closer side; ties go to the predecessor") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "closer_before"),
      (2L, ts("2024-01-01 10:00:00"), "closer_after"),
      (3L, ts("2024-01-01 10:00:00"), "tie"),
      (4L, ts("2024-01-01 10:00:00"), "only_after"),
      (5L, ts("2024-01-01 10:00:00"), "none")).toDF("uid", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:50:00"), "b10"), (1L, ts("2024-01-01 10:30:00"), "a30"),
      (2L, ts("2024-01-01 09:30:00"), "b30"), (2L, ts("2024-01-01 10:10:00"), "a10"),
      (3L, ts("2024-01-01 09:45:00"), "b15"), (3L, ts("2024-01-01 10:15:00"), "a15"),
      (4L, ts("2024-01-01 10:20:00"), "a20")).toDF("r_uid", "r_t", "r_tag")
    val out = AsOf.join(left, right, "uid", "r_uid", "t", "r_t", nearest = true)
      .select("tag", "r_tag").collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out === Map(
      "closer_before" -> "b10", "closer_after" -> "a10",
      "tie" -> "b15", "only_after" -> "a20", "none" -> null))
  }

  test("survives multi-partition shuffle (many keys, interleaved times)") {
    val left = (1L to 500L).map(i => (i % 37, ts(f"2024-01-01 ${(i % 23) + 1}%02d:00:00"), i)).toDF("uid", "t", "id")
    val right = (1L to 300L).map(i => (i % 37, ts(f"2024-01-01 ${(i % 19) + 1}%02d:30:00"), i)).toDF("r_uid", "r_t", "rid")
    val got = AsOf.join(left, right, "uid", "r_uid", "t", "r_t")
    // reference computed the quadratic way
    val expected = left.as("l").join(right.as("r"),
        $"l.uid" === $"r.r_uid" && $"r.r_t" <= $"l.t", "left")
      .groupBy($"l.id").agg(
        org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.struct($"r.r_t", $"r.rid"), $"r.r_t")("rid").as("rid"))
    val g = got.select($"id", $"rid").collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    val e = expected.collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(g === e)
  }

  test("int-backed time columns are rejected up front (DATE would corrupt)") {
    import org.apache.spark.sql.functions.col
    val l = Seq((1L, java.sql.Date.valueOf("2024-01-02"))).toDF("uid", "d")
    val r = Seq((1L, java.sql.Date.valueOf("2024-01-01"), "v")).toDF("r_uid", "r_d", "tag")
    val ex = intercept[IllegalArgumentException] {
      AsOf.join(l, r, "uid", "r_uid", "d", "r_d")
    }
    assert(ex.getMessage.contains("must be TIMESTAMP or BIGINT"))
    // the documented escape hatch works: cast to timestamp
    val ok = AsOf.join(
      l.withColumn("d", col("d").cast("timestamp")),
      r.withColumn("r_d", col("r_d").cast("timestamp")),
      "uid", "r_uid", "d", "r_d")
    assert(ok.select("tag").collect()(0).getString(0) === "v")
  }
}
