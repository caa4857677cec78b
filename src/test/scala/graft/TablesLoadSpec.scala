package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}

import graft.sources.Tables

/** Loader contract: whatever physical layout the driver writes
  * `events.ts` in (TIMESTAMP(NANOS) surfaced as long-of-nanos,
  * TIMESTAMP(MICROS) as Timestamp or TimestampNTZ), `Tables.load`
  * must yield a µs-precision session-TZ TimestampType column. A
  * driver-side regeneration that changes the physical type must fail
  * HERE with a readable message, not in 85 downstream queries
  * (round-8 incident: micros testdata vs a nanos-only loader took
  * out every events-dependent registry entry).
  */
class TablesLoadSpec extends SparkSpec {

  for (s <- Seq("0.001", "0.01", "0.1")) {
    test(s"events.ts loads as TimestampType at sf$s (physical layout independent)") {
      val df = Tables.load(spark, sf(s), "events")
      val tsField = df.schema("ts")
      assert(tsField.dataType == TimestampType,
        s"Tables.load must normalize events.ts to TimestampType; got ${tsField.dataType}. " +
          "The driver likely regenerated /root/testdata with a new physical ts type — " +
          "extend the match in Tables.load, not the 85 queries downstream.")
      // Sanity: values are real (non-null, within a plausible decade).
      // Bounds collected as ISO strings so the assertion is immune to
      // the session's java8API datetime setting (other suites flip it).
      val r = df.agg(
        count(when(col("ts").isNull, 1)).as("nulls"),
        date_format(min("ts"), "yyyy-MM-dd").as("lo"),
        date_format(max("ts"), "yyyy-MM-dd").as("hi")).head()
      assert(r.getLong(0) == 0L, "events.ts must be non-null")
      val (lo, hi) = (r.getString(1), r.getString(2))
      assert(lo >= "2000-01-01" && hi <= "2100-01-01",
        s"events.ts range [$lo, $hi] implausible — unit mismatch in the loader?")
    }
  }

  test("all tables load and every table is registerable") {
    Tables.registerAll(spark, sf())
    for (t <- Tables.all) {
      assert(spark.table(t).count() > 0, s"table $t must be non-empty at sf0.001")
    }
  }

  test("nanos-as-long physical layout still normalizes (synthetic)") {
    // Simulate the round-1 driver layout: ts as long of NANOS. The
    // loader sees LongType (nanosAsLong surfaces TIMESTAMP(NANOS) the
    // same way) and must rebuild µs timestamps.
    val dir = java.nio.file.Files.createTempDirectory("graft_tables_nanos").toString
    val micros = 1700000000000000L // 2023-11-14T22:13:20Z in µs
    spark.range(3).select(
      (lit(micros) + col("id")).cast(LongType).*(lit(1000L)).as("ts"),
      col("id").as("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(unix_micros(col("ts"))).orderBy("ts").collect().map(_.getLong(0))
    assert(got.sameElements(Array(micros, micros + 1, micros + 2)))
  }
}
