package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Quantitative gates for the registry entries whose output is
  * approximate or non-SQL-expressible ("rows-only" in the
  * correctness report). Rows-only must still mean GATED: each test
  * pins a numeric quality bar on the exact code the registry runs.
  */
class QuantGateSpec extends SparkSpec {
  import spark.implicits._

  test("q_approx_distinct: HLL within 5% of exact per group") {
    val rows = sources.Tables.load(spark, sf("0.01"), "events")
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id")).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      val rel = math.abs(approx - exact) / exact
      assert(rel <= 0.05,
        s"${r.getString(0)}: HLL=$approx exact=$exact rel err $rel > 5%")
    }
  }

  test("text_fingerprint: shift/edit pairs collide, high-entropy docs never collide") {
    functions.GraftFunctions.register(spark)
    // high-entropy planted corpus: discrimination is only meaningful
    // when docs don't share 8-byte windows by construction (the
    // natural documents table is template-generated, so unrelated
    // docs legitimately share boilerplate min windows)
    val rnd = new scala.util.Random(7)
    val texts = (0L until 200L).map { i =>
      (i, (1 to 80).map(_ => rnd.alphanumeric.take(6).mkString).mkString(" "))
    }
    val base = texts.toDF("doc_id", "text")
    def fp(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), expr("graft_fingerprint(text, 8)").as("f"))
    val orig = fp(base).withColumnRenamed("f", "f0")
    // shift: leading whitespace moves every byte but adds only k-1 new
    // windows at the seam — the min window almost always survives
    val shifted = fp(base.withColumn("text", concat(lit("   "), col("text"))))
      .withColumnRenamed("f", "f1")
    // edit: one appended token changes only the trailing windows
    val edited = fp(base.withColumn("text", concat(col("text"), lit(" tail"))))
      .withColumnRenamed("f", "f2")
    val joined = orig.join(shifted, "doc_id").join(edited, "doc_id").collect()
    val n = joined.length.toDouble
    val shiftHold = joined.count(r => r.getLong(1) == r.getLong(2)) / n
    val editHold = joined.count(r => r.getLong(1) == r.getLong(3)) / n
    assert(shiftHold >= 0.95, s"shift invariance $shiftHold < 0.95")
    assert(editHold >= 0.90, s"edit robustness $editHold < 0.90")
    // discriminative: unrelated high-entropy docs never share a
    // 64-bit min-window fingerprint
    val collisions = orig.groupBy("f0").count().filter(col("count") > 1).count()
    assert(collisions === 0, s"$collisions cross-doc fingerprint collisions")
  }

  test("mm_phash_neardup: all planted pairs found, zero false positives at hamming<=3") {
    // 30 base payloads of independent random bytes (seeded), each with
    // a planted near-dup (a few trailing bytes appended — most byte
    // 4-grams survive, so the simhash-style pHash stays within 3 bits)
    val rnd = new scala.util.Random(42)
    val bases = (0L until 30L).map { i =>
      val b = new Array[Byte](2000)
      rnd.nextBytes(b)
      (i, b)
    }
    val dups = bases.map { case (i, b) =>
      (i + 1000L, b ++ Array[Byte](1, 2, 3))
    }
    val corpus = (bases ++ dups).toDF("doc_id", "payload")
    val pairs = Multimodal.phashPairs(corpus)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = bases.map { case (i, _) => (i, i + 1000L) }.toSet
    // recall 1.0 on the planted pairs
    val missed = planted.diff(pairs)
    assert(missed.isEmpty, s"planted near-dups missed: $missed")
    // precision 1.0: random payloads are ~32 bits apart — any other
    // pair is a false positive
    val extras = pairs.diff(planted)
    assert(extras.isEmpty, s"false positives: $extras")
  }
}
