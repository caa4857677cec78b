package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** The corpus-scale LSH failure mode (VERDICT r3 item 1): boilerplate
  * shared by thousands of docs puts them all in ONE band bucket, and
  * an uncapped band self-join is quadratic on that single skewed key.
  * [[Dedup.cappedPairs]] must bound candidates at O(members) per hot
  * bucket while keeping the bucket connected and small buckets exact.
  */
class HotBucketSpec extends SparkSpec {
  import spark.implicits._

  test("hot bucket emits a linear star + chain, small buckets emit all pairs") {
    // one 1000-member bucket + one 4-member bucket, cap = 10
    val bands = ((0L until 1000L).map(i => (i, 0, 77L)) ++
        Seq(5000L, 5001L, 5002L, 5003L).map(i => (i, 1, 88L)))
      .toDF("id", "band", "band_key")
    val pairs = Dedup.cappedPairs(bands, cap = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val hot = pairs.filter(_._1 < 5000L)
    val small = pairs.filter(_._1 >= 5000L).toSet
    // star (999 anchored at the min) + chain (999 consecutive), the
    // shared (0,1) emitted once — still O(members), not 499500
    assert(hot.length === 1997)
    val star = hot.filter(_._1 === 0L)
    assert(star.map(_._2).sorted.toSeq === (1L until 1000L))
    // chain: consecutive ids link even if the min never verifies
    assert(hot.count(p => p._2 === p._1 + 1) === 999)
    // small bucket keeps the exact all-pairs candidate set
    assert(small === Set((5000L, 5001L), (5000L, 5002L), (5000L, 5003L),
      (5001L, 5002L), (5001L, 5003L), (5002L, 5003L)))
  }

  test("payload columns ride along on both star and all-pairs sides") {
    val bands = ((0L until 20L).map(i => (i, 0, 1L, i * 10)) ++
        Seq((100L, 0, 2L, 7L), (101L, 0, 2L, 8L)))
      .toDF("id", "band", "band_key", "sig")
    val pairs = Dedup.cappedPairs(bands, cap = 5)
      .select("id_a", "sig_a", "id_b", "sig_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // hot bucket (20 > 5): 19 star + 19 chain pairs, (0,1) shared;
    // every pair carries ITS row's payload on both sides
    val hot = pairs.filter(_._3 < 100L)
    assert(hot.length === 37)
    assert(hot.forall(p => p._2 === p._1 * 10 && p._4 === p._3 * 10))
    assert(hot.count(_._1 === 0L) === 19)
    assert(hot.count(p => p._3 === p._1 + 1) === 19)
    // small bucket: payloads on both sides
    assert(pairs.filter(_._3 >= 100L).toSeq === Seq((100L, 7L, 101L, 8L)))
  }

  test("a pair seen in both a hot and a small bucket is emitted once") {
    val bands = (
      (0L until 30L).map(i => (i, 0, 1L)) ++          // hot (cap 10): star to 0
        Seq((0L, 1, 2L), (1L, 1, 2L), (29L, 1, 2L))   // small: all pairs incl. (0,1)
      ).toDF("id", "band", "band_key")
    val pairs = Dedup.cappedPairs(bands, cap = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length === pairs.distinct.length)
    assert(pairs.count(p => p == (0L, 1L)) === 1)
    // the small-bucket-only pair (1,29) survives alongside the star
    assert(pairs.contains((1L, 29L)))
  }

  test("rows with a null band_key never pair (old null-unsafe join semantics)") {
    val bands = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, 0, java.lang.Long.valueOf(7L)),
        org.apache.spark.sql.Row(2L, 0, java.lang.Long.valueOf(7L)),
        org.apache.spark.sql.Row(3L, 0, null),
        org.apache.spark.sql.Row(4L, 0, null),
        org.apache.spark.sql.Row(5L, 0, null))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("band_key", org.apache.spark.sql.types.LongType))))
    val pairs = Dedup.cappedPairs(bands, cap = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // the 3 null-key rows would exceed cap=2 and star-pair if bucketed
    assert(pairs.toSet === Set((1L, 2L)))
  }

  test("10k-doc identical-boilerplate corpus completes with bounded candidates and one cluster") {
    // every doc identical → every one of the 16 minhash bands is one
    // 10k-member bucket; uncapped this is 16 × 50M pairs on one key
    val boiler = (0L until 10000L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog boilerplate"))
    val distinctDocs = (20000L until 20010L).map(i => (i, s"unique document number $i with content ${i * 7}"))
    val corpus = (boiler ++ distinctDocs).toDF("doc_id", "text")
    val out = Dedup.dedupCorpus(spark, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // all 10k boilerplate docs collapse to one cluster, min id kept
    val boilerRows = out.filter(_._1 < 10000L)
    assert(boilerRows.length === 10000)
    assert(boilerRows.map(_._2).distinct.toSeq === Seq(0L))
    assert(boilerRows.filter(_._3).map(_._1).toSeq === Seq(0L))
    // the distinct docs survive untouched
    assert(out.filter(_._1 >= 20000L).forall(t => t._3 && t._2 === t._1))
  }

  test("dedup = false skips the distinct but elects identical reps") {
    // docs sharing keys across SEVERAL bands — the duplicate-pair case
    val bands = (for {
      id <- 0L until 40L
      band <- 0 until 4
    } yield (id, band, (id % 5) + band * 100L)) // 5 buckets per band, all shared
      .toDF("id", "band", "band_key")
    val deduped = Dedup.cappedPairs(bands, cap = 100)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val raw = Dedup.cappedPairs(bands, cap = 100, dedup = false)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // the raw stream repeats each pair once per colliding band …
    assert(raw.length === 4 * deduped.length)
    assert(raw.distinct.sorted.toSeq === deduped.sorted.toSeq)
    // … and a duplicate-insensitive min-partner election (the simhash
    // consumer) is IDENTICAL on both streams
    def reps(ps: Seq[(Long, Long)]): Map[Long, Long] =
      ps.groupBy(_._2).map { case (b, g) => b -> g.map(_._1).min }
    assert(reps(raw.toSeq) === reps(deduped.toSeq))
  }
}
