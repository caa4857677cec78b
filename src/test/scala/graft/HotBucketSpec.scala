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

  test("hot bucket emits a linear star, small buckets emit all pairs") {
    // one 1000-member bucket + one 4-member bucket, cap = 10
    val bands = ((0L until 1000L).map(i => (i, 0, 77L)) ++
        Seq(5000L, 5001L, 5002L, 5003L).map(i => (i, 1, 88L)))
      .toDF("id", "band", "band_key")
    val pairs = Dedup.cappedPairs(bands, cap = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val hot = pairs.filter(_._1 < 5000L)
    val small = pairs.filter(_._1 >= 5000L).toSet
    // star: 999 pairs, all anchored at the bucket min — not 499500
    assert(hot.length === 999)
    assert(hot.forall(_._1 === 0L))
    assert(hot.map(_._2).sorted.toSeq === (1L until 1000L))
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
    // hot bucket (20 > 5): star rows carry the min row's payload on _a
    val hot = pairs.filter(_._3 < 100L)
    assert(hot.length === 19)
    assert(hot.forall(p => p._1 === 0L && p._2 === 0L && p._4 === p._3 * 10))
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
}
