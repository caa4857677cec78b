package graft

import org.apache.spark.sql.functions._

/** Positive-path test of the end-to-end dedup product: the corpus has
  * no real near-dups, so inject them and verify the pipeline clusters
  * and culls exactly those.
  */
class DedupPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("injected near-duplicates are clustered and exactly one doc per cluster is kept") {
    val base = sources.Tables.load(spark, sf(), "documents")
      .select("doc_id", "text").filter(col("doc_id") < 100)
    // near-dups of docs 0..9: same text with one appended token
    val dups = base.filter(col("doc_id") < 10)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" extratoken")).as("text"))
    val corpus = base.unionByName(dups)
    val out = dedup.Dedup.dedupCorpus(spark, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = out.map(t => t._1 -> t).toMap
    // every injected dup lands in its original's cluster and is culled
    // (the original may itself share a cluster with a NATURAL near-dup
    // — the corpus contains them by design, e.g. docs 8 and 12)
    (0L until 10L).foreach { i =>
      assert(byId(i + 10000)._2 === byId(i)._2,
        s"dup of $i clustered to ${byId(i + 10000)._2}, original in ${byId(i)._2}")
      assert(byId(i + 10000)._3 === false, s"injected dup of $i must be culled")
    }
    // global invariant: exactly one kept doc per cluster, and it is
    // the cluster's minimum id
    out.groupBy(_._2).foreach { case (comp, members) =>
      val kept = members.filter(_._3)
      assert(kept.length === 1, s"cluster $comp kept ${kept.length}")
      assert(kept.head._1 === members.map(_._1).min)
    }
    // no injected doc survives
    assert(out.filter(_._3).forall(_._1 < 10000))
  }
}
