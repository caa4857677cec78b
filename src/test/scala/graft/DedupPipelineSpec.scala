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

  test("a 10⁴-copy hot text collapses to one cluster through the pre-pass") {
    // the shape that OOMs a window-based pre-pass: one boilerplate
    // text dominating the corpus. The groupBy rep election partial-
    // aggregates it map-side; the pipeline must return one cluster
    // keeping only the min id, plus untouched singletons.
    val hot = spark.range(0, 10000)
      .select(col("id").as("doc_id"),
        lit("boilerplate navigation footer repeated on every page of the crawl").as("text"))
    val distinctDocs = spark.range(10000, 10010)
      .select(col("id").as("doc_id"),
        concat(lit("unique document body number "), col("id"),
          lit(" with enough distinct words to never collide")).as("text"))
    val out = dedup.Dedup.dedupCorpus(spark, hot.unionByName(distinctDocs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length === 10010)
    val hotRows = out.filter(_._1 < 10000)
    assert(hotRows.forall(_._2 === 0L), "all copies must join doc 0's cluster")
    assert(hotRows.filter(_._3).map(_._1).toSeq === Seq(0L))
    out.filter(_._1 >= 10000).foreach { case (id, comp, kept) =>
      assert(comp === id && kept, s"distinct doc $id must stay a kept singleton")
    }
  }

  test("degenerate texts keep doc-level semantics: identical shorts merge, nulls stay singletons") {
    // a text below the shingle size gets ONE shingle — the hash of the
    // whole text (HashExprs.shingleHashes) — so the doc-level pipeline
    // (and the DuckDB oracle) merges identical short texts (Jaccard 1)
    // and keeps different ones apart (Jaccard 0): exact-equality
    // semantics the sha-256 pre-pass reproduces bit-for-bit. NULL
    // texts have no signature at all in the doc-level path (null
    // propagates, no bands), so each must stay its own singleton — an
    // ungated sha2 pre-pass would collapse them into one giant
    // all-nulls cluster instead.
    val corpus = Seq(
      (1L, "ab"), (2L, "ab"),           // identical, below 3-gram size
      (3L, ""), (4L, "xy"),             // different, still sub-size
      (5L, null.asInstanceOf[String]),  // nulls
      (6L, null.asInstanceOf[String]),
      (7L, "a perfectly ordinary document long enough to shingle")
    ).toDF("doc_id", "text")
    val out = dedup.Dedup.dedupCorpus(spark, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length === 7)
    val byId = out.map(t => t._1 -> t).toMap
    // the identical pair merges, min id kept
    assert(byId(1L)._2 === 1L && byId(1L)._3)
    assert(byId(2L)._2 === 1L && !byId(2L)._3, "identical short texts must merge")
    // everything else — different shorts, nulls, the real doc — is
    // its own kept singleton
    Seq(3L, 4L, 5L, 6L, 7L).foreach { id =>
      assert(byId(id)._2 === id, s"doc $id must be its own component")
      assert(byId(id)._3, s"doc $id must be kept")
    }
  }
}
