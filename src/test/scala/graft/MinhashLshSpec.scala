package graft

import org.apache.spark.sql.functions._

/** Equivalence pin for dedup_minhash_lsh's r21 rewrite (exact-dup
  * pre-pass + per-group neighbor-min election): on a duplicate-dense
  * corpus — exact copies, near-dups of copies, NULL texts, short
  * texts — the rep-collapsed election must be BIT-EQUAL to the
  * pre-r21 doc-level algorithm (bands over every doc, capped pairs,
  * per-doc min-partner election), which is reproduced inline here as
  * the reference. No bucket cap fires at this corpus size, which is
  * exactly the regime the equivalence proof covers (and the regime
  * the DuckDB oracle gates).
  */
class MinhashLshSpec extends SparkSpec {
  import spark.implicits._

  test("rep election matches the doc-level reference on a duplicate-dense corpus") {
    functions.GraftFunctions.register(spark)
    val dir = "/tmp/graft_test/minhash_lsh_src"
    val base = sources.Tables.load(spark, sf(), "documents")
      .select("doc_id", "text").filter(col("doc_id") < 200)
    // exact copies (collide in all 16 bands at doc level), near-dups
    // of copies (cross-GROUP verified edges), nulls (no signature,
    // forever singletons), and identical short texts (single
    // whole-text shingle)
    val copies = base.filter(col("doc_id") < 60)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val copies2 = base.filter(col("doc_id") < 30)
      .select((col("doc_id") + 20000).as("doc_id"), col("text"))
    val nearDups = base.filter(col("doc_id") < 20)
      .select((col("doc_id") + 30000).as("doc_id"),
        concat(col("text"), lit(" extratoken")).as("text"))
    val edge = Seq(
      (40000L, null.asInstanceOf[String]), (40001L, null.asInstanceOf[String]),
      (40002L, "ab"), (40003L, "ab"), (40004L, "xy"))
      .toDF("doc_id", "text")
    val corpus = base.unionByName(copies).unionByName(copies2)
      .unionByName(nearDups).unionByName(edge)
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = dedup.Dedup.minhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq

    // pre-r21 doc-level reference: bands over EVERY doc, capped pairs,
    // exact-Jaccard verify, per-doc min-partner election
    val bands = corpus
      .select(col("doc_id").as("id"), expr("graft_minhash(text, 64, 3)").as("sig"))
      .select(col("id"), posexplode(expr(
        "transform(sequence(0, 15), b -> slice(sig, b*4+1, 4))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val verified = dedup.Dedup.cappedPairs(bands)
      .join(corpus.select(col("doc_id").as("id_a"), col("text").as("text_a")), Seq("id_a"))
      .join(corpus.select(col("doc_id").as("id_b"), col("text").as("text_b")), Seq("id_b"))
      .filter(expr("graft_ngram_jaccard(text_a, text_b, 3) >= 0.8"))
      .select("id_a", "id_b")
    val reps = verified.groupBy(col("id_b").as("doc_id")).agg(min("id_a").as("rep_cand"))
    val want = corpus.select("doc_id").join(reps, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("rep_cand"), col("doc_id")).as("rep_id"),
        coalesce(col("rep_cand") =!= col("doc_id"), lit(false)).as("is_dup"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq

    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w, s"mismatch: got $g want $w") }
    // sanity on the injected structure: every copy is a dup of its base
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(10005L)._3 === true, "an exact copy must be flagged a dup")
    assert(byId(40001L) === ((40001L, 40001L, false)), "null texts stay singletons")
    assert(byId(40003L)._2 === 40002L, "identical short texts merge")
  }
}
