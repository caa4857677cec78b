package graft

import org.apache.spark.sql.functions._
import graft.ann.{Ann, PqIndex}
import graft.lake.SnapshotTable

/** The served IVF-PQ path must be rank-identical to training both
  * quantizer levels inside the query, must reuse the stored artifact
  * across calls, and must open only the probed lists' code files.
  */
class PqServedSpec extends SparkSpec {

  private val dir = sf("0.001")
  private def corpus = graft.sources.Tables.load(spark, dir, "embeddings")
    .select("vec_id", "embedding")

  private def queries(mod: Int) = corpus.filter(col("vec_id") % mod === 0)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  test("stored-index ADC ranks equal in-query-trained ranks (and survive re-serve)") {
    SnapshotTable.drop(spark, s"${PqIndex.indexRoot(dir)}/coarse") // force fresh build
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val inQuery = key(Ann.pqKnn(spark, corpus, col("vec_id") % 25 === 0,
      k = 3, m = 4, ksub = 16, nLists = 16, nProbes = 4))
    val root = PqIndex.ensure(spark, dir, corpus, m = 4, ksub = 16, nLists = 16)
    val served = key(PqIndex.serve(spark, root, queries(25), k = 3, nProbes = 4))
    assert(served === inQuery)
    val vBefore = SnapshotTable.currentVersion(spark, s"$root/coarse")
    val again = key(PqIndex.serve(spark, PqIndex.ensure(spark, dir, corpus,
      m = 4, ksub = 16, nLists = 16), queries(25), k = 3, nProbes = 4))
    assert(again === inQuery)
    assert(SnapshotTable.currentVersion(spark, s"$root/coarse") === vBefore,
      "re-serve must not rebuild the index")
  }

  test("probing fetches only the code files holding the probed lists") {
    val root = PqIndex.ensure(spark, dir, corpus, m = 4, ksub = 16, nLists = 16)
    val codesRoot = s"$root/codes"
    val all = SnapshotTable.read(spark, codesRoot)
    val oneCid = all.select("cid").distinct().orderBy("cid").head.getLong(0)
    val pruned = SnapshotTable.readWhere(spark, codesRoot, col("cid") === oneCid)
    assert(pruned.inputFiles.length < all.inputFiles.length,
      s"single-list probe opened all ${all.inputFiles.length} code files")
    assert(pruned.count() === all.filter(col("cid") === oneCid).count())
  }

  test("non-dense codebook codes (Lloyd-dropped clusters) score by value") {
    import spark.implicits._
    // three exact-duplicate patterns ordered so the positional seeds
    // are [A, A, B, C]: Lloyd drops the duplicate seed (code 1), so
    // the surviving codes {0, 2, 3} have a GAP below live codes — a
    // position-indexed distance row would read code 3's distance for
    // code 2 and fall off the row for code 3
    val a = Array(2f, 0f, 0f, 0f)
    val b = Array(1f, 0f, 0f, 0f)
    val c = Array(-1f, 0f, 0f, 0f)
    val pattern = Seq(a, a, b, c, b, c, a, b, c)
    val corpus = pattern.zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("vec_id", "embedding")
    val out = Ann.pqKnn(spark, corpus, col("vec_id") === 0, k = 8,
      m = 1, ksub = 4, nLists = 1, nProbes = 1)
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos")))
    assert(out.length === 8, s"all 8 neighbors must score (no null lookups): ${out.toSeq}")
    val byId = out.toMap
    // exact duplicates of the query (pattern A) score 0, B scores
    // −|A−B|² = −1, C scores −|A−C|² = −9 — the VALUE-correct table
    assert(Seq(1L, 6L).forall(id => byId(id) === 0.0), out.toSeq.toString)
    assert(Seq(2L, 4L, 7L).forall(id => byId(id) === -1.0), out.toSeq.toString)
    assert(Seq(3L, 5L, 8L).forall(id => byId(id) === -9.0), out.toSeq.toString)
  }

  test("ksub boundary: 128 codewords fit TINYINT codes, 129 is refused loudly") {
    import spark.implicits._
    // codes are 0..ksub-1 stored TINYINT: max code 127 ⇒ ksub=128 is
    // the last legal value; 129 would wrap negative and null the
    // serve-side dense-array lookup
    val e129 = intercept[IllegalArgumentException] {
      Ann.pqKnn(spark, corpus, col("vec_id") % 25 === 0,
        k = 3, m = 4, ksub = 129, nLists = 4, nProbes = 1)
    }
    assert(e129.getMessage.contains("TINYINT"), e129.getMessage)
    val tiny = (0 until 16).map(i =>
      (i.toLong, Array.tabulate(4)(d => (i * 4 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val out = Ann.pqKnn(spark, tiny, col("vec_id") === 0, k = 3,
      m = 1, ksub = 128, nLists = 1, nProbes = 1).collect()
    assert(out.nonEmpty, "ksub=128 must train, encode and serve")
    assert(out.forall(!_.isNullAt(3)),
      "no null ADC scores: every stored code must resolve in the dense table")
  }
}
