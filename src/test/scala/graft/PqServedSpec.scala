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
}
