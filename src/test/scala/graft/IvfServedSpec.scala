package graft

import org.apache.spark.sql.functions._
import graft.ann.{Ann, IvfIndex}
import graft.lake.SnapshotTable

/** VERDICT r6 item 5: serving from the persisted IVF index must be
  * rank-identical to training inside the query, and the probe read
  * must open only the files holding the probed inverted lists.
  */
class IvfServedSpec extends SparkSpec {

  private val dir = sf("0.001")
  private def corpus = graft.sources.Tables.load(spark, dir, "embeddings")
    .select("vec_id", "embedding")

  test("stored-index ranks equal in-query-trained ranks (and survive re-serve)") {
    SnapshotTable.drop(spark, IvfIndex.indexRoot(dir)) // force a fresh build
    val pred = col("vec_id") % 25 === 0
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val inQuery = key(Ann.ivfKnn(spark, corpus, pred, k = 3, nLists = 16, nProbes = 4))
    val served = key(IvfIndex.serve(spark, dir, corpus, pred, k = 3, nLists = 16, nProbes = 4))
    assert(served === inQuery)
    // second call reuses the stored artifact (fingerprint unchanged)
    val centRoot = s"${IvfIndex.indexRoot(dir)}/centroids"
    val vBefore = SnapshotTable.currentVersion(spark, centRoot)
    val servedAgain = key(IvfIndex.serve(spark, dir, corpus, pred, k = 3, nLists = 16, nProbes = 4))
    assert(servedAgain === inQuery)
    assert(SnapshotTable.currentVersion(spark, centRoot) === vBefore,
      "re-serve must not rebuild the index")
  }

  test("probing one list opens only the files that hold it (bloom-pruned fetch)") {
    IvfIndex.serve(spark, dir, corpus, col("vec_id") % 25 === 0,
      k = 3, nLists = 16, nProbes = 4) // ensure built
    val listRoot = s"${IvfIndex.indexRoot(dir)}/lists"
    val all = SnapshotTable.read(spark, listRoot)
    val oneCid = all.select("cid").distinct().orderBy("cid").head.getLong(0)
    val pruned = SnapshotTable.readWhere(spark, listRoot, col("cid") === oneCid)
    assert(pruned.inputFiles.length < all.inputFiles.length,
      s"single-list probe opened all ${all.inputFiles.length} files")
    // and the pruned read is still correct
    assert(pruned.count() === all.filter(col("cid") === oneCid).count())
  }
}
