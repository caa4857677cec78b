package graft

import org.apache.spark.sql.functions._

import graft.dedup.IncrementalIndex
import graft.lake.SnapshotTable

class IncrementalIndexSpec extends SparkSpec {

  test("incrementally maintained index equals a from-scratch rebuild") {
    val docsRoot = "/tmp/graft_test/inc_docs"
    val indexRoot = "/tmp/graft_test/inc_index"
    SnapshotTable.drop(spark, docsRoot)
    SnapshotTable.drop(spark, indexRoot)
    val all = sources.Tables.load(spark, sf(), "documents").select("doc_id", "text")
    val batch1 = all.filter(col("doc_id") < 250)
    val batch2 = all.filter(col("doc_id") >= 250)

    val (d1, i1) = IncrementalIndex.append(spark, docsRoot, indexRoot, batch1)
    val (d2, i2) = IncrementalIndex.append(spark, docsRoot, indexRoot, batch2)
    assert((d1, i1, d2, i2) === (1, 1, 2, 2))

    // current index == signatures recomputed over the full docs table
    val maintained = SnapshotTable.read(spark, indexRoot)
    val rebuilt = IncrementalIndex.bandsFor(SnapshotTable.read(spark, docsRoot))
    assert(maintained.count() === all.count() * 16)
    assert(maintained.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(maintained).isEmpty)

    // and time travel: index v1 covers exactly batch1
    assert(SnapshotTable.read(spark, indexRoot, 1).select("doc_id").distinct().count()
      === batch1.count())

    // candidate pairs derive from the maintained index without re-hashing
    val cand = IncrementalIndex.candidatePairs(spark, indexRoot)
    assert(cand.filter(col("id_a") === col("id_b")).isEmpty)
  }
}
