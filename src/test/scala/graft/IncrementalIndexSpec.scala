package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, IncrementalIndex}
import graft.lake.SnapshotTable

class IncrementalIndexSpec extends SparkSpec {

  test("incrementally maintained index is equivalent to a from-scratch rebuild") {
    val docsRoot = "/tmp/graft_test/inc_docs"
    val indexRoot = "/tmp/graft_test/inc_index"
    val oneDocsRoot = "/tmp/graft_test/inc_docs_one"
    val oneIndexRoot = "/tmp/graft_test/inc_index_one"
    Seq(docsRoot, indexRoot, oneDocsRoot, oneIndexRoot)
      .foreach(SnapshotTable.drop(spark, _))
    val all = sources.Tables.load(spark, sf(), "documents").select("doc_id", "text")
    val batch1 = all.filter(col("doc_id") < 250)
    val batch2 = all.filter(col("doc_id") >= 250)

    val (d1, i1) = IncrementalIndex.append(spark, docsRoot, indexRoot, batch1)
    val (d2, i2) = IncrementalIndex.append(spark, docsRoot, indexRoot, batch2)
    assert((d1, i1, d2, i2) === (1, 1, 2, 2))

    // exact rows are pure per-doc: one per document, identical to a
    // single-append build over the same corpus
    val maintained = SnapshotTable.read(spark, indexRoot)
    IncrementalIndex.append(spark, oneDocsRoot, oneIndexRoot, all)
    val rebuilt = SnapshotTable.read(spark, oneIndexRoot)
    val exactM = maintained.filter(col("band") === IncrementalIndex.ExactBand)
      .select("doc_id", "exact_key")
    val exactR = rebuilt.filter(col("band") === IncrementalIndex.ExactBand)
      .select("doc_id", "exact_key")
    assert(exactM.count() === all.count())
    assert(exactM.exceptAll(exactR).isEmpty && exactR.exceptAll(exactM).isEmpty)

    // band rows: signatures are pure per-doc, so the split-maintained
    // band set covers at least the single-append one (a text recurring
    // across batches is re-signed once per batch; the single build
    // signs only the global rep)
    val bandsM = maintained.filter(col("band") >= 0).select("doc_id", "band", "band_key")
    val bandsR = rebuilt.filter(col("band") >= 0).select("doc_id", "band", "band_key")
    assert(bandsR.exceptAll(bandsM).isEmpty,
      "split-maintained index must cover every from-scratch band row")
    // and every band row belongs to a batch-local content rep —
    // duplicates within a batch never pay the signature pass
    val repIds = IncrementalIndex.members(spark, indexRoot)
      .filter(col("doc_id") === col("rep_id")).select("doc_id")
    assert(bandsR.join(repIds, Seq("doc_id"), "left_anti").isEmpty)

    // time travel: index v1 covers exactly batch1
    assert(SnapshotTable.read(spark, indexRoot, 1).select("doc_id").distinct().count()
      === batch1.count())

    // the QUERY result is split-invariant: verified pairs from the
    // two-batch index equal the single-append truth
    val pairsSplit = Dedup.incrementalPairs(spark, docsRoot, indexRoot)
    val pairsOne = Dedup.incrementalPairs(spark, oneDocsRoot, oneIndexRoot)
    assert(pairsSplit.exceptAll(pairsOne).isEmpty && pairsOne.exceptAll(pairsSplit).isEmpty)

    // candidate pairs derive from the maintained index without re-hashing
    val cand = IncrementalIndex.candidatePairs(spark, indexRoot)
    assert(cand.filter(col("id_a") === col("id_b")).isEmpty)
  }

  test("duplicate-heavy batches settle exact pairs without band candidates") {
    import spark.implicits._
    val docsRoot = "/tmp/graft_test/inc_docs_dup"
    val indexRoot = "/tmp/graft_test/inc_index_dup"
    Seq(docsRoot, indexRoot).foreach(SnapshotTable.drop(spark, _))
    val boiler = "the same boilerplate page body repeated across the whole crawl batch"
    val batch1 = (0L until 40L).map(i => (i, boiler)).toDF("doc_id", "text")
    val batch2 = ((40L until 80L).map(i => (i, boiler)) :+
      (80L, "one genuinely distinct document long enough to shingle") :+
      (81L, null.asInstanceOf[String]) :+
      (82L, null.asInstanceOf[String])).toDF("doc_id", "text")
    IncrementalIndex.append(spark, docsRoot, indexRoot, batch1)
    IncrementalIndex.append(spark, docsRoot, indexRoot, batch2)
    // band rows exist only for the batch reps: doc 0, doc 40 (first
    // occurrence per batch), doc 80; nulls have no signature
    val bands = SnapshotTable.read(spark, indexRoot).filter(col("band") >= 0)
    assert(bands.select("doc_id").distinct().as[Long].collect().toSet === Set(0L, 40L, 80L))
    // global reps: only doc 0 and doc 80 carry candidate-eligible
    // bands, so the bucket join sees 2 docs, not 80
    val pairs = Dedup.incrementalPairs(spark, docsRoot, indexRoot).collect()
    // all 80*79/2 identical pairs present at jaccard 1, nulls absent
    assert(pairs.length === 80 * 79 / 2)
    assert(pairs.forall(r => r.getDouble(2) === 1.0))
    assert(pairs.forall(r => r.getLong(0) < 80L && r.getLong(1) < 80L))
  }
}
