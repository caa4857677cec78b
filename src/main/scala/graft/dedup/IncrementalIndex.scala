package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.lake.SnapshotTable

/** Incremental near-dup index maintenance: every appended document
  * batch commits BOTH the documents and their MinHash band keys as
  * paired snapshot versions. Signatures are computed only for the new
  * batch — at 100 TB you never re-hash the corpus to keep the dedup
  * index current — yet any version of the index equals what a
  * from-scratch build over the same documents would produce
  * (signatures are pure functions of the text).
  */
object IncrementalIndex {

  /** (band, band_key, doc_id) rows for one batch — same banding as
    * Dedup.minhashBands, derived from the batch alone.
    */
  def bandsFor(batch: DataFrame): DataFrame = {
    GraftFunctions.register(batch.sparkSession)
    batch.select(col("doc_id"), expr("graft_minhash(text, 64, 3)").as("sig"))
      .select(col("doc_id"), posexplode(expr(Dedup.BandExpr)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
  }

  /** Append a document batch and its index rows as paired commits.
    * Returns (docsVersion, indexVersion).
    */
  def append(s: SparkSession, docsRoot: String, indexRoot: String, batch: DataFrame): (Int, Int) = {
    val dv = SnapshotTable.commit(s, docsRoot, batch)
    val iv = SnapshotTable.commit(s, indexRoot, bandsFor(batch))
    (dv, iv)
  }

  /** Candidate near-dup pairs at the CURRENT index version — a
    * bucket self-join over the maintained index, no re-hashing.
    */
  def candidatePairs(s: SparkSession, indexRoot: String): DataFrame = {
    val idx = SnapshotTable.read(s, indexRoot)
    idx.as("a").join(idx.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }
}
