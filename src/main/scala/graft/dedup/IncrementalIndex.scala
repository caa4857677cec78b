package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.lake.SnapshotTable

/** Incremental near-dup index maintenance: every appended document
  * batch commits BOTH the documents and their dedup index rows as
  * paired snapshot versions. Signatures are computed only for the new
  * batch — at 100 TB you never re-hash the corpus to keep the dedup
  * index current.
  *
  * The index carries TWO row kinds in one table (schema: doc_id,
  * band, band_key, exact_key):
  *
  *  - an EXACT row per document (band = [[ExactBand]], band_key null,
  *    exact_key = sha-256 of the text, or "#doc_id" for null texts —
  *    [[Dedup.exactContentKey]] semantics). These power the exact-
  *    duplicate pre-pass at query time: duplicate-dense corpora (real
  *    crawls are boilerplate-heavy; at sf5 98% of ScaleData is
  *    byte-identical copies) would otherwise emit every duplicate
  *    pair once per band — 16× — through the bucket join, then
  *    MinHash-verify texts a hash comparison settles.
  *  - MinHash BAND rows (band 0..15, band_key = 4-hash slice,
  *    exact_key null) for the docs that are their batch's FIRST
  *    occurrence of their text (batch-local exact reps). Duplicates
  *    within a batch never pay the signature pass; a text recurring
  *    across batches is re-signed once per batch (its global rep —
  *    the min doc_id of the content cluster — is always a batch-local
  *    rep of its own batch, so query-time rep filtering always finds
  *    band rows for it).
  *
  * Query results are split-invariant: however the corpus is batched,
  * [[Dedup.incremental]] over the maintained index equals the
  * from-scratch truth (pinned by IncrementalIndexSpec against a
  * single-append rebuild and by the dedup_incremental oracle).
  */
object IncrementalIndex {

  /** band value marking exact-content-key rows. */
  val ExactBand: Int = -1

  /** (doc_id, band, band_key) MinHash band rows for every doc in the
    * batch — same banding as Dedup.minhashBands, derived from the
    * batch alone. Pure per-doc; used by [[indexRowsFor]] for the
    * batch's content reps.
    */
  def bandsFor(batch: DataFrame): DataFrame = {
    GraftFunctions.register(batch.sparkSession)
    batch.select(col("doc_id"), expr("graft_minhash(text, 64, 3)").as("sig"))
      .select(col("doc_id"), posexplode(expr(Dedup.BandExpr)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
  }

  /** Full index rows for one batch: an exact row per doc plus band
    * rows for the batch's content reps only. The rep election is a
    * hash-groupBy (map-side partial agg, AQE-splittable) — never a
    * window over the raw batch.
    */
  def indexRowsFor(batch: DataFrame): DataFrame = {
    val keyed = batch.select(col("doc_id"), Dedup.exactContentKey.as("exact_key"))
    val exactRows = keyed.select(col("doc_id"), lit(ExactBand).as("band"),
      lit(null).cast("array<bigint>").as("band_key"), col("exact_key"))
    val repIds = keyed.groupBy("exact_key").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    // a null text has no signature (graft_minhash propagates null →
    // every band slice is null): keep those rows out of the stored
    // index instead of carrying 16 dead rows per null doc
    val bandRows = bandsFor(batch.join(repIds, Seq("doc_id"), "left_semi"))
      .filter(col("band_key").isNotNull)
      .withColumn("exact_key", lit(null).cast("string"))
    exactRows.unionByName(bandRows)
  }

  /** Append a document batch and its index rows as paired commits.
    * Returns (docsVersion, indexVersion).
    */
  def append(s: SparkSession, docsRoot: String, indexRoot: String, batch: DataFrame): (Int, Int) = {
    val dv = SnapshotTable.commit(s, docsRoot, batch)
    val iv = SnapshotTable.commit(s, indexRoot, indexRowsFor(batch))
    (dv, iv)
  }

  /** The exact-duplicate structure at the CURRENT index version:
    * (doc_id, rep_id) membership rows, rep_id = min doc_id of the
    * content cluster. Derived from the maintained exact rows alone —
    * no text is read or shuffled.
    */
  def members(s: SparkSession, indexRoot: String): DataFrame = {
    val exact = SnapshotTable.read(s, indexRoot)
      .filter(col("band") === ExactBand)
      .select(col("doc_id"), col("exact_key"))
    val repMap = exact.groupBy("exact_key").agg(min("doc_id").as("rep_id"))
    exact.join(repMap, Seq("exact_key")).select("doc_id", "rep_id")
  }

  /** Candidate near-dup pairs among GLOBAL content reps at the
    * current index version — a capped bucket join over the maintained
    * band rows, filtered to global reps (a batch-local rep whose text
    * first appeared in an earlier batch drops out here), no
    * re-hashing.
    */
  def candidatePairs(s: SparkSession, indexRoot: String): DataFrame =
    candidatePairs(s, indexRoot, members(s, indexRoot))

  /** [[candidatePairs]] over a caller-supplied membership frame —
    * lets [[graft.dedup.Dedup.incrementalPairs]] share one rep-map
    * plan across every consumer (Spark then reuses the exchange
    * instead of re-deriving it).
    */
  def candidatePairs(s: SparkSession, indexRoot: String, members: DataFrame): DataFrame = {
    val reps = members
      .filter(col("doc_id") === col("rep_id")).select("doc_id")
    val idx = SnapshotTable.read(s, indexRoot)
      .filter(col("band") >= 0)
      .join(reps, Seq("doc_id"), "left_semi")
      .withColumnRenamed("doc_id", "id")
      .select("id", "band", "band_key")
    Dedup.cappedPairs(idx)
  }
}
