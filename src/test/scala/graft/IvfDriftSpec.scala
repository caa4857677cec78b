package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.ann.IvfIndex
import graft.lake.SnapshotTable
import graft.sources.Tables

/** Centroid-drift policy (VERDICT r9 item 5): in-distribution appends
  * leave the index quiet; a distribution shift trips the sticky
  * `needs_rebuild` flag; [[IvfIndex.buildAt]] re-baselines and clears
  * it, after which the shifted distribution is in-distribution.
  */
class IvfDriftSpec extends SparkSpec {

  private val root = "/tmp/graft_ivf_drift_spec"

  private def vecs = Tables.load(spark, sf(), "embeddings")
    .select("vec_id", "embedding")

  // a genuinely different distribution: a tight topic cluster around
  // one direction — healthy-looking assignment cosines, but the whole
  // batch floods a single inverted list (the scale failure mode)
  private def clustered(base: org.apache.spark.sql.DataFrame, idOffset: Long) =
    base.withColumn("embedding", expr(
      "transform(embedding, (x, i) -> CASE WHEN i = 0 THEN CAST(1.0 AS FLOAT) " +
        "ELSE CAST(0.05 * x AS FLOAT) END)"))
      .withColumn("vec_id", col("vec_id") + idOffset)

  test("quiet appends stay quiet; drift trips a sticky flag; rebuild clears it") {
    Seq("lists", "centroids").foreach(t => SnapshotTable.drop(spark, s"$root/$t"))
    val even = vecs.filter(col("vec_id") % 2 === 0)
    val odd = vecs.filter(col("vec_id") % 2 === 1)

    IvfIndex.buildAt(spark, root, even, nLists = 16, lloydIters = 2)
    assert(!IvfIndex.needsRebuild(spark, root))

    // held-out but same distribution: no drift (its median assignment
    // cosine is legitimately below the build sample's — the relative
    // threshold must absorb that)
    IvfIndex.appendBatch(spark, root, odd)
    assert(!IvfIndex.needsRebuild(spark, root))

    // new tight cluster: drift detected (hottest-list share)
    IvfIndex.appendBatch(spark, root, clustered(odd, 1000000L))
    assert(IvfIndex.needsRebuild(spark, root))

    // sticky: a later quiet batch must not mask the earlier drift
    IvfIndex.appendBatch(spark, root,
      even.withColumn("vec_id", col("vec_id") + 2000000L))
    assert(IvfIndex.needsRebuild(spark, root))

    // the rebuild is the consumer: retrain over the lists table's
    // CURRENT corpus (what the index actually holds), flag clears.
    // Materialized first: buildAt drops the very files a lazy read
    // would scan (a real rebuild job reads its corpus from the
    // upstream table, not from the index it is replacing)
    val current = spark.createDataFrame(
      SnapshotTable.read(spark, s"$root/lists")
        .select("vec_id", "embedding").collect().toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    IvfIndex.buildAt(spark, root, current, nLists = 16, lloydIters = 2)
    assert(!IvfIndex.needsRebuild(spark, root))

    // post-rebuild the cluster is in-distribution: the retrained
    // quantizer gave it centroids of its own, so the same kind of
    // batch now scores a high assignment cosine and a hot share
    // within the (re-baselined) build's own balance — quiet
    IvfIndex.appendBatch(spark, root, clustered(even, 3000000L))
    assert(!IvfIndex.needsRebuild(spark, root))

    // and a plain quiet batch is quiet too
    IvfIndex.appendBatch(spark, root,
      odd.withColumn("vec_id", col("vec_id") + 4000000L))
    assert(!IvfIndex.needsRebuild(spark, root))
  }

  test("Maintenance.run consumes the drift flag: rebuild on trigger, no-op when quiet") {
    import graft.lake.Maintenance
    val mroot = "/tmp/graft_ivf_drift_maint"
    Seq("lists", "centroids").foreach(t => SnapshotTable.drop(spark, s"$mroot/$t"))
    // a plain snapshot table so the run has its usual lake stages
    val tbl = "/tmp/graft_ivf_drift_maint_tbl"
    SnapshotTable.drop(spark, tbl)
    import spark.implicits._
    SnapshotTable.commit(spark, tbl, Seq((1L, "a")).toDF("id", "v"))
    val policy = Maintenance.Policy(
      orphanGraceMs = 0, indexes = Seq(IvfIndex.maintenanceStage(mroot)))

    // nLists deliberately != any fallback: the rebuild must retrain at
    // the BUILT list count, which it can only know if appends carry
    // the n_lists header forward to the lists HEAD it reads
    IvfIndex.buildAt(spark, mroot, vecs.filter(col("vec_id") % 2 === 0),
      nLists = 8, lloydIters = 2)
    // quiet index: the nightly run must NOT rebuild
    val quiet = Maintenance.run(spark, tbl, policy)
    assert(quiet.indexesRebuilt.isEmpty, quiet.toString)

    // drift it; plan() previews the rebuild without acting
    IvfIndex.appendBatch(spark, mroot,
      clustered(vecs.filter(col("vec_id") % 2 === 1), 1000000L))
    assert(IvfIndex.needsRebuild(spark, mroot))
    // the append carried the build parameter to the head it created
    val headMeta = SnapshotTable.commitMeta(spark, s"$mroot/lists",
      SnapshotTable.currentVersion(spark, s"$mroot/lists"))
    assert(headMeta.get("n_lists") === Some("8"), headMeta.toString)
    assert(Maintenance.plan(spark, tbl, policy).indexesRebuilt === Seq(mroot))
    assert(IvfIndex.needsRebuild(spark, mroot), "plan must not rebuild")

    // the run consumes the flag: retrains over the index's own corpus,
    // re-baselines, clears the stickiness
    val triggered = Maintenance.run(spark, tbl, policy)
    assert(triggered.indexesRebuilt === Seq(mroot), triggered.toString)
    assert(!IvfIndex.needsRebuild(spark, mroot))
    // the rebuilt index still holds every vector ever appended
    val held = SnapshotTable.read(spark, s"$mroot/lists").count()
    assert(held === vecs.count(), s"rebuild must preserve the corpus ($held)")
    // ...retrained at the built list count, not a fallback default
    assert(SnapshotTable.read(spark, s"$mroot/centroids").count() === 8L,
      "drift rebuild must reuse the built n_lists")
    // and the staged corpus copy was reclaimed after the commit landed
    val stagePath = new org.apache.hadoop.fs.Path(s"$mroot/_rebuild_stage")
    assert(!stagePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(stagePath), "successful rebuild reclaims its stage")
    // post-rebuild the shifted distribution is covered: same-shape
    // batch stays quiet, and the next run is a no-op again
    IvfIndex.appendBatch(spark, mroot,
      clustered(vecs.filter(col("vec_id") % 2 === 0), 3000000L))
    val after = Maintenance.run(spark, tbl, policy)
    assert(after.indexesRebuilt.isEmpty, after.toString)
  }
}
