package graft.lake

import org.apache.spark.sql.SparkSession

/** The composed nightly maintenance job — the ONE call a scheduler
  * runs per table, chaining every upkeep stage in dependency order:
  *
  *  1. [[SnapshotTable.compactDeletesIfNeeded]] — fold accumulated
  *     MoR deletes where the per-file pending-delete ratio (or any
  *     pending equality delete) says the read-side anti-join now
  *     costs more than the one-time rewrite.
  *  2. [[SnapshotTable.compactSmallFiles]] — bin-pack the micro-batch
  *     small files (INCLUDING the fresh fold outputs) toward the
  *     target size, per partition value.
  *  3. [[SnapshotTable.expire]] — drop snapshots beyond the retention
  *     window, reclaiming data/delete files and fragments only they
  *     reference.
  *  4. [[SnapshotTable.removeOrphans]] — reclaim debris NO version
  *     ever referenced (crashed commits, superseded rebase fragments,
  *     torn publishes), under the grace period.
  *
  * Every stage is individually safe next to live traffic — the
  * rewrites publish via the rebase-capable path (they retry over
  * concurrent appends, abort loudly on genuine conflicts), expire
  * touches only versions outside the retention window, and the orphan
  * grace period protects in-flight commits — so the job runs while
  * the table serves readers and a streaming sink
  * (StreamingMaintenanceSpec pins the interleaving). Mirrors the
  * operational story the reference delegates to Trino/Iceberg
  * maintenance procedures (RUNBOOK.md §9's table-maintenance notes):
  * `rewrite_position_delete_files` + `rewrite_data_files` +
  * `expire_snapshots` + `remove_orphan_files`, one scheduler entry.
  */
object Maintenance {

  /** A secondary index the nightly run can poll and rebuild — the
    * seam that keeps lake-layer maintenance decoupled from index
    * implementations (graft.ann.IvfIndex.maintenanceStage adapts the
    * IVF index's sticky drift flag onto it). `needsRebuild` must be
    * metadata-sized (it is polled every run); `rebuild` may be a full
    * retraining job.
    */
  trait IndexStage {
    def root: String
    def needsRebuild(s: SparkSession): Boolean
    def rebuild(s: SparkSession): Unit
  }

  /** Production-shaped defaults; tests and small tables tighten them. */
  final case class Policy(
      maxDeleteRatio: Double = 0.05,
      smallBytes: Long = 64L << 20,
      targetBytes: Long = 256L << 20,
      sortCols: Seq[String] = Seq.empty, // rewrite SORT strategy: packed outputs re-clustered on these
      minDeleteFiles: Int = 4, // consolidate pos-delete files at this count (below the fold threshold)
      keepVersions: Int = 5,
      orphanGraceMs: Long = 3L * 3600 * 1000,
      indexes: Seq[IndexStage] = Nil) // drift-polled secondary indexes

  /** What the run did — the accounting a maintenance dashboard keys
    * on. `None` = that stage decided no work was warranted.
    * `indexRebuildFailures` lists (index root, error) for rebuilds
    * that threw — the run keeps going so one bad index neither loses
    * the table-maintenance accounting nor starves its siblings.
    */
  final case class Report(
      deletesFoldedVersion: Option[Int],
      deleteFilesConsolidatedVersion: Option[Int],
      packedVersion: Option[Int],
      expiredVersions: Seq[Int],
      expiredFilesReclaimed: Int,
      orphansReclaimed: Int,
      finalVersion: Int,
      indexesRebuilt: Seq[String] = Nil,
      indexRebuildFailures: Seq[(String, String)] = Nil)

  /** DRY RUN: preview the DESTRUCTIVE stages without touching the
    * table — which versions [[SnapshotTable.expire]] would drop and
    * which orphan files [[SnapshotTable.removeOrphans]] would reclaim.
    * The rewrite stages (fold/consolidate/pack) are additive — they
    * publish new versions and destroy nothing, so "what would be
    * deleted?" (the question a dry-run answers before an irreversible
    * job) does not involve them; they report as not-run here.
    * `expiredFilesReclaimed` is 0: counting the files only expired
    * versions reference means reading every expired manifest, a cost
    * a preview shouldn't pay.
    */
  def plan(s: SparkSession, root: String, policy: Policy = Policy()): Report = {
    val v0 = SnapshotTable.currentVersion(s, root)
    require(v0 > 0, s"no snapshot table at $root")
    Report(
      deletesFoldedVersion = None,
      deleteFilesConsolidatedVersion = None,
      packedVersion = None,
      expiredVersions = SnapshotTable.expirableVersions(s, root, policy.keepVersions),
      expiredFilesReclaimed = 0,
      orphansReclaimed =
        SnapshotTable.removeOrphans(s, root, policy.orphanGraceMs, dryRun = true).size,
      finalVersion = v0,
      // the drift poll is metadata-sized and non-destructive, so the
      // preview names the indexes a real run WOULD rebuild
      indexesRebuilt = policy.indexes.filter(_.needsRebuild(s)).map(_.root))
  }

  def run(s: SparkSession, root: String, policy: Policy = Policy()): Report = {
    val v0 = SnapshotTable.currentVersion(s, root)
    require(v0 > 0, s"no snapshot table at $root")
    val vFold = SnapshotTable.compactDeletesIfNeeded(s, root, policy.maxDeleteRatio)
    // deletes that STAYED merge-on-read (below the fold ratio) still
    // cost a file open per delete file per scan — consolidate them
    val vConsol = SnapshotTable.compactDeleteFiles(s, root, policy.minDeleteFiles)
    val vPack = SnapshotTable.compactSmallFiles(s, root,
      policy.smallBytes, policy.targetBytes, policy.sortCols)
    val (expired, reclaimed) = SnapshotTable.expire(s, root, policy.keepVersions)
    val orphans = SnapshotTable.removeOrphans(s, root, policy.orphanGraceMs)
    // index stage: rebuild exactly the registered indexes whose sticky
    // drift flag is set (IvfIndex.needsRebuild — one header read per
    // index); a rebuild re-baselines and clears the flag. Each rebuild
    // is isolated: a throw must not discard the Report of the
    // destructive expire/orphan work that already ran, nor skip the
    // remaining indexes — the failed index keeps its sticky flag (the
    // overwrite-commit rebuild never un-publishes the old head), so
    // the next run retries it.
    val attempts = policy.indexes.filter(_.needsRebuild(s)).map { idx =>
      idx.root -> scala.util.Try(idx.rebuild(s))
    }
    Report(
      deletesFoldedVersion = Some(vFold).filter(_ > v0),
      deleteFilesConsolidatedVersion = Some(vConsol).filter(_ > vFold),
      packedVersion = Some(vPack).filter(_ > math.max(vFold, vConsol)),
      expiredVersions = expired,
      expiredFilesReclaimed = reclaimed.size,
      orphansReclaimed = orphans.size,
      finalVersion = SnapshotTable.currentVersion(s, root),
      indexesRebuilt = attempts.collect { case (r, scala.util.Success(_)) => r },
      indexRebuildFailures = attempts.collect {
        case (r, scala.util.Failure(e)) => r -> String.valueOf(e.getMessage)
      })
  }
}
