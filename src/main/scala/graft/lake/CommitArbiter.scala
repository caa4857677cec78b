package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ATOMIC PUBLISH step of a snapshot commit, extracted behind an
  * interface (VERDICT r6 item 6) because its correct implementation
  * depends on the store:
  *
  *  - HDFS / POSIX-local: `rename` is atomic and (HDFS) refuses an
  *    existing destination — rename IS the compare-and-swap.
  *  - S3-class object stores (the reference's MinIO bucket,
  *    docker-compose.yaml `minio` service): "rename" is copy+delete —
  *    non-atomic, last-writer-wins — so TWO committers can both
  *    believe they published the same version and one update is
  *    silently lost. The reference delegates this exact problem to
  *    Lakekeeper's REST catalog (create-default-warehouse.json); an
  *    Iceberg Hadoop table has the same caveat and recommends a
  *    metastore lock.
  *
  * `publish(fs, tmp, dst)` must make `tmp` visible at `dst` and return
  * true iff THIS caller won — at most one caller may ever receive true
  * per `dst` — and must never leave a partial `dst`. SnapshotTable
  * turns a false into the loud concurrent-commit exception its
  * optimistic-retry loop ([[SnapshotTable.commitAppend]]) rebases on.
  *
  * Selection: hadoop conf `graft.commit.arbiter` = `rename` (default)
  * or `lockfile`. A production object-store deployment would plug a
  * true external CAS (catalog swap, DynamoDB conditional write) behind
  * this same interface.
  */
trait CommitArbiter {
  def publish(fs: FileSystem, tmp: Path, dst: Path): Boolean
}

object CommitArbiter {

  val ConfKey = "graft.commit.arbiter"

  /** Per-destination JVM lock: serializes same-JVM committers so the
    * exists-check/publish pair is atomic within the process (local[*]
    * and one driver per table — the common case). Cross-process
    * exclusion is each arbiter's store-level concern.
    */
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[lake] def lockFor(dst: Path): Object =
    locks.computeIfAbsent(dst.toString, _ => new Object)

  def forConf(conf: org.apache.hadoop.conf.Configuration): CommitArbiter =
    conf.get(ConfKey, "rename") match {
      case "rename" => RenameCas
      case "lockfile" => LockFileCas
      case other => throw new IllegalArgumentException(
        s"unknown $ConfKey: $other (rename | lockfile)")
    }

  /** The plain local filesystem (scheme `file`), where POSIX gives us
    * a TRUE atomic no-clobber primitive (hardlink / O_EXCL create)
    * that Hadoop's exists-then-rename and exists-then-create pairs
    * lack. Scheme-keyed on purpose: test stand-ins that re-scheme a
    * local FS to model object stores (graftnar://, graftshift://)
    * must keep their modeled semantics.
    */
  private[graft] def isPosixLocal(fs: FileSystem): Boolean =
    fs.getUri.getScheme == "file" // getUri, not getScheme: the latter
    // throws UnsupportedOperationException on FS impls that don't
    // override it (RawLocalFileSystem subclasses included)

  /** Atomic publish on POSIX: hardlink tmp at dst — the kernel
    * refuses an existing destination atomically (EEXIST), so at most
    * one of any number of PROCESSES wins, with no exists/rename
    * window. The tmp link is removed after a win; dst has no checksum
    * sidecar, which LocalFileSystem treats as verification-skipped.
    */
  private[lake] def linkCas(fs: FileSystem, tmp: Path, dst: Path): Boolean = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(tmp.toUri.getPath)
    val d = Paths.get(dst.toUri.getPath)
    Files.createDirectories(d.getParent)
    // the catch is scoped to createLink ALONE: once the link has
    // published dst this call has won, and a failure in the tmp
    // cleanup below must not fall into the exists+rename fallback —
    // which would see dst present, return false, and report a
    // concurrent commit for a commit that actually landed (the retry
    // would then append the same rows again at the next version)
    try Files.createLink(d, src)
    catch {
      case _: java.nio.file.FileAlreadyExistsException => return false
      case _: UnsupportedOperationException | _: java.nio.file.FileSystemException
           | _: java.io.IOException =>
        // scheme 'file' but no hardlink support (exFAT/SMB/FUSE
        // mounts): fall back to the pre-hardening exists+rename pair —
        // same-JVM writers stay serialized by the caller's dst lock,
        // and crashing every commit would be strictly worse than the
        // narrow cross-process window (r17 review finding)
        return !fs.exists(dst) && fs.rename(tmp, dst)
    }
    // best-effort: the tmp link is garbage once dst exists, and
    // aborted-write maintenance reclaims anything a crash leaves
    try fs.delete(tmp, false) catch { case _: java.io.IOException => () }
    true
  }
}

/** Rename-as-CAS: correct where rename is atomic and the store refuses
  * an existing destination (HDFS) or the JVM lock prevents one
  * (same-process). On the PLAIN LOCAL filesystem — where POSIX rename
  * clobbers and the exists/rename pair has a cross-process window —
  * the publish is a HARDLINK instead (r17, CrossProcessCommitSpec):
  * the kernel's EEXIST makes it a true multi-process CAS. NOT safe
  * for multi-PROCESS writers on object stores, where rename is
  * copy+delete — use [[LockFileCas]] or an external catalog there.
  */
object RenameCas extends CommitArbiter {
  override def publish(fs: FileSystem, tmp: Path, dst: Path): Boolean =
    CommitArbiter.lockFor(dst).synchronized {
      if (CommitArbiter.isPosixLocal(fs)) CommitArbiter.linkCas(fs, tmp, dst)
      else !fs.exists(dst) && fs.rename(tmp, dst)
    }
}

/** Object-store-safe arbiter: winners are decided by CREATE-EXCLUSIVE
  * on a lock file (the conditional-PUT analog every real object store
  * offers), never by rename. Under the lock the destination is checked
  * and the manifest COPIED into place — copy+delete is fine once
  * arbitration no longer rides on it. A committer that crashes inside
  * `publish` leaks the lock file; maintenance may remove stale
  * `.lock`s (same operational class as aborted-write orphans).
  */
object LockFileCas extends CommitArbiter {
  override def publish(fs: FileSystem, tmp: Path, dst: Path): Boolean =
    CommitArbiter.lockFor(dst).synchronized {
      val lock = new Path(dst.getParent, s".${dst.getName}.lock")
      val acquired =
        // plain local FS: O_EXCL create — Hadoop's exists-then-create
        // has a cross-process window POSIX closes atomically. A real
        // object store's create-exclusive is a conditional PUT, which
        // the Hadoop call below models for the re-schemed test stores.
        if (CommitArbiter.isPosixLocal(fs))
          try {
            java.nio.file.Files.createFile(
              java.nio.file.Paths.get(lock.toUri.getPath))
            true
          } catch { case _: java.io.IOException => false }
        else
          try { fs.create(lock, false).close(); true }
          catch { case _: java.io.IOException => false }
      if (!acquired) false
      else try {
        if (fs.exists(dst)) false
        else {
          org.apache.hadoop.fs.FileUtil.copy(fs, tmp, fs, dst,
            true /* deleteSource */, true, fs.getConf)
          true
        }
      } finally {
        fs.delete(lock, false); ()
      }
    }
}
