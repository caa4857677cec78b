package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit}

/** Minimal Iceberg-style snapshot table: versioned manifests over
  * immutable parquet data files.
  *
  * Re-expresses the reference's Iceberg/Lakekeeper table layer
  * (/root/reference/etc/catalog/iceberg.properties,
  * RUNBOOK.md §7 — `CREATE TABLE … WITH (partitioning …)`, inserts,
  * read-back) with no external catalog: each commit writes new
  * immutable files plus a manifest (`_manifests/v{N}.manifest`)
  * listing every file visible at that version. Readers pick a
  * version → time travel; appends never rewrite old files.
  *
  * All file I/O goes through the Hadoop FileSystem API, so `root`
  * can be s3a://… on a real cluster exactly like the reference's
  * MinIO bucket; local paths are just the test medium.
  */
object SnapshotTable {

  private def fsOf(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(s"$root/_manifests")

  private val ManifestRe = "v(\\d+)\\.manifest".r

  def currentVersion(s: SparkSession, root: String): Int = {
    val dir = manifestDir(root)
    val fs = fsOf(s, dir)
    if (!fs.exists(dir)) 0
    else
      fs.listStatus(dir).map(_.getPath.getName).collect {
        case ManifestRe(v) => v.toInt
      }.foldLeft(0)(math.max)
  }

  private def manifestLines(s: SparkSession, root: String, version: Int): Seq[String] = {
    val p = new Path(s"$root/_manifests/v$version.manifest")
    val fs = fsOf(s, p)
    val in = fs.open(p)
    try
      scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Data files visible at a version (metadata header lines excluded). */
  def dataFiles(s: SparkSession, root: String, version: Int): Seq[String] =
    manifestLines(s, root, version).filterNot(_.startsWith("#"))

  /** Metadata recorded with a commit (`#key=value` manifest header). */
  def commitMeta(s: SparkSession, root: String, version: Int): Map[String, String] =
    manifestLines(s, root, version).takeWhile(_.startsWith("#")).flatMap { l =>
      l.drop(1).split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _ => None
      }
    }.toMap

  /** Commit a new version. `append=true` keeps prior files visible;
    * `append=false` is an overwrite commit (old files stay on disk
    * for old-version readers — that's what makes time travel work).
    * `meta` is recorded in the manifest header (`#key=value`) — used
    * e.g. by LakeSink to stamp the streaming batch id for idempotent
    * replay. Returns the new version number.
    *
    * The manifest is written to a temp path and renamed into place,
    * with an existence check on the final path — a concurrent
    * committer racing to the same version fails loudly instead of
    * silently clobbering the manifest. Pass `expectedVersion` (the
    * version this commit should create, i.e. the version you read
    * plus one) for optimistic concurrency: the commit fails if
    * another writer got there first, Iceberg-CAS style. Single-writer
    * remains the supported default; the checks turn a lost update
    * into an error. A crash before the rename leaves only orphan
    * data files, never a corrupt or half-visible version.
    */
  def commit(
      s: SparkSession, root: String, df: DataFrame,
      append: Boolean = true, meta: Map[String, String] = Map.empty,
      expectedVersion: Option[Int] = None): Int = {
    val cur = currentVersion(s, root)
    val v = expectedVersion.getOrElse(cur + 1)
    if (v <= cur)
      throw new IllegalStateException(
        s"concurrent commit detected for $root: expected to create version $v " +
          s"but table is already at $cur")
    val newFiles = writeDataFiles(s, root, v, df)
    val base = if (append && v > 1) dataFiles(s, root, v - 1) else Seq.empty
    writeManifestAtomic(s, root, v, meta, base ++ newFiles)
    v
  }

  /** Row-level DELETE, copy-on-write Iceberg-style. Planning finds the
    * data files that actually contain matching rows (via the
    * `_metadata.file_path` column — a metadata-scale scan with the
    * predicate pushed to parquet); only those files are rewritten
    * without the matching rows, every untouched file is re-listed
    * as-is in the new manifest. Old versions still read the
    * pre-delete content — time travel is preserved, which is exactly
    * how Iceberg serves GDPR deletes without mutating history.
    *
    * SQL DELETE semantics: rows where the predicate is TRUE go; rows
    * where it is NULL stay. Returns the new version (unchanged current
    * version when nothing matched).
    */
  def deleteWhere(s: SparkSession, root: String, predicate: Column): Int = {
    val cur = currentVersion(s, root)
    require(cur > 0, s"no snapshot table at $root")
    val files = dataFiles(s, root, cur)
    def norm(p: String) = new Path(p).toUri.getPath
    val affected = s.read.parquet(files: _*)
      .filter(predicate)
      .select(col("_metadata.file_path"))
      .distinct().collect().map(r => norm(r.getString(0))).toSet
    val (touched, untouched) = files.partition(f => affected.contains(norm(f)))
    if (touched.isEmpty) return cur
    val v = cur + 1
    val kept = s.read.parquet(touched: _*)
      .filter(!coalesce(predicate, lit(false)))
    val newFiles = writeDataFiles(s, root, v, kept)
    writeManifestAtomic(s, root, v,
      Map("op" -> "delete", "rewrote" -> touched.size.toString),
      untouched ++ newFiles)
    v
  }

  private def writeDataFiles(s: SparkSession, root: String, v: Int, df: DataFrame): Seq[String] = {
    val dataDir = s"$root/data/v$v"
    df.write.mode("overwrite").parquet(dataDir)
    val dataPath = new Path(dataDir)
    fsOf(s, dataPath).listStatus(dataPath)
      .map(_.getPath.toString).filter(_.endsWith(".parquet")).sorted.toSeq
  }

  private def writeManifestAtomic(
      s: SparkSession, root: String, v: Int,
      meta: Map[String, String], files: Seq[String]): Unit = {
    val header = meta.toSeq.sorted.map { case (k, value) => s"#$k=$value" }
    val mp = new Path(s"$root/_manifests/v$v.manifest")
    val tmp = new Path(s"$root/_manifests/.v$v.manifest.tmp")
    val fs = fsOf(s, mp)
    val out = fs.create(tmp, true)
    try out.write(((header ++ files).mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(mp) || !fs.rename(tmp, mp))
      throw new IllegalStateException(
        s"concurrent commit detected for $root version $v — manifest already exists")
  }

  /** Read the table at a version (default: latest). */
  def read(s: SparkSession, root: String, version: Int = -1): DataFrame = {
    val v = if (version < 0) currentVersion(s, root) else version
    s.read.parquet(dataFiles(s, root, v): _*)
  }

  def drop(s: SparkSession, root: String): Unit = {
    val p = new Path(root)
    val fs = fsOf(s, p)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
}
