package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, Metadata, MetadataBuilder, StructField, StructType}

/** Open-format metadata interop — BOTH directions of the migration
  * path the reference gets from Iceberg's ecosystem (its tables are
  * mountable by any Iceberg-aware engine via the Lakekeeper catalog,
  * /root/reference/etc/catalog): EXPORT a snapshot version as a
  * Delta-protocol transaction log, and IMPORT a foreign `_delta_log`
  * into a SnapshotTable. Delta's log is pure JSON, so this pair is
  * the IMPORT-capable interchange path; the Iceberg direction (Avro
  * manifest-lists + manifests + metadata.json) is [[IcebergInterop]].
  * Both directions move ZERO data bytes: add actions reference
  * parquet files by absolute URI, and the import registers them via
  * [[SnapshotTable.commitFiles]].
  *
  * Rename/widen metadata survives the round trip via Delta COLUMN
  * MAPPING: the exported schemaString stamps each field's physical
  * (in-file) name as `delta.columnMapping.physicalName` field metadata
  * (mode=name in the table configuration), and logical types ride the
  * schemaString's field types — exactly how Delta serves renamed
  * columns over immutable files. The importer folds both back into
  * SnapshotTable's colmap/coltypes headers.
  */
object DeltaInterop {

  private val PhysNameKey = "delta.columnMapping.physicalName"

  private def esc(x: String): String = x.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case '\r' => "\\r"; case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }

  /** A version's logical schema (renames + widens applied) with each
    * mapped field stamped with its physical in-file name (Delta column
    * mapping, mode=name), plus the table configuration — ONE shared
    * render for the JSON chain's metaData actions AND the checkpoint's
    * metaData row, so the two can never drift apart.
    */
  private def stampedSchema(s: SparkSession, root: String, v: Int)
      : (StructType, Map[String, String]) = {
    val mapping = SnapshotTable.columnMapping(s, root, v)
    val logical = SnapshotTable.read(s, root, v).schema
    val stamped = StructType(logical.map { f =>
      mapping.get(f.name) match {
        case Some(phys) if phys != f.name =>
          f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putString(PhysNameKey, phys).build())
        case _ => f
      }
    })
    val cfg: Map[String, String] =
      if (mapping.exists { case (l, p) => l != p })
        Map("delta.columnMapping.mode" -> "name")
      else Map.empty
    (stamped, cfg)
  }

  /** The metaData action for a version — see [[stampedSchema]]. */
  private def metaDataAction(s: SparkSession, root: String, v: Int): String = {
    val stamp = SnapshotTable.committedAt(s, root, v)
    val (stamped, cfg) = stampedSchema(s, root, v)
    val cfgJson = cfg.toSeq.sorted
      .map { case (k, v2) => s""""${esc(k)}":"${esc(v2)}"""" }.mkString(",")
    s"""{"metaData":{"id":"graft-delta-export","format":{"provider":"parquet",""" +
      s""""options":{}},"schemaString":"${esc(stamped.json)}","partitionColumns":[],""" +
      s""""configuration":{$cfgJson},"createdTime":$stamp}}"""
  }

  private def addAction(s: SparkSession, f: String, stamp: Long): String = {
    val p = new Path(f)
    val size = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      .getFileStatus(p).getLen
    s"""{"add":{"path":"${esc(p.toUri.toString)}","partitionValues":{},""" +
      s""""size":$size,"modificationTime":$stamp,"dataChange":true}}"""
  }

  /** Render the FULL version chain as a Delta transaction log under
    * `exportDir` — one `_delta_log/<k>.json` per engine version
    * (graft version k+1 → Delta version k) with that commit's add and
    * remove actions — plus a CHECKPOINT parquet at the head and the
    * `_last_checkpoint` pointer, the way long-lived Delta tables are
    * actually served: a reader reconstructs the current state from
    * the checkpoint alone (no JSON replay) and time-travels through
    * the JSON chain. Zero data bytes moved; per-version metadata work
    * only (schema re-render only on versions whose schema headers
    * changed). Returns the head log file path.
    *
    * Two scoped refusals/limitations: a HEAD with pending
    * merge-on-read deletes is refused loudly (Delta's log cannot
    * express positional/equality delete files — fold with
    * compactDeletes first), and versions expired by retention are not
    * rendered (the chain starts at the earliest live version, exactly
    * like Delta's own log cleanup — readers bootstrap from the
    * checkpoint). An INTERMEDIATE version that had pending MoR
    * deletes renders its data files only, so time travel TO that
    * version shows pre-delete visibility; the head state is exact.
    */
  def writeLog(s: SparkSession, root: String, exportDir: String,
               version: Int = -1): Path = {
    val v = if (version < 0) SnapshotTable.currentVersion(s, root) else version
    require(v >= 1, s"nothing to export at $root")
    // Delta's protocol has no positional/equality delete files (that
    // is deletion vectors, a different reader contract) — exporting a
    // table with PENDING merge-on-read deletes would render a state
    // that resurrects every deleted row in the foreign reader. Refuse
    // loudly with the fix: fold them first.
    require(SnapshotTable.lineEntries(s, root, v).forall(_.kind == 0),
      s"$root@v$v has pending merge-on-read (positional/equality) deletes; " +
        "run compactDeletes before the Delta export — the Delta log cannot express them")
    val conf = s.sparkContext.hadoopConfiguration
    val logDir = new Path(s"$exportDir/_delta_log")
    val fs = logDir.getFileSystem(conf)
    fs.mkdirs(logDir)
    def canonOf(k: Int): Seq[String] = SnapshotTable.dataFiles(s, root, k)
    def schemaKey(k: Int): (Map[String, String], Map[String, String], Map[String, Int]) =
      (SnapshotTable.columnMapping(s, root, k), SnapshotTable.columnTypes(s, root, k),
        SnapshotTable.droppedColumns(s, root, k))
    // versions EXPIRED by retention have no manifest (and possibly
    // reclaimed files) — the chain starts at the earliest LIVE
    // version, exactly like real Delta log cleanup: older JSON
    // commits are gone and readers bootstrap from the checkpoint
    // (the head checkpoint below always covers the full state)
    val firstLive = (1 to v).find(k =>
      scala.util.Try(SnapshotTable.commitMeta(s, root, k)).isSuccess).getOrElse(
      throw new IllegalArgumentException(s"no live version of $root at or below $v"))
    var prevFiles = Seq.empty[String]
    var logFile: Path = null
    (firstLive to v).foreach { k =>
      val stamp = SnapshotTable.committedAt(s, root, k)
      val files = canonOf(k)
      val prevSet = prevFiles.map(SnapshotTable.canon(s, _)).toSet
      val curSet = files.map(SnapshotTable.canon(s, _)).toSet
      val adds = files.filterNot(f => prevSet.contains(SnapshotTable.canon(s, f)))
        .map(addAction(s, _, stamp))
      val removes = prevFiles.filterNot(f => curSet.contains(SnapshotTable.canon(s, f)))
        .map { f =>
          s"""{"remove":{"path":"${esc(new Path(f).toUri.toString)}",""" +
            s""""deletionTimestamp":$stamp,"dataChange":true}}"""
        }
      val header =
        if (k == firstLive)
          Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
            metaDataAction(s, root, k))
        else if (schemaKey(k) != schemaKey(k - 1)) Seq(metaDataAction(s, root, k))
        else Seq.empty
      // an INTERMEDIATE version with pending MoR deletes renders its
      // data files only — a foreign reader time-traveling there sees
      // pre-delete visibility. That divergence must be visible ON THE
      // WIRE, not only in our scaladoc: stamp a commitInfo marker so
      // external tooling (and humans reading the log) can tell this
      // commit's rendered state is wider than the engine's own view.
      val mor =
        if (k < v && SnapshotTable.lineEntries(s, root, k).exists(_.kind != 0))
          Seq(s"""{"commitInfo":{"timestamp":$stamp,"operation":"graft-export",""" +
            s""""operationParameters":{},"engineInfo":"graft-delta-export",""" +
            s""""userMetadata":"graft: version had pending merge-on-read deletes; """ +
            s"""rendered data files show pre-delete visibility"}}""")
        else Seq.empty
      logFile = new Path(logDir, "%020d.json".format(k - 1))
      val out = fs.create(logFile, true)
      try out.write(
        ((mor ++ header ++ adds ++ removes).mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      prevFiles = files
    }
    // exporting an explicit OLDER version into a dir previously
    // exported at a newer one would otherwise leave the newer
    // %020d.json + checkpoint behind: readLog bootstraps from the new
    // _last_checkpoint then replays every JSON above it, silently
    // reconstructing a state NEWER than the requested export. Truncate
    // the chain at the requested head.
    val VersionedRe = "(\\d{20})(\\.json|\\.checkpoint\\.parquet)".r
    fs.listStatus(logDir).map(_.getPath).foreach { p =>
      p.getName match {
        case VersionedRe(n, _) if n.toLong > (v - 1).toLong => fs.delete(p, false); ()
        case _ => ()
      }
    }
    writeCheckpoint(s, root, v, logDir)
    logFile
  }

  /** Checkpoint parquet for the head (Delta version `v-1`): the FULL
    * reconstructed state — one protocol row, one metaData row, one
    * add row per live file — in the standard checkpoint column layout
    * (one nullable struct column per action type), plus the
    * `_last_checkpoint` pointer. A reader then serves the current
    * state from this one parquet file, paying the JSON chain only for
    * time travel — Delta's own answer to 100k-commit log replay.
    */
  private def writeCheckpoint(
      s: SparkSession, root: String, v: Int, logDir: Path): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val conf = s.sparkContext.hadoopConfiguration
    val fs = logDir.getFileSystem(conf)
    val stamp = SnapshotTable.committedAt(s, root, v)
    val (stamped, cfg) = stampedSchema(s, root, v)
    val schema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("format", StructType(Seq(
          StructField("provider", StringType),
          StructField("options", MapType(StringType, StringType))))),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType)),
        StructField("createdTime", LongType)))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType))))))
    val protoRow = Row(Row(1, 2), null, null)
    val metaRow = Row(null, Row("graft-delta-export", Row("parquet",
      Map.empty[String, String]), stamped.json, Seq.empty[String], cfg, stamp), null)
    val addRows = SnapshotTable.dataFiles(s, root, v).map { f =>
      val p = new Path(f)
      val size = p.getFileSystem(conf).getFileStatus(p).getLen
      Row(null, null,
        Row(p.toUri.toString, Map.empty[String, String], size, stamp, true))
    }
    val rows = protoRow +: metaRow +: addRows
    // Spark writes a directory; the checkpoint is ONE parquet file —
    // stage, then move the single part file to the spec's name
    val staging = new Path(logDir, s".ckpt-${java.util.UUID.randomUUID.toString.take(8)}")
    import scala.jdk.CollectionConverters._
    s.createDataFrame(rows.asJava, schema).coalesce(1)
      .write.mode("overwrite").parquet(staging.toString)
    val part = fs.listStatus(staging).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no checkpoint part under $staging"))
    val ckpt = new Path(logDir, "%020d.checkpoint.parquet".format(v - 1))
    if (fs.exists(ckpt)) fs.delete(ckpt, false)
    fs.rename(part, ckpt)
    fs.delete(staging, true)
    val lc = new Path(logDir, "_last_checkpoint")
    val out = fs.create(lc, true)
    try out.write(
      s"""{"version":${v - 1},"size":${rows.size}}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** Parse a foreign `_delta_log` (every committed JSON version, in
    * order) down to the live file set + schema. Returns
    * (live add paths, schema, column mapping logical→physical).
    * Relative add/remove paths resolve against `tableDir`, absolute
    * URIs pass through — both are legal Delta.
    */
  def readLog(s: SparkSession, tableDir: String)
      : (Seq[String], StructType, Map[String, String]) = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val logDir = new Path(s"$tableDir/_delta_log")
    val fs = logDir.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(logDir), s"no _delta_log under $tableDir")
    val VersionRe = "(\\d{20})\\.json".r
    def str(v: JValue): Option[String] = v match {
      case JString(x) => Some(x); case _ => None
    }
    def resolve(p: String): String =
      if (java.net.URI.create(p).isAbsolute) p else s"$tableDir/$p"
    // a _last_checkpoint pointer short-circuits the replay: state
    // bootstraps from the checkpoint parquet, and only JSON commits
    // NEWER than it replay on top — real Delta readers never walk a
    // 100k-commit chain
    val lcPath = new Path(logDir, "_last_checkpoint")
    val ckptVersion: Option[Long] =
      if (!fs.exists(lcPath)) None
      else {
        val in = fs.open(lcPath)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        JsonMethods.parse(txt) \ "version" match {
          case JInt(n) => Some(n.longValue)
          case JLong(n) => Some(n)
          case _ => None
        }
      }
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    var schemaString: Option[String] = None
    ckptVersion.foreach { cv =>
      val ckpt = new Path(logDir, "%020d.checkpoint.parquet".format(cv))
      require(fs.exists(ckpt), s"_last_checkpoint names a missing $ckpt")
      s.read.parquet(ckpt.toString).collect().foreach { r =>
        val addIdx = r.fieldIndex("add")
        if (!r.isNullAt(addIdx))
          live += resolve(r.getStruct(addIdx).getAs[String]("path"))
        val metaIdx = r.fieldIndex("metaData")
        if (!r.isNullAt(metaIdx))
          schemaString = Some(r.getStruct(metaIdx).getAs[String]("schemaString"))
      }
    }
    val logFiles = fs.listStatus(logDir).map(_.getPath).collect {
      case p if VersionRe.pattern.matcher(p.getName).matches &&
        ckptVersion.forall(cv => p.getName.takeWhile(_ != '.').toLong > cv) => p
    }.sortBy(_.getName)
    require(logFiles.nonEmpty || ckptVersion.isDefined,
      s"empty _delta_log under $tableDir")
    // replay the (post-checkpoint) log: adds accumulate, removes
    // tombstone, last metaData wins — Delta's state reconstruction
    logFiles.foreach { lf =>
      val in = fs.open(lf)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).toList
        finally in.close()
      lines.foreach { line =>
        val j = JsonMethods.parse(line)
        str(j \ "add" \ "path").foreach(p => live += resolve(p))
        str(j \ "remove" \ "path").foreach(p => live -= resolve(p))
        str(j \ "metaData" \ "schemaString").foreach(x => schemaString = Some(x))
      }
    }
    val schema = schemaString match {
      case Some(x) => DataType.fromJson(x).asInstanceOf[StructType]
      case None => throw new IllegalArgumentException(
        s"no metaData action in $tableDir/_delta_log")
    }
    val mapping = schema.flatMap { f =>
      if (f.metadata.contains(PhysNameKey)) {
        val phys = f.metadata.getString(PhysNameKey)
        if (phys != f.name) Some(f.name -> phys) else None
      } else None
    }.toMap
    (live.toSeq, schema, mapping)
  }

  private def stripMeta(f: StructField): StructField = f.copy(metadata = Metadata.empty)

  /** IMPORT: materialize a foreign Delta table as SnapshotTable v1 at
    * `destRoot` — zero-copy (the manifest references the foreign
    * parquet files in place; footers are read for row stamping, data
    * is not). Column-mapping physical names become the colmap header;
    * the schemaString's logical types become coltypes, so files
    * narrower than the declared type upcast at read exactly like a
    * native widen. Returns the created version.
    */
  def importLog(s: SparkSession, tableDir: String, destRoot: String): Int = {
    require(SnapshotTable.currentVersion(s, destRoot) == 0,
      s"import destination $destRoot already has commits")
    val (files, schema, mapping) = readLog(s, tableDir)
    val renderedMap = mapping.toSeq.sorted
      .map { case (l, p) => s"$l=$p" }.mkString(",")
    val renderedTypes = schema.map(f => s"${f.name}=${f.dataType.sql}")
      .mkString(",")
    val meta = Map(
      "op" -> "import_delta_log", "import_of" -> tableDir,
      SnapshotTable.ColTypesKey -> renderedTypes) ++
      (if (renderedMap.nonEmpty) Map(SnapshotTable.ColMapKey -> renderedMap)
       else Map.empty)
    SnapshotTable.commitFiles(s, destRoot, files, meta = meta)
  }
}
