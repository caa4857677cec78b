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

  /** Render a snapshot version as `_delta_log/00…0.json` under
    * `exportDir`; returns the log file path. O(files) driver metadata
    * work, zero data bytes moved.
    */
  def writeLog(s: SparkSession, root: String, exportDir: String,
               version: Int = -1): Path = {
    val v = if (version < 0) SnapshotTable.currentVersion(s, root) else version
    val stamp = SnapshotTable.committedAt(s, root, v)
    val conf = s.sparkContext.hadoopConfiguration
    val mapping = SnapshotTable.columnMapping(s, root, v)
    // logical schema (renames + widens applied), each field stamped
    // with its physical in-file name when mapped
    val logical = SnapshotTable.read(s, root, v).schema
    val stamped = StructType(logical.map { f =>
      mapping.get(f.name) match {
        case Some(phys) if phys != f.name =>
          f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putString(PhysNameKey, phys).build())
        case _ => f
      }
    })
    val cfg =
      if (mapping.exists { case (l, p) => l != p })
        """"delta.columnMapping.mode":"name""""
      else ""
    val adds = SnapshotTable.dataFiles(s, root, v).map { f =>
      val p = new Path(f)
      val size = p.getFileSystem(conf).getFileStatus(p).getLen
      s"""{"add":{"path":"${esc(p.toUri.toString)}","partitionValues":{},""" +
        s""""size":$size,"modificationTime":$stamp,"dataChange":true}}"""
    }
    val logLines = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"graft-delta-export","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":"${esc(stamped.json)}","partitionColumns":[],""" +
        s""""configuration":{$cfg},"createdTime":$stamp}}""") ++ adds
    val logDir = new Path(s"$exportDir/_delta_log")
    val fs = logDir.getFileSystem(conf)
    fs.mkdirs(logDir)
    val logFile = new Path(logDir, "%020d.json".format(0))
    val out = fs.create(logFile, true)
    try out.write((logLines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    logFile
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
    val logFiles = fs.listStatus(logDir).map(_.getPath).collect {
      case p if VersionRe.pattern.matcher(p.getName).matches => p
    }.sortBy(_.getName)
    require(logFiles.nonEmpty, s"empty _delta_log under $tableDir")
    def str(v: JValue): Option[String] = v match {
      case JString(x) => Some(x); case _ => None
    }
    def resolve(p: String): String =
      if (java.net.URI.create(p).isAbsolute) p else s"$tableDir/$p"
    // replay the log: adds accumulate, removes tombstone, last
    // metaData wins — Delta's state reconstruction
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    var schemaString: Option[String] = None
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
