package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

import graft.lake.{DeletionVectors, DeltaInterop, SnapshotTable}

/** [[DeltaInterop]] edge surface the gate entries don't reach: the
  * export of a retention-expired table (chain truncation, like Delta's
  * own log cleanup) and the loud refusal of pending merge-on-read
  * deletes (Delta's log cannot express them).
  */
class DeltaInteropSpec extends SparkSpec {
  import spark.implicits._

  test("export after expire() truncates the chain; checkpoint still serves the head") {
    val root = "/tmp/graft_test/delta_expire"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, (0 until 10).map(k => (k.toLong, s"a$k")).toDF("id", "v"))
    SnapshotTable.commit(spark, root,
      (10 until 20).map(k => (k.toLong, s"b$k")).toDF("id", "v"), append = false)
    SnapshotTable.commitAppend(spark, root, (20 until 25).map(k => (k.toLong, s"c$k")).toDF("id", "v"))
    val (expired, _) = SnapshotTable.expire(spark, root, keepLast = 2)
    assert(expired === Seq(1), "v1 must expire (its overwritten files reclaimed)")
    val export = "/tmp/graft_test/delta_expire_out"
    SnapshotTable.drop(spark, export)
    DeltaInterop.writeLog(spark, root, export)
    val fs = new Path(export).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the chain starts at the earliest LIVE version — no delta v0
    assert(!fs.exists(new Path(s"$export/_delta_log/" + "%020d.json".format(0))))
    assert(fs.exists(new Path(s"$export/_delta_log/" + "%020d.json".format(1))))
    assert(fs.exists(new Path(s"$export/_delta_log/_last_checkpoint")))
    // readLog (checkpoint bootstrap) reconstructs the head exactly
    val (files, _, _) = DeltaInterop.readLog(spark, export)
    assert(spark.read.parquet(files: _*).count() === 15)
  }

  test("MoR-pending head exports as deletion vectors; eq-deletes still refuse") {
    // VERDICT r16 task 4: a head with pending POSITIONAL deletes
    // renders inline Delta deletion vectors (feature-gated protocol)
    // instead of refusing — zero data bytes moved, source untouched
    val root = "/tmp/graft_test/delta_mor_dv"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, (0 until 10).map(k => (k.toLong, s"r$k")).toDF("id", "v"))
    SnapshotTable.deleteWhereMor(spark, root, col("id") === 3L || col("id") === 7L)
    val export = "/tmp/graft_test/delta_mor_dv_out"
    SnapshotTable.drop(spark, export)
    DeltaInterop.writeLog(spark, root, export)
    val logFs = new Path(export).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val headJson = {
      val in = logFs.open(new Path(s"$export/_delta_log/" + "%020d.json".format(1)))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    assert(headJson.contains("\"deletionVector\"") &&
      headJson.contains("\"storageType\":\"i\""), headJson)
    val protoJson = {
      val in = logFs.open(new Path(s"$export/_delta_log/" + "%020d.json".format(0)))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    assert(protoJson.contains(""""readerFeatures":["deletionVectors"]"""),
      "DV presence must feature-gate the protocol")
    // the plain-file view REFUSES (it would resurrect deleted rows)…
    val plain = intercept[IllegalArgumentException] {
      DeltaInterop.readLog(spark, export)
    }
    assert(plain.getMessage.contains("deletion vectors"), plain.getMessage)
    // …and the DV-aware external reader reconstructs the exact state:
    // per-file adds + deleted row indexes applied via row_index
    val (adds, _, _) = DeltaInterop.readLogState(spark, export)
    assert(adds.exists(_._2.nonEmpty), "some add must carry a DV")
    val readBack = adds.map { case (f, dead) =>
      val df = spark.read.parquet(f)
        .withColumn("_ri", col("_metadata.row_index"))
      (if (dead.isEmpty) df else df.filter(!col("_ri").isin(dead: _*)))
        .drop("_ri")
    }.reduce(_ unionByName _)
    val got = readBack.select("id").as[Long].collect().toSet
    assert(got === (0 until 10).map(_.toLong).toSet - 3L - 7L)
    assert(got === SnapshotTable.read(spark, root)
      .select("id").as[Long].collect().toSet,
      "DV re-read must match the engine's own MoR view")
    // checkpoint-ALONE re-read: delete every JSON commit; the reader
    // bootstraps from the checkpoint (DV column included) and matches
    logFs.listStatus(new Path(s"$export/_delta_log")).map(_.getPath)
      .filter(_.getName.endsWith(".json"))
      .filterNot(_.getName == "_last_checkpoint")
      .foreach(p => logFs.delete(p, false))
    val (ckptAdds, _, _) = DeltaInterop.readLogState(spark, export)
    assert(ckptAdds.map { case (f, d) => (new Path(f).getName, d.toSet) }.toSet
      === adds.map { case (f, d) => (new Path(f).getName, d.toSet) }.toSet,
      "checkpoint-alone state must equal the replayed state")
    // EQUALITY deletes have no Delta encoding at all — still refused
    val rootEq = "/tmp/graft_test/delta_mor_eq"
    SnapshotTable.drop(spark, rootEq)
    SnapshotTable.commit(spark, rootEq, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    SnapshotTable.deleteWhereEq(spark, rootEq, Seq("id"),
      Seq(Tuple1(1L)).toDF("id"))
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.writeLog(spark, rootEq, "/tmp/graft_test/delta_mor_eq_out")
    }
    assert(e.getMessage.contains("equality") && e.getMessage.contains("compactDeletes"),
      e.getMessage)
    // folding still unblocks everything, deleted rows stay gone
    SnapshotTable.compactDeletes(spark, root)
    val export2 = "/tmp/graft_test/delta_mor_dv_folded"
    SnapshotTable.drop(spark, export2)
    DeltaInterop.writeLog(spark, root, export2)
    val (files, _, _) = DeltaInterop.readLog(spark, export2)
    val got2 = spark.read.parquet(files: _*).select("id").as[Long].collect().toSet
    assert(got2 === (0 until 10).map(_.toLong).toSet - 3L - 7L)
    // DV codec round-trip incl. a >32-bit row index (dense bitmap array)
    val pos = Seq(0L, 5L, 123456L, (1L << 32) + 7L)
    assert(DeletionVectors.deserialize(DeletionVectors.serialize(pos)).toSet === pos.toSet)
    val payload = DeletionVectors.serialize(pos)
    assert(DeletionVectors.base85Decode(
      DeletionVectors.base85Encode(payload), payload.length).toSeq === payload.toSeq)
    // in the FOLDED export the old delete version is now INTERMEDIATE
    // (pre-delete visibility wider than the engine's own view there) —
    // marked ON THE WIRE via commitInfo (ADVICE r16: the divergence
    // must be visible to the foreign reader, not only in our scaladoc)
    def logText(deltaV: Int): String = {
      val in = logFs.open(
        new Path(s"$export2/_delta_log/" + "%020d.json".format(deltaV)))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    assert(logText(1).contains("pending merge-on-read deletes"),
      "MoR-pending intermediate version must carry a commitInfo marker")
    assert(!logText(2).contains("pending merge-on-read deletes"),
      "the folded head is exact — no marker")
  }

  test("foreign _delta_log: commitInfo/txn/unknown actions, protocol gate, multi-part checkpoint, relative paths") {
    // VERDICT r16 task 5: readLog round-trips graft's own export, but
    // REAL writers emit commitInfo, protocol, txn, multi-part
    // checkpoints, and relative paths. Build a synthetic foreign log
    // with all of them and prove the import reconstructs the exact
    // live set.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = "/tmp/graft_test/delta_foreign"
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    fs.delete(new Path(dir), true)
    val logDir = new Path(s"$dir/_delta_log")
    fs.mkdirs(logDir)
    // three single-FILE parquet data files: a + c relative, b absolute
    def oneFile(rows: Seq[(Long, String)], dest: String): String = {
      val stage = s"$dir/.stage_${dest.replaceAll("[^A-Za-z0-9]", "_")}"
      rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(stage)
      val part = fs.listStatus(new Path(stage)).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      val out = new Path(dest)
      fs.mkdirs(out.getParent)
      fs.rename(part, out)
      fs.delete(new Path(stage), true)
      out.toUri.toString
    }
    oneFile(Seq((1L, "a")), s"$dir/data/a.parquet")
    val bAbs = oneFile(Seq((2L, "b")), "/tmp/graft_test/delta_foreign_ext/b.parquet")
    oneFile(Seq((3L, "c")), s"$dir/data/c.parquet")
    val schemaJson = new StructType().add("id", LongType).add("v", StringType).json
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    def writeJson(v: Int, lines: Seq[String]): Unit = {
      val out = fs.create(new Path(logDir, "%020d.json".format(v)), true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }
    // v0: the real-writer action zoo — protocol, metalData, commitInfo,
    // txn, an UNKNOWN action, and a RELATIVE add
    writeJson(0, Seq(
      """{"commitInfo":{"timestamp":1,"operation":"WRITE","engineInfo":"foreign-writer/3.2"}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"foreign","format":{"provider":"parquet","options":{}},"schemaString":"${esc(schemaJson)}","partitionColumns":[],"configuration":{},"createdTime":1}}""",
      """{"txn":{"appId":"foreign-app","version":7}}""",
      """{"someFutureAction":{"x":1}}""",
      """{"add":{"path":"data/a.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    // v1: absolute add + remove of the relative file
    writeJson(1, Seq(
      s"""{"add":{"path":"${esc(bAbs)}","partitionValues":{},"size":1,"modificationTime":2,"dataChange":true}}""",
      """{"remove":{"path":"data/a.parquet","deletionTimestamp":2,"dataChange":true}}"""))
    // multi-part checkpoint at version 1 (the shape real long-lived
    // tables serve): part 1 carries protocol+metaData, part 2 the add
    // of b — v1's exact live state. Foreign checkpoints also carry
    // columns we don't model (txn) — include one to prove the reader
    // binds checkpoint columns by NAME, not position.
    val ckptSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType)))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("size", LongType)))),
      StructField("txn", StructType(Seq(
        StructField("appId", StringType),
        StructField("version", LongType))))))
    def writeCkptPart(part: Int, of: Int, rows: Seq[Row]): Unit = {
      import scala.jdk.CollectionConverters._
      val stage = s"$dir/.ckpt_stage_$part"
      spark.createDataFrame(rows.asJava, ckptSchema).coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val p = fs.listStatus(new Path(stage)).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      fs.rename(p, new Path(logDir,
        "%020d.checkpoint.%010d.%010d.parquet".format(1, part, of)))
      fs.delete(new Path(stage), true)
    }
    writeCkptPart(1, 2, Seq(
      Row(Row(1, 2), null, null, null),
      Row(null, Row("foreign", schemaJson), null, Row("foreign-app", 7L))))
    writeCkptPart(2, 2, Seq(Row(null, null, Row(bAbs, 1L), null)))
    val lc = fs.create(new Path(logDir, "_last_checkpoint"), true)
    try lc.write("""{"version":1,"size":3,"parts":2}""".getBytes("UTF-8"))
    finally lc.close()
    // v2 (post-checkpoint): relative add of c + commitInfo noise
    writeJson(2, Seq(
      """{"commitInfo":{"timestamp":3,"operation":"WRITE"}}""",
      """{"add":{"path":"data/c.parquet","partitionValues":{},"size":1,"modificationTime":3,"dataChange":true}}"""))
    // read: checkpoint bootstrap (multi-part, by-name binding) + replay
    val (files, schema, mapping) = DeltaInterop.readLog(spark, dir)
    assert(schema.fieldNames.toSeq === Seq("id", "v"))
    assert(mapping.isEmpty)
    assert(files.map(f => new Path(f).getName).toSet
      === Set("b.parquet", "c.parquet"), files.toString)
    // zero-copy import lands it as a readable snapshot table
    val dest = "/tmp/graft_test/delta_foreign_import"
    SnapshotTable.drop(spark, dest)
    DeltaInterop.importLog(spark, dir, dest)
    val got = SnapshotTable.read(spark, dest).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((2L, "b"), (3L, "c")))
    // protocol gate: reader features we don't implement REFUSE loudly
    val dir2 = "/tmp/graft_test/delta_foreign_dv"
    fs.delete(new Path(dir2), true)
    fs.mkdirs(new Path(s"$dir2/_delta_log"))
    val out2 = fs.create(new Path(s"$dir2/_delta_log/" + "%020d.json".format(0)), true)
    try out2.write((Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""",
      s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":"${esc(schemaJson)}","partitionColumns":[],"configuration":{},"createdTime":1}}""").mkString("\n") + "\n").getBytes("UTF-8"))
    finally out2.close()
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.readLog(spark, dir2)
    }
    assert(e.getMessage.contains("v2Checkpoint"), e.getMessage)
    // DV-update in the ADVERSARIAL intra-commit order (add(F, dv) line
    // BEFORE remove(F, no-dv)): Delta keys replay by (path, dv
    // identity), so the remove names the OLD incarnation and must not
    // drop the just-re-added file (r17 review finding)
    val dir4 = "/tmp/graft_test/delta_foreign_dvorder"
    fs.delete(new Path(dir4), true)
    fs.mkdirs(new Path(s"$dir4/_delta_log"))
    val fAbs = oneFile(Seq((10L, "x"), (11L, "y"), (12L, "z")),
      s"$dir4/data/f.parquet")
    def writeJson4(v: Int, lines: Seq[String]): Unit = {
      val out = fs.create(new Path(s"$dir4/_delta_log/" + "%020d.json".format(v)), true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }
    writeJson4(0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":"${esc(schemaJson)}","partitionColumns":[],"configuration":{},"createdTime":1}}""",
      s"""{"add":{"path":"${esc(fAbs)}","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    writeJson4(1, Seq(
      s"""{"add":{"path":"${esc(fAbs)}","partitionValues":{},"size":1,"modificationTime":2,"dataChange":true${DeltaInterop.dvDescriptor(Seq(0L))}}}""",
      s"""{"remove":{"path":"${esc(fAbs)}","deletionTimestamp":2,"dataChange":true}}"""))
    val (adds4, _, _) = DeltaInterop.readLogState(spark, dir4)
    assert(adds4.map(a => (new Path(a._1).getName, a._2)) === Seq("f.parquet" -> Seq(0L)),
      s"the remove must not drop the DV-re-added file: $adds4")
    // and a FULL remove (naming the current dv identity) still removes
    writeJson4(2, Seq(
      s"""{"remove":{"path":"${esc(fAbs)}","deletionTimestamp":3,"dataChange":true${DeltaInterop.dvDescriptor(Seq(0L))}}}"""))
    val (adds5, _, _) = DeltaInterop.readLogState(spark, dir4)
    assert(adds5.isEmpty, s"a dv-matched remove must drop the file: $adds5")
  }

  test("re-export of an OLDER version truncates stale newer commits") {
    // ADVICE r16: exporting v2 into a dir previously exported at v3
    // left the newer JSON + checkpoint behind, and readLog bootstrapped
    // PAST the requested version
    val root = "/tmp/graft_test/delta_reexport"
    SnapshotTable.drop(spark, root)
    SnapshotTable.commit(spark, root, Seq((1L, "a")).toDF("id", "v"))
    SnapshotTable.commitAppend(spark, root, Seq((2L, "b")).toDF("id", "v"))
    SnapshotTable.commitAppend(spark, root, Seq((3L, "c")).toDF("id", "v"))
    val export = "/tmp/graft_test/delta_reexport_out"
    SnapshotTable.drop(spark, export)
    DeltaInterop.writeLog(spark, root, export) // head = v3
    val (all, _, _) = DeltaInterop.readLog(spark, export)
    assert(spark.read.parquet(all: _*).count() === 3)
    DeltaInterop.writeLog(spark, root, export, version = 2) // re-export older
    val fs = new Path(export).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$export/_delta_log/" + "%020d.json".format(2))),
      "stale newer commit JSON must be truncated")
    assert(!fs.exists(new Path(s"$export/_delta_log/" + "%020d.checkpoint.parquet".format(2))),
      "stale newer checkpoint must be truncated")
    val (files, _, _) = DeltaInterop.readLog(spark, export)
    assert(spark.read.parquet(files: _*).select("id").as[Long].collect().toSet
      === Set(1L, 2L), "re-exported dir must reconstruct exactly v2")
  }

  test("multi-part checkpoint WRITE: parts split, pointer fields, checkpoint-alone read") {
    // VERDICT r17 task 5: past a file-count threshold the export's own
    // checkpoint must split into the spec's multi-part shape (the r17
    // reader already assembles foreign ones) — at 100k files a single
    // driver-rendered checkpoint parquet is the wrong write path
    val root = "/tmp/graft_test/delta_multipart"
    SnapshotTable.drop(spark, root)
    // 12 files across two commits (coalesce pins file counts)
    SnapshotTable.commit(spark, root,
      (0 until 60).map(k => (k.toLong, s"a$k")).toDF("id", "v").repartition(8))
    SnapshotTable.commitAppend(spark, root,
      (60 until 90).map(k => (k.toLong, s"b$k")).toDF("id", "v").repartition(4))
    val export = "/tmp/graft_test/delta_multipart_out"
    SnapshotTable.drop(spark, export)
    // 14 actions (protocol + metaData + 12 adds) at 4 per part → 4 parts
    DeltaInterop.writeLog(spark, root, export, checkpointPartActions = 4)
    val logDir = new Path(s"$export/_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(logDir).map(_.getPath.getName).toSet
    assert(!names.contains("%020d.checkpoint.parquet".format(1)),
      "multi-part export must not also leave a single-file checkpoint")
    val partRe = "\\d{20}\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet".r
    val partNames = names.filter(n => partRe.pattern.matcher(n).matches()).toSeq.sorted
    assert(partNames.size === 4, names.toString)
    assert(partNames.head ===
      "%020d.checkpoint.%010d.%010d.parquet".format(1, 1, 4), partNames.toString)
    val in = fs.open(new Path(logDir, "_last_checkpoint"))
    val lc = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(lc.contains("\"parts\":4") && lc.contains("\"sizeInBytes\":"), lc)
    // checkpoint-ALONE reconstruction: delete every JSON commit; the
    // reader must rebuild the exact head from the parts + pointer
    fs.listStatus(logDir).map(_.getPath)
      .filter(_.getName.endsWith(".json")).foreach(fs.delete(_, false))
    val (files2, _, _) = DeltaInterop.readLog(spark, export)
    assert(spark.read.parquet(files2: _*).select("id").as[Long].collect().toSet
      === (0L until 90L).toSet, "checkpoint-alone state must equal the head")
    // a RE-export at default threshold collapses back to one file and
    // truncates the stale parts (the multi-part spelling is versioned)
    DeltaInterop.writeLog(spark, root, export)
    val names2 = fs.listStatus(logDir).map(_.getPath.getName).toSet
    assert(names2.contains("%020d.checkpoint.parquet".format(1)), names2.toString)
    assert(!names2.exists(n => partRe.pattern.matcher(n).matches()),
      "stale multi-part files must not survive a single-file re-export")
    val (files3, _, _) = DeltaInterop.readLog(spark, export)
    assert(spark.read.parquet(files3: _*).count() === 90)
  }
}
