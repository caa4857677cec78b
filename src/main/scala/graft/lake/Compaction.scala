package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction: bin-pack many small parquet files into
  * ~targetBytes outputs without a shuffle (`coalesce`, not
  * `repartition` — compaction must not pay an exchange).
  *
  * The reference's ingest writes one file per partition per run
  * (dags/yfinance_to_minio.py:90-97), which accumulates small files —
  * the classic lake maintenance problem Iceberg's rewrite_data_files
  * solves; this is the Spark-native equivalent.
  */
object Compaction {

  /** Returns (filesBefore, filesAfter). */
  def compact(s: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val in = new Path(inPath)
    val fs = in.getFileSystem(s.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(in).filter(_.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    s.read.parquet(inPath).coalesce(nOut)
      .write.mode("overwrite").parquet(outPath)
    val after = new Path(outPath).getFileSystem(s.sparkContext.hadoopConfiguration)
      .listStatus(new Path(outPath)).count(_.getPath.getName.endsWith(".parquet"))
    (files.length, after)
  }
}
