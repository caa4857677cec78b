package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** Streaming ingestion into a SnapshotTable: every micro-batch is one
  * atomic append commit, giving the continuous version of the
  * reference's Airflow-run → Iceberg-insert loop (each DAG run lands
  * one batch; RUNBOOK.md §5 + §8) with snapshot isolation — readers
  * at version v never see a half-written batch.
  */
object LakeSink {

  /** foreachBatch writer committing each micro-batch to `root`.
    * Empty batches are skipped (no empty snapshots).
    */
  def append(stream: DataFrame, root: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) {
        SnapshotTable.commit(batch.sparkSession, root, batch, append = true)
        ()
      }
    }

  def start(stream: DataFrame, root: String, checkpoint: String): StreamingQuery =
    append(stream, root).option("checkpointLocation", checkpoint).start()
}
