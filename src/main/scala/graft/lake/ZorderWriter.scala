package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order clustered rewrite (OPTIMIZE ZORDER semantics).
  *
  * Raw bit-interleaving fails when dimensions have unequal bit widths
  * (the wider dimension's high bits dominate every split), so each
  * dimension is first normalized to a 16-bucket rank from its global
  * min/max (one cheap stats pass, broadcast back), then the bucket
  * ids — now equal-width — are interleaved with `graft_zvalue` and
  * the batch is range-partitioned + sorted on the z-value. Files end
  * up with tight min/max ranges on EVERY clustered dimension, so
  * scans with a predicate on any of them skip most files.
  */
object ZorderWriter {

  private val Buckets = 16

  /** The clustered (range-partitioned + z-sorted) frame, ready for
    * any writer — [[write]] lands it as plain parquet;
    * SnapshotTable.commit with `statsCols = dims` lands it as a
    * snapshot whose per-file min/max are tight on BOTH dimensions,
    * so 2-D box predicates skip through the manifest.
    */
  def clustered(df: DataFrame, dims: Seq[String], nPartitions: Int): DataFrame = {
    require(dims.size == 2, "ZorderWriter interleaves exactly 2 dimensions")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val stats = df.agg(
      min(col(dims.head)).cast("double").as("min0"),
      max(col(dims.head)).cast("double").as("max0"),
      min(col(dims(1))).cast("double").as("min1"),
      max(col(dims(1))).cast("double").as("max1"))
    def bucket(c: Column, mn: Column, mx: Column): Column =
      least(lit(Buckets - 1),
        floor((c.cast("double") - mn) / (mx - mn + lit(1e-9)) * Buckets)).cast("long")
    df.crossJoin(broadcast(stats))
      .withColumn("_b0", bucket(col(dims.head), col("min0"), col("max0")))
      .withColumn("_b1", bucket(col(dims(1)), col("min1"), col("max1")))
      .withColumn("_zval", expr("graft_zvalue(_b0, _b1)"))
      .repartitionByRange(nPartitions, col("_zval"))
      .sortWithinPartitions("_zval")
      .drop("_b0", "_b1", "_zval", "min0", "max0", "min1", "max1")
  }

  def write(df: DataFrame, dims: Seq[String], out: String, nPartitions: Int): Unit =
    clustered(df, dims, nPartitions).write.mode("overwrite").parquet(out)
}
