package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** Sequence packing for LLM pretraining: concatenate the corpus in
  * doc_id order and chunk it into fixed context windows, reporting
  * each document's global token offset and which chunks it lands in
  * (the concat-and-chunk packing used by GPT-style pipelines).
  *
  * The global offset is a prefix sum — computed as a two-level
  * distributed scan, NOT a single-partition window: range-bucket by
  * the dense doc_id, sum per bucket, cumulate the O(buckets) bucket
  * totals on the driver, then window only WITHIN each bucket. Every
  * stage is O(N/buckets) per task at any corpus size.
  */
object Packing {

  val Ctx = 512L // tokens per packed context window

  private def toks: Column = filter(split(col("text"), "\\s+"), t => length(t) > lit(0))

  def packSequences(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"))
    val nb = s.sessionState.conf.numShufflePartitions
    // pass 1: bucket extent (one max over a pruned single-column scan)
    val maxId = d.agg(max("doc_id")).head().getLong(0)
    val bucketSize = maxId / nb + 1
    val bucketed = d.withColumn("bucket", col("doc_id") / lit(bucketSize) cast "long")
    // per-bucket totals → driver-side cumsum over O(buckets) rows
    val totals = bucketed.groupBy("bucket").agg(sum("n_tokens").as("bsum"))
      .orderBy("bucket").collect()
    var acc = 0L
    val offsets = totals.map { r =>
      val o = (r.getLong(0), acc); acc += r.getLong(1); o
    }.toSeq
    val offsetsDf = s.createDataFrame(offsets).toDF("bucket", "boffset")
    // pass 2: within-bucket scan only — partitioned window, never global
    val local = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(offsetsDf), "bucket")
      .withColumn("offset",
        col("boffset") + coalesce(sum("n_tokens").over(local), lit(0L)))
      .select(
        col("doc_id"), col("n_tokens"), col("offset"),
        expr(s"offset div $Ctx").as("first_chunk"),
        expr(s"(offset + n_tokens - 1) div $Ctx").as("last_chunk"))
      .withColumn("spans_boundary", col("first_chunk") =!= col("last_chunk"))
      .orderBy("doc_id")
  }

  val packOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(LEN(LIST_FILTER(regexp_split_to_array(text, '\\s+'), x -> LEN(x) > 0)) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
       |  FROM t)
       |SELECT doc_id, n_tokens, "offset",
       |  "offset" // $Ctx AS first_chunk,
       |  ("offset" + n_tokens - 1) // $Ctx AS last_chunk,
       |  "offset" // $Ctx <> ("offset" + n_tokens - 1) // $Ctx AS spans_boundary
       |FROM c ORDER BY doc_id""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("text_pack_sequences", packSequences, Some(packOracle)))
}
