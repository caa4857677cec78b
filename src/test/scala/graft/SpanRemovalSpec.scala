package graft

/** Focused pin for dedup_span_removal's r21 internals change: window
  * hashes are now computed numerically (xxhash64 over the 15-long
  * slice of a per-token-hash array) instead of hashing a concat_ws
  * string per window. The output depends only on window EQUALITY
  * classes, so it must be bit-identical — verified here against a
  * hand-computed corpus exercising every branch: a window shared
  * across docs (excised from both), a unique-window doc (untouched),
  * and a sub-window-size doc (no windows, fully kept).
  */
class SpanRemovalSpec extends SparkSpec {
  import spark.implicits._

  test("duplicated 15-token windows are excised; unique and short docs untouched") {
    val dir = "/tmp/graft_test/span_removal_src"
    val shared = (1 to 15).map(i => s"w$i").mkString(" ")
    val tail = (c: String) => (16 to 20).map(i => s"$c$i").mkString(" ")
    val uniq = (1 to 20).map(i => s"c$i").mkString(" ")
    val short = (1 to 10).map(i => s"d$i").mkString(" ")
    Seq(
      (1L, s"$shared ${tail("a")}"), // shares window at pos 0 with doc 2
      (2L, s"$shared ${tail("b")}"),
      (3L, uniq),                    // every window unique
      (4L, short))                   // 10 tokens < window size
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = dedup.Dedup.spanRemoval(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSeq === Seq(
      (1L, 20L, 1L, 15L, tail("a")),
      (2L, 20L, 1L, 15L, tail("b")),
      (3L, 20L, 0L, 0L, uniq),
      (4L, 10L, 0L, 0L, short)))
  }
}
