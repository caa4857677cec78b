package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe: positive-path check of the dedup expressions via
  * the registered SQL surface (the corpus has no near-dups, so the
  * oracle runs never exercise detection hits).
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val b = "the quick brown fox jumps over the lazy dog near the river bank yesterday" // near-dup
    val c = "completely different content about spark catalyst expressions and shuffles"
    spark.sql(
      s"""SELECT
         | graft_ngram_jaccard('$a', '$b', 3) AS j_near,
         | graft_ngram_jaccard('$a', '$c', 3) AS j_far,
         | graft_ngram_jaccard('$a', '$a', 3) AS j_self,
         | bit_count(graft_simhash('$a') ^ graft_simhash('$b')) AS simhash_ham_near,
         | bit_count(graft_simhash('$a') ^ graft_simhash('$c')) AS simhash_ham_far,
         | (graft_minhash('$a', 64, 3) = graft_minhash('$a', 64, 3)) AS minhash_self_eq,
         | size(array_intersect(graft_minhash('$a', 64, 3), graft_minhash('$b', 64, 3))) AS minhash_common_near,
         | size(array_intersect(graft_minhash('$a', 64, 3), graft_minhash('$c', 64, 3))) AS minhash_common_far,
         | round(graft_cosine(array(1.0F, 0.0F, 1.0F), array(1.0F, 0.0F, 1.0F)), 6) AS cos_self,
         | round(graft_cosine(array(1.0F, 0.0F), array(0.0F, 1.0F)), 6) AS cos_orth,
         | graft_fingerprint('$a', 8) = graft_fingerprint('$a', 8) AS fp_det
         |""".stripMargin).show(false)
    spark.stop()
  }
}
