package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.{ConnectedComponents, Dedup}
import graft.functions.GraftFunctions
import graft.sources.Tables

/** Dev-only: phase-attributed timing of the dedup_pipeline entry
  * (MinHash-LSH candidates → exact-Jaccard verify → connected
  * components → keep election), ReplicaProfile-style, with the
  * density stats that separate ScaleData's 50× duplicate density
  * from plan cost. Each phase is materialized behind a persist so a
  * phase's time is ITS OWN, not a recompute of everything upstream.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.DedupPipelineProfile <sfDir>
  */
object DedupPipelineProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val d = Tables.load(spark, dir, "documents").select("doc_id", "text")
      .persist()
    val nDocs = t("load")(d.count())
    // ---- phase 0: exact-duplicate pre-pass (the r14 shape)
    val hashKey = when(col("text").isNotNull, sha2(col("text"), 256))
      .otherwise(concat(lit("#"), col("doc_id")))
    val withRep = d.withColumn("rep_id",
      min("doc_id").over(org.apache.spark.sql.expressions.Window
        .partitionBy(hashKey)))
      .persist()
    val reps = withRep.filter(col("doc_id") === col("rep_id"))
      .select("doc_id", "text").persist()
    val nReps = t("exact-prepass")(reps.count())
    println(s"STATS reps=$nReps exactDupRows=${nDocs - nReps}")
    // ---- phase 1: signatures + band explode (distinct texts only)
    val bands = reps
      .select(col("doc_id").as("id"), expr("graft_minhash(text, 64, 3)").as("sig"))
      .select(col("id"), posexplode(
        expr("transform(sequence(0, 15), b -> slice(sig, b*4+1, 4))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      .persist()
    val nBands = t("signatures")(bands.count())
    // bucket density: how much work ScaleData's duplicate density creates
    val sizes = bands.groupBy("band", "band_key").agg(count(lit(1)).as("bsz"))
      .persist()
    t("bucket-stats") {
      val row = sizes.agg(
        count(lit(1)).as("buckets"),
        max("bsz").as("max_bsz"),
        expr("percentile_approx(bsz, 0.99)").as("p99_bsz"),
        sum(when(col("bsz") > 1, col("bsz") * (col("bsz") - 1) / 2))
          .as("uncapped_pairs"),
        sum(when(col("bsz") > Dedup.DefaultBucketCap, col("bsz"))).as("hot_rows"))
        .head()
      println(s"STATS docs=$nDocs bandRows=$nBands buckets=${row.getLong(0)} " +
        s"maxBucket=${row.getLong(1)} p99Bucket=${row.get(2)} " +
        s"uncappedPairs=${row.get(3)} hotBucketRows=${row.get(4)}")
    }
    sizes.unpersist()
    // ---- phase 2: capped candidate generation
    // pre-dedup volume: how many times each pair is re-generated when
    // duplicates agree on every band (the 50×-density multiplier)
    val preDedup = t("cand-nodedup")(
      Dedup.cappedPairs(bands, dedup = false).count())
    println(s"STATS preDedupPairs=$preDedup")
    val cand = Dedup.cappedPairs(bands).persist()
    val nCand = t("candidates")(cand.count())
    println(s"STATS candidatePairs=$nCand multiplicity=${
      if (nCand == 0) 0.0 else preDedup.toDouble / nCand}")
    // ---- phase 3: exact-Jaccard verification (two text joins + expr)
    val edges = cand
      .join(reps.select(col("doc_id").as("id_a"), col("text").as("text_a")), Seq("id_a"))
      .join(reps.select(col("doc_id").as("id_b"), col("text").as("text_b")), Seq("id_b"))
      .filter(expr("graft_ngram_jaccard(text_a, text_b, 3) >= 0.8"))
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .persist()
    val nEdges = t("verify")(edges.count())
    println(f"STATS edges=$nEdges passRate=${
      if (nCand == 0) 0.0 else nEdges.toDouble / nCand}%.4f")
    // ---- phase 4: connected components over exact + near edges
    val exactEdges = withRep.filter(col("doc_id") =!= col("rep_id"))
      .select(col("rep_id").as("src"), col("doc_id").as("dst"))
    val comps = ConnectedComponents.run(
      exactEdges.unionByName(edges), d.select(col("doc_id").as("id")))
      .persist()
    t("cc")(comps.count())
    // ---- phase 5: keep election + ordered emit (the entry's output)
    t("keep+order") {
      val out = comps.withColumn("kept", col("id") === col("component"))
        .select(col("id").as("doc_id"), col("component"), col("kept"))
        .orderBy("doc_id")
      val dups = out.filter(!col("kept")).count()
      println(s"STATS dupRows=$dups clusters=${
        comps.select("component").distinct().count()}")
    }
    spark.stop()
  }
}
