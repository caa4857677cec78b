package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** Registers the custom Catalyst expressions as SQL functions so both
  * the DataFrame API (via `expr("graft_…(…)")`) and plain `spark.sql`
  * can use them. Idempotent per session.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** The single source of truth for the graft_* SQL surface — both
    * registration paths (runtime [[register]] and the
    * `spark.sql.extensions` installer in graft.GraftExtensions) derive
    * from this list, so they can never diverge.
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (es => CosineSimilarity(es(0), es(1))),
    "graft_dot" -> (es => DotProduct(es(0), es(1))),
    "graft_lsh_bucket" -> (es => HyperplaneLsh(es(0), intArg(es(1), "nBits"), longArg(es(2), "seed"))),
    "graft_rand_proj" -> (es => RandomProjection(es(0), intArg(es(1), "outDims"), longArg(es(2), "seed"))),
    "graft_minhash" -> (es => MinHashSignature(es(0), intArg(es(1), "k"), intArg(es(2), "shingle"))),
    "graft_simhash" -> (es => SimHash64(es(0))),
    "graft_mix64" -> (es => Mix64(es(0))),
    "graft_ngram_jaccard" -> (es => NgramJaccard(es(0), es(1), intArg(es(2), "n"))),
    "graft_fingerprint" -> (es => RollingFingerprint(es(0), intArg(es(1), "k"))),
    "graft_topk" -> (es => TopKByScore(es(0), es(1), intArg(es(2), "k"))),
    "graft_topk_str" -> (es => TopKStrings(es(0), es(1), intArg(es(2), "k"))),
    "graft_zvalue" -> (es => ZValue(es(0), es(1))))

  def names: Seq[String] = builders.map(_._1)

  // one registration per session: createOrReplaceTempFunction logs a
  // "replaced a previously registered function" warning on every
  // re-registration, and the registry is called at the top of every
  // query builder — a full bench run used to emit thousands of them.
  // The whole body is synchronized so the set records COMPLETED
  // registration: a check-then-act add() would let a second thread
  // proceed mid-registration and hit "undefined function graft_*".
  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = registered.synchronized {
    if (!registered.contains(spark)) {
      builders.foreach { case (name, b) =>
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
      }
      // graft_topk/graft_topk_str are TypedImperativeAggregates →
      // ObjectHashAggregate, whose sort-based fallback triggers at a
      // DEFAULT of 128 distinct keys per partition. Every bounded
      // top-k here groups by query/doc id (thousands of keys), so the
      // default silently turns the partial agg into a FULL SORT of the
      // N·corpus candidate stream — measured 10×+ on the sf1 exact-kNN
      // sweep. 4M buffers × ~100 B is still well inside an executor;
      // spill safety stays with the sort fallback above that.
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (4 * 1024 * 1024).toString)
      registered.add(spark)
      ()
    }
  }
}
