package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._
import graft.plans.AsOfJoinStrategy

/** Production registration path: install everything via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) — planner strategy for the
  * as-of operator plus every graft_* SQL function. The runtime
  * alternative (for sessions you didn't create) is
  * `GraftFunctions.register` + lazy strategy injection in
  * `plans.AsOf`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"expected integer literal, got $other")
  }
  private def longArg(e: Expression): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(s"expected integer literal, got $other")
  }

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (es => CosineSimilarity(es(0), es(1))),
    "graft_dot" -> (es => DotProduct(es(0), es(1))),
    "graft_lsh_bucket" -> (es => HyperplaneLsh(es(0), intArg(es(1)), longArg(es(2)))),
    "graft_minhash" -> (es => MinHashSignature(es(0), intArg(es(1)), intArg(es(2)))),
    "graft_simhash" -> (es => SimHash64(es(0))),
    "graft_ngram_jaccard" -> (es => NgramJaccard(es(0), es(1), intArg(es(2)))),
    "graft_fingerprint" -> (es => RollingFingerprint(es(0), intArg(es(1)))),
    "graft_topk" -> (es => TopKByScore(es(0), es(1), intArg(es(2)))))

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.PruneAsOfJoinColumns)
    e.injectOptimizerRule(_ => graft.plans.PushLimitThroughAsOfJoin)
    fns.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
  }
}
