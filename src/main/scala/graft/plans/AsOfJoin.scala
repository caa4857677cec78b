package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF join: for every left row, the single most recent right row
  * of the same key with `rightTime <= leftTime` (backward as-of,
  * LEFT OUTER semantics) — the standard time-series alignment
  * operator (prices-to-trades; here: attribute a purchase event to
  * the view that preceded it).
  *
  * Spark lacks this operator, so it follows the full custom-operator
  * path: logical node → strategy → physical sort-merge exec
  * (preference order (c) — composing it from built-ins needs an
  * O(matches) join-then-window blowup).
  *
  * Scale: both sides hash-partition on the key (ClusteredDistribution)
  * and sort by (key, time) — exactly a sort-merge join's movement —
  * then each co-partition pair merges in ONE forward pass with O(1)
  * state (the last matching right row). No candidate blowup, no
  * window, spill-friendly sorts.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean = false,
    toleranceMicros: Option[Long] = None,
    nearest: Boolean = false)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoin =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, fwd, tol, near) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd, tol, near) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean = false,
    toleranceMicros: Option[Long] = None,
    nearest: Boolean = false)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTime
    val rt = rightTime
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyTypes = lk.map(_.dataType)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val timeOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(lt.dataType))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)

      val fwd = forward
      val tol = toleranceMicros
      val near = nearest

      new Iterator[InternalRow] {
        private var rHead: InternalRow = if (rIt.hasNext) rIt.next() else null
        private var lastMatch: InternalRow = null      // copied (backward only)
        private var lastMatchTime: Long = 0L
        private var lastMatchKey: UnsafeRow = null     // copied

        override def hasNext: Boolean = lIt.hasNext

        private def advance(): Unit =
          rHead = if (rIt.hasNext) rIt.next() else null

        override def next(): InternalRow = {
          val l = lIt.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeProj(l)
          // drop right rows whose key sorts before the current left key
          while (rHead != null && keyOrd.compare(rKeyProj(rHead), lKey) < 0) advance()

          val r: InternalRow =
            if (fwd) {
              // forward: first right row of this key with time >= left
              // time. Matching rows are NOT consumed (they can serve
              // later left rows); earlier rows can never match later
              // lefts, so skipping them is safe.
              while (rHead != null && keyOrd.compare(rKeyProj(rHead), lKey) == 0 &&
                timeOrd.compare(rTimeProj(rHead), lTime) < 0) advance()
              if (rHead != null && keyOrd.compare(rKeyProj(rHead), lKey) == 0 &&
                tol.forall(t => rTimeProj(rHead).getLong(0) - lTime.getLong(0) <= t))
                rHead
              else nullRight
            } else {
              // backward: remember the latest right row with time <=
              // left time (the closest predecessor)
              if (lastMatchKey == null || keyOrd.compare(lastMatchKey, lKey) != 0) {
                lastMatch = null
              }
              while (rHead != null && keyOrd.compare(rKeyProj(rHead), lKey) == 0 &&
                timeOrd.compare(rTimeProj(rHead), lTime) <= 0) {
                lastMatch = rHead.copy()
                lastMatchTime = rTimeProj(rHead).getLong(0)
                if (lastMatchKey == null || keyOrd.compare(lastMatchKey, lKey) != 0) {
                  lastMatchKey = lKey.copy()
                }
                advance()
              }
              if (near) {
                // nearest: compare the predecessor against the first
                // strictly-later right row (rHead after the absorb
                // loop); ties go to the predecessor
                val fwdCand =
                  if (rHead != null && keyOrd.compare(rKeyProj(rHead), lKey) == 0) rHead
                  else null
                val lt0 = lTime.getLong(0)
                val backGap = if (lastMatch != null) lt0 - lastMatchTime else Long.MaxValue
                val fwdGap =
                  if (fwdCand != null) rTimeProj(fwdCand).getLong(0) - lt0 else Long.MaxValue
                val pick = if (backGap <= fwdGap) lastMatch else fwdCand
                if (pick != null && tol.forall(math.min(backGap, fwdGap) <= _)) pick
                else nullRight
              } else if (lastMatch != null &&
                tol.forall(t => lTime.getLong(0) - lastMatchTime <= t)) lastMatch
              else nullRight
            }
          resultProj(joined(l, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}
