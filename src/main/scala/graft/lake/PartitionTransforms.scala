package graft.lake

import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DateType, StringType, TimestampType}

/** Best-effort derivation of `day(ts)` partition bounds from a row
  * predicate — the piece that makes HIDDEN partitioning useful: the
  * user filters on `ts`, the table is partitioned by the transform
  * `day(ts)` (reference DDL `WITH (partitioning = ARRAY['day(ts)'])`,
  * RUNBOOK.md:91), and scan planning maps the ts bounds through the
  * transform to skip partitions.
  *
  * Correctness NEVER depends on this: the full predicate is always
  * re-applied after the scan, so an unrecognized predicate shape just
  * means no pruning (scan everything), exactly like Iceberg's residual
  * evaluation.
  */
object PartitionTransforms {

  private val Utc = ZoneOffset.UTC

  private def dayOfMicros(us: Long): String =
    LocalDate.ofInstant(Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L), Utc).toString

  /** Evaluate a foldable expression to a yyyy-MM-dd day string. */
  private def dayOf(raw: Expression): Option[String] = {
    // literals arrive as un-timezoned casts (col >= lit("…").cast("timestamp"));
    // resolve them against UTC — the session timezone graft runs with
    val e = raw.transform {
      case t: TimeZoneAwareExpression if t.timeZoneId.isEmpty => t.withTimeZone("UTC")
    }
    if (!e.foldable) None
    else
      try e.dataType match {
        case TimestampType => Option(e.eval()).map(v => dayOfMicros(v.asInstanceOf[Long]))
        case DateType => Option(e.eval()).map(v => LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString)
        case StringType => Option(e.eval()).map(_.toString.take(10))
        case _ => None
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def isCol(e: Expression, name: String): Boolean = e match {
    case u: UnresolvedAttribute => u.name == name
    case a: AttributeReference => a.name == name
    case _ => false
  }

  /** (lower day, upper day) bounds implied by `e` for column `src`
    * (inclusive, at day granularity). (None, None) = cannot prune.
    */
  def dayBounds(e: Expression, src: String): (Option[String], Option[String]) = e match {
    case And(l, r) =>
      val (ll, lu) = dayBounds(l, src)
      val (rl, ru) = dayBounds(r, src)
      (tighterLo(ll, rl), tighterHi(lu, ru))
    case GreaterThanOrEqual(a, v) if isCol(a, src) => (dayOf(v), None)
    case GreaterThan(a, v) if isCol(a, src) => (dayOf(v), None) // day granularity: ts > x ⇒ day ≥ day(x)
    case LessThanOrEqual(a, v) if isCol(a, src) => (None, dayOf(v))
    case LessThan(a, v) if isCol(a, src) => (None, dayOf(v))
    case EqualTo(a, v) if isCol(a, src) => (dayOf(v), dayOf(v))
    // mirrored operand order
    case GreaterThanOrEqual(v, a) if isCol(a, src) => (None, dayOf(v))
    case GreaterThan(v, a) if isCol(a, src) => (None, dayOf(v))
    case LessThanOrEqual(v, a) if isCol(a, src) => (dayOf(v), None)
    case LessThan(v, a) if isCol(a, src) => (dayOf(v), None)
    case _ => (None, None)
  }

  private def tighterLo(a: Option[String], b: Option[String]) =
    (a ++ b).reduceOption((x, y) => if (x >= y) x else y)
  private def tighterHi(a: Option[String], b: Option[String]) =
    (a ++ b).reduceOption((x, y) => if (x <= y) x else y)

  /** Evaluate a foldable expression to a numeric value. */
  private def numOf(e: Expression): Option[Double] =
    if (!e.foldable) None
    else
      try Option(e.eval()).collect {
        case n: Number => n.doubleValue()
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
      } catch { case scala.util.control.NonFatal(_) => None }

  /** (lower, upper) numeric bounds implied by `e` for column `src` —
    * inclusive at file granularity (strict < / > relax to <= / >=,
    * which can only over-scan, never under-scan). Drives per-file
    * min/max stats skipping; like [[dayBounds]], correctness never
    * depends on it — the residual predicate always re-applies.
    */
  def numericBounds(e: Expression, src: String): (Option[Double], Option[Double]) = e match {
    case And(l, r) =>
      val (ll, lu) = numericBounds(l, src)
      val (rl, ru) = numericBounds(r, src)
      (maxOpt(ll, rl), minOpt(lu, ru))
    case GreaterThanOrEqual(a, v) if isCol(a, src) => (numOf(v), None)
    case GreaterThan(a, v) if isCol(a, src) => (numOf(v), None)
    case LessThanOrEqual(a, v) if isCol(a, src) => (None, numOf(v))
    case LessThan(a, v) if isCol(a, src) => (None, numOf(v))
    case EqualTo(a, v) if isCol(a, src) => (numOf(v), numOf(v))
    case GreaterThanOrEqual(v, a) if isCol(a, src) => (None, numOf(v))
    case GreaterThan(v, a) if isCol(a, src) => (None, numOf(v))
    case LessThanOrEqual(v, a) if isCol(a, src) => (numOf(v), None)
    case LessThan(v, a) if isCol(a, src) => (numOf(v), None)
    case EqualTo(v, a) if isCol(a, src) => (numOf(v), numOf(v))
    case _ => (None, None)
  }

  private def maxOpt(a: Option[Double], b: Option[Double]): Option[Double] =
    (a.toSeq ++ b.toSeq).reduceOption((x, y) => math.max(x, y))
  private def minOpt(a: Option[Double], b: Option[Double]): Option[Double] =
    (a.toSeq ++ b.toSeq).reduceOption((x, y) => math.min(x, y))

  /** Evaluate a foldable expression to UTF-8 bound bytes. */
  private def strOf(e: Expression): Option[Array[Byte]] =
    if (!e.foldable || e.dataType != StringType) None
    else
      try Option(e.eval()).map(
        _.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      catch { case scala.util.control.NonFatal(_) => None }

  /** (lower, upper) STRING bounds implied by `e` for column `src`, as
    * UTF-8 bytes under unsigned lexicographic order — UTF8String's own
    * comparison order AND the order parquet string footer stats are
    * kept in, so the file-interval test is exact. Inclusive at file
    * granularity (strict relaxes to non-strict: over-scan only), like
    * [[numericBounds]]; the residual predicate always re-applies.
    */
  def stringBounds(e: Expression, src: String)(
      implicit ord: Ordering[Array[Byte]]): (Option[Array[Byte]], Option[Array[Byte]]) =
    e match {
      case And(l, r) =>
        val (ll, lu) = stringBounds(l, src)
        val (rl, ru) = stringBounds(r, src)
        (bMax(ll, rl), bMin(lu, ru))
      case GreaterThanOrEqual(a, v) if isCol(a, src) => (strOf(v), None)
      case GreaterThan(a, v) if isCol(a, src) => (strOf(v), None)
      case LessThanOrEqual(a, v) if isCol(a, src) => (None, strOf(v))
      case LessThan(a, v) if isCol(a, src) => (None, strOf(v))
      case EqualTo(a, v) if isCol(a, src) => (strOf(v), strOf(v))
      case GreaterThanOrEqual(v, a) if isCol(a, src) => (None, strOf(v))
      case GreaterThan(v, a) if isCol(a, src) => (None, strOf(v))
      case LessThanOrEqual(v, a) if isCol(a, src) => (strOf(v), None)
      case LessThan(v, a) if isCol(a, src) => (strOf(v), None)
      case EqualTo(v, a) if isCol(a, src) => (strOf(v), strOf(v))
      // a prefix predicate bounds the range [prefix, prefix+∞): every
      // matching string is >= prefix, and <= any string of
      // prefix-with-last-byte-bumped is NOT safe under arbitrary bytes
      // — the lower bound alone already skips disjoint sorted files
      case StartsWith(a, v) if isCol(a, src) => (strOf(v), None)
      case _ => (None, None)
    }

  private def bMax(a: Option[Array[Byte]], b: Option[Array[Byte]])(
      implicit ord: Ordering[Array[Byte]]): Option[Array[Byte]] =
    (a.toSeq ++ b.toSeq).reduceOption((x, y) => ord.max(x, y))
  private def bMin(a: Option[Array[Byte]], b: Option[Array[Byte]])(
      implicit ord: Ordering[Array[Byte]]): Option[Array[Byte]] =
    (a.toSeq ++ b.toSeq).reduceOption((x, y) => ord.min(x, y))

  /** Equality/IN literal values for column `src` in `e` (catalyst-
    * internal representations with their types, ready for
    * XxHash64Function). Any one conjunct's equality set is enough to
    * drive bloom skipping — a file missing ALL of the values cannot
    * satisfy that conjunct.
    */
  def equalityValues(e: Expression, src: String): Option[Seq[(Any, org.apache.spark.sql.types.DataType)]] = e match {
    case And(l, r) => equalityValues(l, src).orElse(equalityValues(r, src))
    case EqualTo(a, v) if isCol(a, src) && v.foldable =>
      Option(v.eval()).map(x => Seq((x, v.dataType)))
    case EqualTo(v, a) if isCol(a, src) && v.foldable =>
      Option(v.eval()).map(x => Seq((x, v.dataType)))
    case In(a, vs) if isCol(a, src) && vs.forall(_.foldable) =>
      val evaled = vs.map(v => (v.eval(), v.dataType))
      if (evaled.exists(_._1 == null)) None else Some(evaled)
    case InSet(a, vs) if isCol(a, src) =>
      if (vs.contains(null)) None else Some(vs.toSeq.map((_, a.dataType)))
    case _ => None
  }
}
