package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables
import graft.operators.OracleSafe._

/** Price-lake analytics — the query surface a user of the reference's
  * yfinance OHLCV lake (dags/yfinance_to_minio.py:64-71 tidy frame:
  * ticker/ts/open/high/low/close/volume; notebooks cell 5 AVG(close)
  * GROUP BY ticker) actually runs day to day: resampled OHLC bars,
  * VWAP, rolling averages, period returns. Modeled on the synthetic
  * tables: `events` plays the tick stream (event_type = instrument,
  * value = price), `lineitem` plays the trade blotter (extendedprice =
  * notional, quantity = size).
  *
  * Scale notes: OHLC open/close are `min/max(struct(ts, id, value))` —
  * a plain aggregate with map-side partial combine, ONE shuffle on the
  * group keys and no window sort; at 100 TB that beats the textbook
  * ROW_NUMBER formulation (full sort per key) by the width of the sort.
  * Rolling stats window over DAILY bars (cardinality = instruments ×
  * days, already reduced), never over raw ticks.
  */
object Finance {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Deterministic tick ordering: (ts, event_id) is unique. Struct
    * comparison is lexicographic, so min picks the earliest tick and
    * carries its price along — no window, partial-aggregable.
    */
  private val tickOrder = struct(col("ts"), col("event_id"), col("value"))

  // ---------------------------------------------------------------
  /** Daily OHLC bars per instrument: the reference lake's raison
    * d'être (fact_price is an OHLCV table, RUNBOOK.md:91). Open/close
    * via struct-min/max (see scale note above); high/low/volume are
    * trivial partials.
    */
  def ohlcDaily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("event_type", "day")
      .agg(
        min(tickOrder).getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(tickOrder).getField("value").as("close"),
        count(lit(1)).as("n_ticks"))
      .orderBy("event_type", "day")

  val ohlcDailyOracle: String =
    """SELECT event_type, day, open, high, low, close, n_ticks FROM (
      |  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |   MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
      |   MAX(value) AS high, MIN(value) AS low,
      |   MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
      |   COUNT(*) AS n_ticks
      |  FROM (SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE) ORDER BY ts, event_id) AS rn_a,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE) ORDER BY ts DESC, event_id DESC) AS rn_d
      |   FROM events) x
      |  GROUP BY 1, 2) bars
      |ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------
  /** Monthly VWAP from the trade blotter: Σ notional / Σ size, both
    * sums in exact fixed-point so the ratio is order-independent.
    * One partial-aggregable shuffle; group count is bounded
    * (flags × months), so the result is driver-small at any SF.
    */
  def vwapMonthly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .withColumn("month", date_format(col("l_shipdate"), "yyyy-MM"))
      .groupBy("l_returnflag", "month")
      .agg(
        (sum(cents(col("l_extendedprice"))).cast("double") /
          sum(cents(col("l_quantity"))).cast("double")).as("vwap"),
        sumMoney(col("l_extendedprice")).as("notional"),
        count(lit(1)).as("n_trades"))
      .orderBy("l_returnflag", "month")

  val vwapMonthlyOracle: String =
    s"""SELECT l_returnflag, strftime(l_shipdate, '%Y-%m') AS month,
       | CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
       |   / CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) AS vwap,
       | ${sqlSumMoney("l_extendedprice", "notional")},
       | COUNT(*) AS n_trades
       |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  /** 7-day moving average price per instrument, computed over daily
    * bars (not ticks): inner agg reduces to instruments × days rows,
    * then the window sums two exact integers over a 7-row frame —
    * the division is the only float op, so the result is
    * order-independent. ISO day strings sort chronologically.
    */
  def movingAvg(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("event_type", "day")
      .agg(sum(cents(col("value"))).as("day_cents"), count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    daily
      .withColumn("ma7",
        sum(col("day_cents")).over(w).cast("double") / lit(100.0) /
          sum(col("n")).over(w).cast("double"))
      .select("event_type", "day", "ma7", "n")
      .orderBy("event_type", "day")
  }

  val movingAvgOracle: String =
    """SELECT event_type, day,
      | CAST(SUM(day_cents) OVER w AS DOUBLE) / 100.0 / CAST(SUM(n) OVER w AS DOUBLE) AS ma7,
      | n
      |FROM (
      |  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS day_cents, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2) daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------
  /** Day-over-day close-to-close returns in basis points. Close comes
    * from the same struct-max aggregate as the OHLC bars; LAG runs
    * over daily bars. The ratio of two raw doubles is IEEE-exact in
    * both engines; ROUND(...) pins the hash.
    */
  def dailyReturns(s: SparkSession, dir: String): DataFrame = {
    val bars = t(s, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("event_type", "day")
      .agg(max(tickOrder).getField("value").as("close"))
    val w = Window.partitionBy("event_type").orderBy("day")
    bars
      .withColumn("prev_close", lag("close", 1).over(w))
      .withColumn("ret_bps",
        round((col("close") / col("prev_close") - 1) * 10000).cast("long"))
      .select("event_type", "day", "close", "ret_bps")
      .orderBy("event_type", "day")
  }

  val dailyReturnsOracle: String =
    """SELECT event_type, day, close,
      | CAST(ROUND((close / LAG(close) OVER (PARTITION BY event_type ORDER BY day) - 1) * 10000) AS BIGINT) AS ret_bps
      |FROM (
      |  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |   MAX(CASE WHEN rn_d = 1 THEN value END) AS close
      |  FROM (SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE) ORDER BY ts DESC, event_id DESC) AS rn_d
      |   FROM events) x
      |  GROUP BY 1, 2) bars
      |ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------
  /** Weekly resample of the daily bars: OHLC re-aggregates
    * hierarchically (open = open of first day, close = close of last
    * day, high/low = extrema) — the same struct-ordering trick one
    * level up, so the weekly rollup reads bars, never ticks. Weeks
    * bucket as Monday-aligned date_trunc.
    */
  def ohlcWeekly(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("event_type", "day")
      .agg(
        min(tickOrder).getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(tickOrder).getField("value").as("close"),
        count(lit(1)).as("n_ticks"))
    daily
      .withColumn("week",
        date_format(date_trunc("week", col("day").cast("date")), "yyyy-MM-dd"))
      .groupBy("event_type", "week")
      .agg(
        min(struct(col("day"), col("open"))).getField("open").as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max(struct(col("day"), col("close"))).getField("close").as("close"),
        sum(col("n_ticks")).as("n_ticks"))
      .orderBy("event_type", "week")
  }

  val ohlcWeeklyOracle: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |   MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
      |   MAX(value) AS high, MIN(value) AS low,
      |   MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
      |   COUNT(*) AS n_ticks
      |  FROM (SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE) ORDER BY ts, event_id) AS rn_a,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE) ORDER BY ts DESC, event_id DESC) AS rn_d
      |   FROM events) x GROUP BY 1, 2),
      |weekly AS (
      |  SELECT event_type,
      |   CAST(date_trunc('week', CAST(day AS DATE)) AS VARCHAR) AS week, day,
      |   open, high, low, close, n_ticks,
      |   ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('week', CAST(day AS DATE)) ORDER BY day) AS rn_a,
      |   ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('week', CAST(day AS DATE)) ORDER BY day DESC) AS rn_d
      |  FROM daily)
      |SELECT event_type, week,
      | MAX(CASE WHEN rn_a = 1 THEN open END) AS open,
      | MAX(high) AS high, MIN(low) AS low,
      | MAX(CASE WHEN rn_d = 1 THEN close END) AS close,
      | CAST(SUM(n_ticks) AS BIGINT) AS n_ticks
      |FROM weekly GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  /** 7-day rolling volatility of daily returns, in bps: variance from
    * the exact integer sums Σr and Σr² over the window frame (same
    * order-independence argument as [[correlation]]); sqrt at the end.
    * Sample variance over the frame's n observations.
    */
  def rollingVol(s: SparkSession, dir: String): DataFrame = {
    val wLag = Window.partitionBy("event_type").orderBy("day")
    val wRoll = wLag.rowsBetween(-6, 0)
    t(s, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("event_type", "day")
      .agg(max(tickOrder).getField("value").as("close"))
      .withColumn("r",
        round((col("close") / lag("close", 1).over(wLag) - 1) * 10000).cast("long"))
      .filter(col("r").isNotNull)
      .withColumn("n", count(col("r")).over(wRoll))
      .withColumn("sr", sum(col("r")).over(wRoll))
      .withColumn("srr", sum(col("r") * col("r")).over(wRoll))
      .filter(col("n") >= 2)
      .select(col("event_type"), col("day"),
        sqrt((col("n") * col("srr") - col("sr") * col("sr")).cast("double") /
          (col("n") * (col("n") - 1)).cast("double")).as("vol_bps"),
        col("n"))
      .orderBy("event_type", "day")
  }

  val rollingVolOracle: String =
    """SELECT event_type, day,
      | SQRT(CAST(n * srr - sr * sr AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)) AS vol_bps,
      | n
      |FROM (
      |  SELECT event_type, day,
      |   COUNT(r) OVER w AS n, SUM(r) OVER w AS sr, SUM(r * r) OVER w AS srr
      |  FROM (
      |    SELECT event_type, day,
      |     CAST(ROUND((close / LAG(close) OVER (PARTITION BY event_type ORDER BY day) - 1) * 10000) AS BIGINT) AS r
      |    FROM (
      |      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |       MAX(CASE WHEN rn_d = 1 THEN value END) AS close
      |      FROM (SELECT *,
      |        ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE) ORDER BY ts DESC, event_id DESC) AS rn_d
      |       FROM events) x GROUP BY 1, 2) bars
      |    QUALIFY r IS NOT NULL) rets
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) s
      |WHERE n >= 2 ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------
  /** Max drawdown per instrument: running peak of the close, then the
    * worst peak-to-trough drop in bps. Windows run over daily bars
    * (bounded partitions); the running max is deterministic, the
    * close/peak ratio is IEEE-exact, ROUND pins the hash.
    */
  def drawdown(s: SparkSession, dir: String): DataFrame = {
    val bars = t(s, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("event_type", "day")
      .agg(max(tickOrder).getField("value").as("close"))
    val wRun = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bars
      .withColumn("peak", max(col("close")).over(wRun))
      .withColumn("dd_bps",
        round((col("close") / col("peak") - 1) * 10000).cast("long"))
      .groupBy("event_type")
      .agg(min(col("dd_bps")).as("max_drawdown_bps"), count(lit(1)).as("n_days"))
      .orderBy("event_type")
  }

  val drawdownOracle: String =
    """SELECT event_type, MIN(dd_bps) AS max_drawdown_bps, COUNT(*) AS n_days
      |FROM (
      |  SELECT event_type,
      |   CAST(ROUND((close / MAX(close) OVER (PARTITION BY event_type ORDER BY day
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1) * 10000) AS BIGINT) AS dd_bps
      |  FROM (
      |    SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |     MAX(CASE WHEN rn_d = 1 THEN value END) AS close
      |    FROM (SELECT *,
      |      ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE) ORDER BY ts DESC, event_id DESC) AS rn_d
      |     FROM events) x
      |    GROUP BY 1, 2) bars) dd
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  /** Pairwise return correlation between instruments. The naive
    * `corr()` aggregate sums double products in partition order —
    * non-deterministic under parallelism — so returns are first
    * quantized to integer bps and the five correlation sums are EXACT
    * BIGINTs; the Pearson formula turns float only at the final
    * sqrt/divide, which is IEEE-identical in any engine. Self-join is
    * on daily bars (dimension-bounded), not ticks.
    */
  def correlation(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    val ret = t(s, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("event_type", "day")
      .agg(max(tickOrder).getField("value").as("close"))
      .withColumn("prev", lag("close", 1).over(w))
      .withColumn("r", round((col("close") / col("prev") - 1) * 10000).cast("long"))
      .filter(col("r").isNotNull)
      .select("event_type", "day", "r")
    val a = ret.toDF("a_type", "day", "x")
    val b = ret.toDF("b_type", "day", "y")
    a.join(b, "day").filter(col("a_type") < col("b_type"))
      .groupBy("a_type", "b_type")
      .agg(
        count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("a_type"), col("b_type"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("corr_ret"))
      .orderBy("a_type", "b_type")
  }

  val correlationOracle: String =
    """WITH bars AS (
      |  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |   MAX(CASE WHEN rn_d = 1 THEN value END) AS close
      |  FROM (SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE) ORDER BY ts DESC, event_id DESC) AS rn_d
      |   FROM events) t GROUP BY 1, 2),
      |ret AS (
      |  SELECT event_type, day,
      |   CAST(ROUND((close / LAG(close) OVER (PARTITION BY event_type ORDER BY day) - 1) * 10000) AS BIGINT) AS r
      |  FROM bars QUALIFY r IS NOT NULL),
      |sums AS (
      |  SELECT a.event_type AS a_type, b.event_type AS b_type, COUNT(*) AS n,
      |   SUM(a.r) AS sx, SUM(b.r) AS sy, SUM(a.r * b.r) AS sxy,
      |   SUM(a.r * a.r) AS sxx, SUM(b.r * b.r) AS syy
      |  FROM ret a JOIN ret b ON a.day = b.day AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT a_type, b_type, n,
      | CAST(n * sxy - sx * sy AS DOUBLE) /
      |  (SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) * SQRT(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_ret
      |FROM sums ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  /** Market beta per instrument: OLS slope of instrument returns on
    * the equal-weight market return. The market is carried as the
    * integer SUM of per-instrument bps returns (mean = sum / T
    * instruments, so beta_vs_mean = T × beta_vs_sum — one exact
    * integer rescale instead of a float mean); all five regression
    * sums are exact BIGINTs, float only at the final ratio. Same
    * order-independence argument as [[correlation]].
    */
  def beta(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    val ret = t(s, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("event_type", "day")
      .agg(max(tickOrder).getField("value").as("close"))
      .withColumn("r",
        round((col("close") / lag("close", 1).over(w) - 1) * 10000).cast("long"))
      .filter(col("r").isNotNull)
      .select("event_type", "day", "r")
    val nTypes = ret.select("event_type").distinct().count()
    val market = ret.groupBy("day").agg(sum(col("r")).as("m"))
    ret.join(market, "day")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"), sum(col("r")).as("sx"), sum(col("m")).as("sm"),
        sum(col("r") * col("m")).as("sxm"), sum(col("m") * col("m")).as("smm"))
      .select(col("event_type"), col("n"),
        (lit(nTypes.toDouble) *
          ((col("n") * col("sxm") - col("sx") * col("sm")).cast("double") /
            (col("n") * col("smm") - col("sm") * col("sm")).cast("double"))).as("beta"))
      .orderBy("event_type")
  }

  val betaOracle: String =
    """WITH bars AS (
      |  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |   MAX(CASE WHEN rn_d = 1 THEN value END) AS close
      |  FROM (SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE) ORDER BY ts DESC, event_id DESC) AS rn_d
      |   FROM events) t GROUP BY 1, 2),
      |ret AS (
      |  SELECT event_type, day,
      |   CAST(ROUND((close / LAG(close) OVER (PARTITION BY event_type ORDER BY day) - 1) * 10000) AS BIGINT) AS r
      |  FROM bars QUALIFY r IS NOT NULL),
      |nt AS (SELECT COUNT(DISTINCT event_type) AS n_types FROM ret),
      |mkt AS (SELECT day, SUM(r) AS m FROM ret GROUP BY 1),
      |sums AS (
      |  SELECT event_type, COUNT(*) AS n, SUM(r) AS sx, SUM(m) AS sm,
      |   SUM(r * m) AS sxm, SUM(m * m) AS smm
      |  FROM ret JOIN mkt USING (day) GROUP BY 1)
      |SELECT event_type, n,
      | CAST(nt.n_types AS DOUBLE) *
      |  (CAST(n * sxm - sx * sm AS DOUBLE) / CAST(n * smm - sm * sm AS DOUBLE)) AS beta
      |FROM sums CROSS JOIN nt ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  /** Calendar gap-fill + last-observation-carried-forward: market
    * holidays leave holes in the bar series; downstream models want a
    * dense panel. Gaps are planted by dropping four known days from
    * the tick stream, then a calendar spine (instrument × day cross
    * join — cardinality instruments × days, tiny next to the ticks)
    * left-joins the bars and LOCF fills the close. The window carries
    * per instrument over days — bounded partitions, no global sort.
    */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    val holidays = Seq("2024-01-04", "2024-01-11", "2024-01-18", "2024-01-25")
    val bars = t(s, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .filter(!col("day").isin(holidays: _*))
      .groupBy("event_type", "day")
      .agg(max(tickOrder).getField("value").as("close"))
    val spine = bars.select("event_type").distinct()
      .crossJoin(s.range(1)
        .select(explode(sequence(
          to_date(lit("2024-01-01")), to_date(lit("2024-01-30")))).as("d"))
        .select(col("d").cast("string").as("day")))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(bars, Seq("event_type", "day"), "left")
      .withColumn("close_filled", last("close", ignoreNulls = true).over(w))
      .withColumn("is_gap", col("close").isNull)
      .select("event_type", "day", "close_filled", "is_gap")
      .orderBy("event_type", "day")
  }

  val gapFillOracle: String =
    """SELECT event_type, day,
      | LAST_VALUE(close IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY day
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_filled,
      | (close IS NULL) AS is_gap
      |FROM (
      |  SELECT s.event_type, s.day, bars.close
      |  FROM (SELECT et.event_type, CAST(d.day AS VARCHAR) AS day
      |        FROM (SELECT DISTINCT event_type FROM events
      |              WHERE CAST(CAST(ts AS DATE) AS VARCHAR) NOT IN
      |                ('2024-01-04','2024-01-11','2024-01-18','2024-01-25')) et
      |        CROSS JOIN (SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS day) d) s
      |  LEFT JOIN (
      |    SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |     MAX(CASE WHEN rn_d = 1 THEN value END) AS close
      |    FROM (SELECT *,
      |      ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE) ORDER BY ts DESC, event_id DESC) AS rn_d
      |     FROM events
      |     WHERE CAST(CAST(ts AS DATE) AS VARCHAR) NOT IN
      |       ('2024-01-04','2024-01-11','2024-01-18','2024-01-25')) x
      |    GROUP BY 1, 2) bars
      |   ON s.event_type = bars.event_type AND s.day = bars.day) panel
      |ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------
  /** Two-factor OLS per instrument: daily return regressed on the
    * market factor (cross-sectional return sum) and a momentum factor
    * (the lagged market return), with intercept — the multi-factor
    * extension of [[beta]].
    *
    * Everything through the moment matrix is EXACT integer arithmetic
    * (returns quantized to bps, sums/products of longs), so the
    * moments are order-independent under any partitioning; the 3×3
    * normal-equation solve (Cramer on centered moments) then runs in
    * double on identical integers on both sides — deterministic IEEE,
    * hash-safe. One shuffle for the bars, one for the per-instrument
    * moments; the factor series (one row per day) broadcasts. The
    * day-ordered lag window is over the bounded daily factor series
    * (cardinality = days), not ticks.
    */
  def factorRegression(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    val ret = t(s, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("event_type", "day")
      .agg(max(tickOrder).getField("value").as("close"))
      .withColumn("r",
        round((col("close") / lag("close", 1).over(w) - 1) * 10000).cast("long"))
      .filter(col("r").isNotNull)
      .select("event_type", "day", "r")
    val wd = Window.orderBy("day") // bounded: one row per trading day
    val fac = ret.groupBy("day").agg(sum(col("r")).as("m"))
      .withColumn("m1", lag("m", 1).over(wd))
      .filter(col("m1").isNotNull)
    val mom = ret.join(broadcast(fac), "day")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"), sum(col("r")).as("sy"),
        sum(col("m")).as("s1"), sum(col("m1")).as("s2"),
        sum(col("m") * col("m")).as("s11"), sum(col("m") * col("m1")).as("s12"),
        sum(col("m1") * col("m1")).as("s22"),
        sum(col("r") * col("m")).as("sy1"), sum(col("r") * col("m1")).as("sy2"))
    val c11 = (col("n") * col("s11") - col("s1") * col("s1")).cast("double")
    val c12 = (col("n") * col("s12") - col("s1") * col("s2")).cast("double")
    val c22 = (col("n") * col("s22") - col("s2") * col("s2")).cast("double")
    val cy1 = (col("n") * col("sy1") - col("sy") * col("s1")).cast("double")
    val cy2 = (col("n") * col("sy2") - col("sy") * col("s2")).cast("double")
    val det = c11 * c22 - c12 * c12
    val b1 = (cy1 * c22 - cy2 * c12) / det
    val b2 = (cy2 * c11 - cy1 * c12) / det
    mom.select(col("event_type"), col("n"),
        round(b1, 8).as("beta_mkt"), round(b2, 8).as("beta_mom"),
        round((col("sy").cast("double") - b1 * col("s1").cast("double")
          - b2 * col("s2").cast("double")) / col("n").cast("double"), 8).as("alpha_bps"))
      .orderBy("event_type")
  }

  val factorRegressionOracle: String =
    """WITH bars AS (
      |  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |   MAX(CASE WHEN rn_d = 1 THEN value END) AS close
      |  FROM (SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE) ORDER BY ts DESC, event_id DESC) AS rn_d
      |   FROM events) t GROUP BY 1, 2),
      |ret AS (
      |  SELECT event_type, day,
      |   CAST(ROUND((close / LAG(close) OVER (PARTITION BY event_type ORDER BY day) - 1) * 10000) AS BIGINT) AS r
      |  FROM bars QUALIFY r IS NOT NULL),
      |fac AS (
      |  SELECT day, m, m1 FROM (
      |   SELECT day, m, LAG(m) OVER (ORDER BY day) AS m1
      |   FROM (SELECT day, SUM(r) AS m FROM ret GROUP BY 1) dm) f
      |  WHERE m1 IS NOT NULL),
      |mom AS (
      |  SELECT event_type, COUNT(*) AS n, SUM(r) AS sy,
      |   SUM(m) AS s1, SUM(m1) AS s2,
      |   SUM(m * m) AS s11, SUM(m * m1) AS s12, SUM(m1 * m1) AS s22,
      |   SUM(r * m) AS sy1, SUM(r * m1) AS sy2
      |  FROM ret JOIN fac USING (day) GROUP BY 1),
      |solved AS (
      |  SELECT event_type, n, sy, s1, s2,
      |   CAST(n * s11 - s1 * s1 AS DOUBLE) AS c11,
      |   CAST(n * s12 - s1 * s2 AS DOUBLE) AS c12,
      |   CAST(n * s22 - s2 * s2 AS DOUBLE) AS c22,
      |   CAST(n * sy1 - sy * s1 AS DOUBLE) AS cy1,
      |   CAST(n * sy2 - sy * s2 AS DOUBLE) AS cy2
      |  FROM mom)
      |SELECT event_type, n,
      | ROUND((cy1 * c22 - cy2 * c12) / (c11 * c22 - c12 * c12), 8) AS beta_mkt,
      | ROUND((cy2 * c11 - cy1 * c12) / (c11 * c22 - c12 * c12), 8) AS beta_mom,
      | ROUND((CAST(sy AS DOUBLE)
      |   - ((cy1 * c22 - cy2 * c12) / (c11 * c22 - c12 * c12)) * CAST(s1 AS DOUBLE)
      |   - ((cy2 * c11 - cy1 * c12) / (c11 * c22 - c12 * c12)) * CAST(s2 AS DOUBLE))
      |  / CAST(n AS DOUBLE), 8) AS alpha_bps
      |FROM solved ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  val queries: Seq[Q] = Seq(
    Q("q_fin_factor_regression", factorRegression, Some(factorRegressionOracle)),
    Q("q_fin_ohlc_daily", ohlcDaily, Some(ohlcDailyOracle)),
    Q("q_fin_vwap", vwapMonthly, Some(vwapMonthlyOracle)),
    Q("q_fin_moving_avg", movingAvg, Some(movingAvgOracle)),
    Q("q_fin_returns", dailyReturns, Some(dailyReturnsOracle)),
    Q("q_fin_gapfill", gapFill, Some(gapFillOracle)),
    Q("q_fin_drawdown", drawdown, Some(drawdownOracle)),
    Q("q_fin_correlation", correlation, Some(correlationOracle)),
    Q("q_fin_ohlc_weekly", ohlcWeekly, Some(ohlcWeeklyOracle)),
    Q("q_fin_rolling_vol", rollingVol, Some(rollingVolOracle)),
    Q("q_fin_beta", beta, Some(betaOracle)))
}
