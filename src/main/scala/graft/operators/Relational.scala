package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables
import OracleSafe._

/** §2A relational / SQL core — the Trino query surface of the
  * reference lake (cf. /root/reference/RUNBOOK.md §9, notebook cell 6)
  * re-expressed as Catalyst-optimized DataFrame plans.
  *
  * Scale notes (100 TB):
  *  - facts (lineitem/orders/events) are never broadcast; dimension
  *    tables (region/nation/supplier/part/customer) are broadcast to
  *    kill shuffles on the probe side.
  *  - aggregations use map-side partial agg (automatic for
  *    groupBy.agg), top-k uses TakeOrderedAndProject (orderBy.limit).
  *  - float aggregates go through OracleSafe fixed-point so results
  *    are order-independent → identical under any partitioning.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def ts(lit0: String): Column = lit(lit0).cast("timestamp")

  // ---------------------------------------------------------------
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumMoney(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sumMoney(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        sumMoney(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        avgFixed(col("l_quantity")).as("avg_qty"),
        avgFixed(col("l_extendedprice")).as("avg_price"),
        avgFixed(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q01Oracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       | ${sqlSumMoney("l_quantity", "sum_qty")},
       | ${sqlSumMoney("l_extendedprice", "sum_base_price")},
       | ${sqlSumMoney("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
       | ${sqlSumMoney("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
       | ${sqlAvgFixed("l_quantity", "avg_qty")},
       | ${sqlAvgFixed("l_extendedprice", "avg_price")},
       | ${sqlAvgFixed("l_discount", "avg_disc")},
       | COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------
  def q06RevenueFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.06 && col("l_quantity") < 24)
      .agg(
        sumMoney(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))

  val q06Oracle: String =
    s"""SELECT ${sqlSumMoney("l_extendedprice * l_discount", "revenue")}, COUNT(*) AS n_rows
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
       |  AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------
  def q03TopUnshipped(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders").filter(col("o_orderdate") < ts("1997-01-01"))
    val l = t(s, dir, "lineitem").filter(col("l_shipdate") > ts("1997-01-01"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(sumMoney(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  val q03Oracle: String =
    s"""SELECT l_orderkey,
       | ${sqlSumMoney("l_extendedprice * (1 - l_discount)", "revenue")},
       | CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       | JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1997-01-01' AND l_shipdate > TIMESTAMP '1997-01-01'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------
  def q04OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
    val lr = t(s, dir, "lineitem").filter(col("l_returnflag") === "R").select("l_orderkey")
    o.join(lr, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q04Oracle: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------
  def q05RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
    val l = t(s, dir, "lineitem")
    val su = t(s, dir, "supplier")
    // fact-to-fact (lineitem⋈orders) shuffles on the key; every
    // dimension hop is a broadcast hash join.
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sumMoney(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  val q05Oracle: String =
    s"""SELECT n_name,
       | ${sqlSumMoney("l_extendedprice * (1 - l_discount)", "revenue")}
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1996-07-01"))
    val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val n = t(s, dir, "nation")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sumMoney(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }

  val q10Oracle: String =
    s"""SELECT c_custkey, c_name, n_name,
       | ${sqlSumMoney("l_extendedprice * (1 - l_discount)", "revenue")}
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       | JOIN customer ON o_custkey = c_custkey
       | JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 300000).select("o_custkey")
    t(s, dir, "customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  val qAntiJoinOracle: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------
  def qScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    val th = p.agg((sum(cents(col("p_retailprice"))).cast("double") / lit(100.0) / count(lit(1))).as("avg_price"))
    p.crossJoin(broadcast(th))
      .filter(col("p_retailprice") > col("avg_price"))
      .select("p_partkey", "p_name", "p_retailprice")
      .orderBy("p_partkey")
  }

  val qScalarSubqueryOracle: String =
    """SELECT p_partkey, p_name, p_retailprice FROM part
      |WHERE p_retailprice > (SELECT CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) FROM part)
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------
  def qHaving(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"), sumMoney(col("c_acctbal")).as("total_acctbal"))
      .filter(col("n_cust") > 3)
      .orderBy("c_nationkey")

  val qHavingOracle: String =
    s"""SELECT c_nationkey, COUNT(*) AS n_cust, ${sqlSumMoney("c_acctbal", "total_acctbal")}
       |FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 3 ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val cn = t(s, dir, "customer").select(col("c_nationkey").as("nk")).distinct()
    val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nk")).distinct()
    val inter = cn.intersect(sn).withColumn("op", lit("intersect"))
    val exc = cn.except(sn).withColumn("op", lit("except"))
    inter.unionByName(exc).select("op", "nk").orderBy("op", "nk")
  }

  val qSetOpsOracle: String =
    """SELECT 'intersect' AS op, nk FROM
      | (SELECT DISTINCT c_nationkey AS nk FROM customer INTERSECT SELECT DISTINCT s_nationkey AS nk FROM supplier) t1
      |UNION ALL
      |SELECT 'except' AS op, nk FROM
      | (SELECT DISTINCT c_nationkey AS nk FROM customer EXCEPT SELECT DISTINCT s_nationkey AS nk FROM supplier) t2
      |ORDER BY op, nk""".stripMargin

  // ---------------------------------------------------------------
  def qCaseString(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        when(col("p_size") < 10, "small").when(col("p_size") < 30, "medium").otherwise("large").as("size_class"),
        upper(substring(col("p_type"), 1, 4)).as("type_prefix"),
        length(col("p_name")).as("name_len"))
      .groupBy("size_class", "type_prefix")
      .agg(count(lit(1)).as("n"), sum(col("name_len")).cast("long").as("total_name_len"))
      .orderBy("size_class", "type_prefix")

  val qCaseStringOracle: String =
    """SELECT CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium' ELSE 'large' END AS size_class,
      | UPPER(SUBSTRING(p_type, 1, 4)) AS type_prefix,
      | COUNT(*) AS n, CAST(SUM(LENGTH(p_name)) AS BIGINT) AS total_name_len
      |FROM part GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  /** The reference flagship: `SELECT ticker, DATE(ts), AVG(close) …
    * GROUP BY ticker, DATE(ts)` (RUNBOOK.md §9) on our events table. */
  def qDateTruncDaily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("event_type", "day")
      .agg(
        avgFixed(col("value")).as("avg_value"),
        sumMoney(col("value")).as("total_value"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type", "day")

  val qDateTruncDailyOracle: String =
    s"""SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       | ${sqlAvgFixed("value", "avg_value")},
       | ${sqlSumMoney("value", "total_value")},
       | COUNT(*) AS n_events
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice") // prune before the window sort
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  val qWindowRankOracle: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM
      | (SELECT o_custkey, o_orderkey, o_totalprice,
      |   ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------
  def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("running_total", sum(cents(col("o_totalprice"))).over(w).cast("double") / lit(100.0))
      .select(col("o_custkey"), col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"), col("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val qWindowRunningOracle: String =
    """SELECT o_custkey, o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
      | CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER
      |   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS running_total
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  def qWindowLag(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .withColumn("day", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .groupBy("day").agg(sumMoney(col("o_totalprice")).as("rev"))
    // unpartitioned window is safe here: input is pre-aggregated to
    // one row per day (bounded cardinality), not a raw fact stream
    val w = Window.orderBy("day")
    daily
      .withColumn("delta", col("rev") - lag(col("rev"), 1).over(w))
      .orderBy("day")
  }

  val qWindowLagOracle: String =
    s"""WITH daily AS (
       | SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day, ${sqlSumMoney("o_totalprice", "rev")}
       | FROM orders GROUP BY 1)
       |SELECT day, rev, rev - LAG(rev) OVER (ORDER BY day) AS delta
       |FROM daily ORDER BY day""".stripMargin

  // ---------------------------------------------------------------
  def qNtile(s: SparkSession, dir: String): DataFrame = {
    // Exact global NTILE with NO single-partition window. Plan:
    //  1. approximate split points on the order key — they only decide
    //     LOAD BALANCE, never the answer;
    //  2. exact per-range counts → cumulative offsets (≤ numBuckets
    //     rows, collected once at the driver);
    //  3. row_number windows partitioned BY RANGE (parallel) + the
    //     broadcast offset = exact global rank;
    //  4. NTILE bucket arithmetic from (rank, N) as expressions.
    // Rank never depends on where the approximate boundaries fell, so
    // the result is exact and deterministic. At 100 TB raise
    // numBuckets so each range sort fits an executor.
    val numBuckets = 32
    val o = t(s, dir, "orders").select("o_totalprice", "o_orderkey")
    val splits = o.stat.approxQuantile(
      "o_totalprice", (1 until numBuckets).map(_.toDouble / numBuckets).toArray, 0.001)
      .distinct.sorted
    val bucket = splits.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("o_totalprice") > b, 1).otherwise(0)
    }
    val bucketed = o.withColumn("bkt", bucket)
    val cnts = bucketed.groupBy("bkt").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1) // ≤ numBuckets rows
    val n = cnts.map(_._2).sum
    val offs = cnts.scanLeft((0, 0L)) { case ((_, acc), (b, c)) => (b, acc + c) }
      .init.zip(cnts).map { case ((_, off), (b, _)) => (b, off) }
    val offDf = s.createDataFrame(offs.toSeq).toDF("bkt", "off")
    val base = n / 4
    val big = n % 4
    val wRange = Window.partitionBy("bkt").orderBy("o_totalprice", "o_orderkey")
    val ranked = bucketed
      .withColumn("rn", row_number().over(wRange))
      .join(broadcast(offDf), Seq("bkt"))
      .withColumn("rank", col("off") + col("rn"))
    val quartile =
      if (base == 0) col("rank") // degenerate N<4: one row per bucket
      else when(col("rank") <= big * (base + 1),
          ceil(col("rank") / lit((base + 1).toDouble)))
        .otherwise(lit(big) + ceil((col("rank") - lit(big * (base + 1))) / lit(base.toDouble)))
    ranked
      .withColumn("quartile", quartile.cast("long"))
      .groupBy("quartile")
      .agg(count(lit(1)).as("n"), min("o_totalprice").as("min_price"), max("o_totalprice").as("max_price"))
      .orderBy("quartile")
  }

  val qNtileOracle: String =
    """SELECT quartile, COUNT(*) AS n, MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
      |FROM (SELECT o_totalprice, CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile FROM orders) t
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  def qRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sumMoney(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val qRollupOracle: String =
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${sqlSumMoney("l_quantity", "sum_qty")}
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------
  def qCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val qCubeOracle: String =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, ${sqlSumMoney("o_totalprice", "total")}
       |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  def qPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("day")
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, eventTypes)
      .orderBy("day")

  val qPivotOracle: String = {
    val cells = eventTypes
      .map(e => s"COUNT(CASE WHEN event_type = '$e' THEN 1 END) AS $e").mkString(",\n ")
    s"""SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       | $cells
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------
  /** Exact interpolated percentiles (QUANTILE_CONT semantics) with a
    * BOUNDED aggregation state. Spark's exact `percentile()` is a
    * TypedImperativeAggregate whose per-group buffer is a (value →
    * count) map held in executor memory — unbounded on a continuous
    * column at 100 TB. This formulation quantizes to fixed-point
    * (exact for ≤`log10(scale)`-decimal data), hash-aggregates
    * (key, value) counts — a spillable HashAggregate, never an
    * in-memory map — then picks ranks off the cumulative count and
    * interpolates exactly like `percentile` does: pos = p·(n−1),
    * x_lo + (x_hi − x_lo)·frac. The rank window runs over DISTINCT
    * values per group (count-sized), not rows.
    */
  private def exactPercentiles(
      df: DataFrame, key: String, valueCol: Column, scale: Int,
      ps: Seq[(Double, String)]): DataFrame = {
    val vc = df
      .groupBy(col(key), round(valueCol * scale).cast("long").as("_v"))
      .agg(count(lit(1)).as("_c"))
    val byV = Window.partitionBy(key).orderBy("_v")
    val whole = Window.partitionBy(key)
    val cum = vc
      .withColumn("_cum", sum("_c").over(byV))
      .withColumn("_n", sum("_c").over(whole))
    val aggs = ps.flatMap { case (p, name) =>
      val loRank = floor(lit(p) * (col("_n") - 1)) + 1 // 1-based rank of x[floor(pos)]
      Seq(
        min(when(col("_cum") >= loRank, col("_v"))).as(s"_lo_$name"),
        min(when(col("_cum") >= loRank + 1, col("_v"))).as(s"_hi_$name"))
    } :+ max(col("_n")).as("_n")
    val g = cum.groupBy(key).agg(aggs.head, aggs.tail: _*)
    ps.foldLeft(g) { case (d, (p, name)) =>
      val pos = lit(p) * (col("_n") - 1)
      val frac = pos - floor(pos)
      val lo = col(s"_lo_$name") / scale.toDouble
      val hi = coalesce(col(s"_hi_$name"), col(s"_lo_$name")) / scale.toDouble
      d.withColumn(name, round(lo + (hi - lo) * frac, 4))
    }.select(col(key) +: ps.map(p => col(p._2)): _*)
  }

  // Two independent chains joined on the 3-row key — the r20 stacked
  // single-chain rewrite (stack(2) into one agg→window→agg keyed
  // (flag, metric)) was plan-thinner (12→8 exchanges) but measured
  // SLOWER at every SF in every quiet sweep (r21 interleaved A/B,
  // reps 5: sf0.1 2.85 vs 2.54 s, sf5 5.44 vs 4.56 s) — the stack()
  // Expand doubles the rows entering the first hash agg and widens
  // its grouping key with a metric string, costing more than the
  // saved exchanges. Reverted per VERDICT r20 item 1; both shapes are
  // oracle-hash-equal, so this is purely the faster plan.
  def qPercentiles(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val qty = exactPercentiles(li, "l_returnflag", col("l_quantity"), 100,
      Seq(0.5 -> "qty_p50", 0.9 -> "qty_p90"))
    val price = exactPercentiles(li, "l_returnflag", col("l_extendedprice"), 100,
      Seq(0.5 -> "price_p50"))
    qty.join(price, "l_returnflag")
      .select("l_returnflag", "qty_p50", "qty_p90", "price_p50")
      .orderBy("l_returnflag")
  }

  val qPercentilesOracle: String =
    """SELECT l_returnflag,
      | ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS qty_p50,
      | ROUND(QUANTILE_CONT(l_quantity, 0.9), 4) AS qty_p90,
      | ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS price_p50
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------
  def qStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("qty_stddev"),
        round(var_samp(col("l_quantity")), 4).as("qty_var"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"))
      .orderBy("l_returnflag")

  val qStatsOracle: String =
    """SELECT l_returnflag,
      | ROUND(STDDEV_SAMP(l_quantity), 4) AS qty_stddev,
      | ROUND(VAR_SAMP(l_quantity), 4) AS qty_var,
      | ROUND(CORR(l_quantity, l_extendedprice), 6) AS qty_price_corr
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------
  def qLatestPerKey(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    t(s, dir, "events")
      .select("user_id", "event_id", "event_type", "value", "ts")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
  }

  val qLatestPerKeyOracle: String =
    """SELECT user_id, event_id, event_type, value FROM
      | (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  /** HLL sketch distinct — approximate in value yet deterministic in
    * computation, so fully oracled: [[graft.functions.HllOracleSql]]
    * replays Spark's whole HyperLogLog++ (xxhash64 registers, linear
    * counting, bias-table interpolation) in DuckDB arithmetic.
    */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("approx_users"), count(lit(1)).as("n"))
      .orderBy("event_type")

  // ---------------------------------------------------------------
  val queries: Seq[Q] = Seq(
    Q("q01_pricing_summary", q01PricingSummary, Some(q01Oracle)),
    Q("q06_revenue_filter", q06RevenueFilter, Some(q06Oracle)),
    Q("q03_top_unshipped", q03TopUnshipped, Some(q03Oracle)),
    Q("q04_order_priority", q04OrderPriority, Some(q04Oracle)),
    Q("q05_region_revenue", q05RegionRevenue, Some(q05Oracle)),
    Q("q10_returned_items", q10ReturnedItems, Some(q10Oracle)),
    Q("q_anti_join", qAntiJoin, Some(qAntiJoinOracle)),
    Q("q_scalar_subquery", qScalarSubquery, Some(qScalarSubqueryOracle)),
    Q("q_having", qHaving, Some(qHavingOracle)),
    Q("q_set_ops", qSetOps, Some(qSetOpsOracle)),
    Q("q_case_string", qCaseString, Some(qCaseStringOracle)),
    Q("q_date_trunc_daily", qDateTruncDaily, Some(qDateTruncDailyOracle)),
    Q("q_window_rank", qWindowRank, Some(qWindowRankOracle)),
    Q("q_window_running", qWindowRunning, Some(qWindowRunningOracle)),
    Q("q_window_lag", qWindowLag, Some(qWindowLagOracle)),
    Q("q_ntile", qNtile, Some(qNtileOracle)),
    Q("q_rollup", qRollup, Some(qRollupOracle)),
    Q("q_cube", qCube, Some(qCubeOracle)),
    Q("q_pivot", qPivot, Some(qPivotOracle)),
    Q("q_percentiles", qPercentiles, Some(qPercentilesOracle)),
    Q("q_stats", qStats, Some(qStatsOracle)),
    Q("q_latest_per_key", qLatestPerKey, Some(qLatestPerKeyOracle)),
    Q("q_approx_distinct", qApproxDistinct,
      Some(graft.functions.HllOracleSql.approxDistinctOracle)))
}
