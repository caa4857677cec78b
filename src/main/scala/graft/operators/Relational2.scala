package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables
import OracleSafe._

/** Second relational batch: TPC-H Q12/Q14/Q16/Q19/Q22 shapes adapted
  * to the driver schema, plus dialect-neutral SQL-text queries that
  * run the IDENTICAL string through `spark.sql` and the DuckDB oracle
  * (the `spark.sql` entry point is part of the Trino-replacement
  * surface).
  */
object Relational2 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** One ANSI SQL text, two engines: Spark executes it via spark.sql
    * over registered views; DuckDB runs it as the oracle verbatim.
    */
  private def sqlBoth(name: String, sql: String): Q =
    Q(name, (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) }, Some(sql))

  // ---------------------------------------------------------------
  /** Q12 shape: join + conditional aggregation by line status. */
  def q12PriorityShipping(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
          .cast("long").as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
          .cast("long").as("low_line_count"))
      .orderBy("l_linestatus")
  }

  val q12Oracle: String =
    """SELECT l_linestatus,
      | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      | CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // ---------------------------------------------------------------
  /** Q14 shape: conditional-revenue ratio (promo share). */
  def q14PromoRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
    val p = t(s, dir, "part")
    val rev = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(((lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(0L)).cast("double"))
        / sum(rev).cast("double")).as("promo_pct"))
  }

  val q14Oracle: String = {
    val rev = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
    s"""SELECT (100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $rev ELSE 0 END) AS DOUBLE))
       |  / CAST(SUM($rev) AS DOUBLE) AS promo_pct
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'""".stripMargin
  }

  // ---------------------------------------------------------------
  /** Q16 shape: suppliers-per-part with a NOT IN exclusion. */
  def q16SupplierParts(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
    val p = t(s, dir, "part").filter(col("p_type") =!= "PROMO")
    val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0).select("s_suppkey")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"))
      .limit(20)
  }

  val q16Oracle: String =
    """SELECT p_brand, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_type <> 'PROMO'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand ORDER BY supplier_cnt DESC, p_brand LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  /** Q19 shape: disjunction of conjunctive brand/size/quantity bands. */
  def q19Disjunctive(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    val pred =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) && col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(11, 25) && col("l_quantity").between(10, 25)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(26, 50) && col("l_quantity").between(20, 35))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(pred)
      .agg(sumMoney(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q19Oracle: String =
    s"""SELECT ${sqlSumMoney("l_extendedprice * (1 - l_discount)", "revenue")}, COUNT(*) AS n_rows
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
       |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25 AND l_quantity BETWEEN 10 AND 25)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50 AND l_quantity BETWEEN 20 AND 35)""".stripMargin

  // ---------------------------------------------------------------
  /** Q22 shape: substring bucketing + scalar avg subquery + NOT EXISTS. */
  def q22IdleCustomers(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val ccs = Seq("00", "11", "22", "33", "44", "55", "66", "77", "88", "99")
    val avgPos = c.filter(col("c_acctbal") > 0)
      .agg((sum(cents(col("c_acctbal"))).cast("double") / lit(100.0) / count(lit(1))).as("avg_bal"))
    val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 480000).select("o_custkey")
    c.withColumn("cc", substring(col("c_name"), -2, 2))
      .filter(col("cc").isInCollection(ccs))
      .crossJoin(broadcast(avgPos))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("cc")
      .agg(count(lit(1)).as("num_cust"), sumMoney(col("c_acctbal")).as("total_bal"))
      .orderBy("cc")
  }

  val q22Oracle: String =
    s"""SELECT RIGHT(c_name, 2) AS cc, COUNT(*) AS num_cust, ${sqlSumMoney("c_acctbal", "total_bal")}
       |FROM customer
       |WHERE RIGHT(c_name, 2) IN ('00', '11', '22', '33', '44', '55', '66', '77', '88', '99')
       |  AND c_acctbal > (SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*)
       |                   FROM customer WHERE c_acctbal > 0)
       |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 480000)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // Dialect-neutral SQL texts: one string, both engines.

  val qGroupingSets: Q = sqlBoth("q_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
      | CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      | CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
      | COUNT(*) AS n,
      | CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)

  val qInSubquery: Q = sqlBoth("q_in_subquery",
    """SELECT p_brand, COUNT(*) AS n
      |FROM part
      |WHERE p_size IN (SELECT p_size FROM part WHERE p_type = 'PROMO')
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin)

  val qRegexpExtract: Q = sqlBoth("q_regexp_extract",
    """SELECT COUNT(*) AS n,
      | CAST(SUM(CASE WHEN CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) = c_custkey
      |               THEN 1 ELSE 0 END) AS BIGINT) AS name_id_matches
      |FROM customer""".stripMargin)

  /** RANGE window frame: 7-day sliding revenue per day (value-based
    * frame, not row-based — days with no orders still bound the frame
    * correctly).
    */
  def qWindowRange(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .withColumn("day_num", datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date")).cast("long"))
      .groupBy("day_num")
      .agg(sum(cents(col("o_totalprice"))).as("rev_cents"))
    val w = Window.orderBy("day_num").rangeBetween(-6, 0)
    daily
      .withColumn("rev_7d", (sum(col("rev_cents")).over(w).cast("double") / lit(100.0)))
      .select(col("day_num"), (col("rev_cents").cast("double") / lit(100.0)).as("rev"), col("rev_7d"))
      .orderBy("day_num")
  }

  val qWindowRangeOracle: String =
    """WITH daily AS (
      | SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_num,
      |  SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
      | FROM orders GROUP BY 1)
      |SELECT day_num, CAST(rev_cents AS DOUBLE) / 100.0 AS rev,
      | CAST(SUM(rev_cents) OVER (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS rev_7d
      |FROM daily ORDER BY day_num""".stripMargin

  val qDateQuarter: Q = sqlBoth("q_date_quarter",
    """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS y, CAST(QUARTER(o_orderdate) AS BIGINT) AS q,
      | COUNT(*) AS n,
      | CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  val qValuesJoin: Q = sqlBoth("q_values_join",
    """SELECT t.s AS seg, COUNT(*) AS n,
      | CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_bal
      |FROM (VALUES ('BUILDING'), ('MACHINERY'), ('HOUSEHOLD')) AS t(s)
      |JOIN customer ON c_mktsegment = t.s
      |GROUP BY 1 ORDER BY 1""".stripMargin)

  val qIntersectAll: Q = sqlBoth("q_intersect_all",
    """SELECT c_nationkey AS nk FROM customer
      |INTERSECT ALL
      |SELECT c_nationkey FROM customer WHERE c_acctbal > 0
      |ORDER BY nk""".stripMargin)

  val qFirstLast: Q = sqlBoth("q_first_last",
    """SELECT o_custkey, o_orderkey,
      | FIRST_VALUE(o_orderkey) OVER w AS first_ok,
      | LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin)

  val qLateral: Q = sqlBoth("q_lateral",
    """SELECT c_custkey, t.o_orderkey AS top_orderkey, t.o_totalprice AS top_price
      |FROM customer, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
      |ORDER BY c_custkey""".stripMargin)

  val qExistsAgg: Q = sqlBoth("q_exists_agg",
    """SELECT c_mktsegment, COUNT(*) AS n FROM customer
      |WHERE EXISTS (SELECT o_custkey FROM orders WHERE o_custkey = c_custkey
      |              GROUP BY o_custkey HAVING COUNT(*) >= 12)
      |GROUP BY 1 ORDER BY 1""".stripMargin)

  val qSplitPart: Q = sqlBoth("q_split_part",
    """SELECT split_part(c_name, '#', 1) AS prefix, COUNT(*) AS n
      |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)

  val qNullifCoalesce: Q = sqlBoth("q_nullif_coalesce",
    """SELECT p_brand, COUNT(*) AS n,
      | CAST(SUM(COALESCE(NULLIF(p_size, 1), 0)) AS BIGINT) AS sum_nontrivial_size
      |FROM part GROUP BY 1 ORDER BY 1""".stripMargin)

  /** Ordered-event funnel: consecutive view→click→purchase triples
    * per user completing within seven days — the sessionized conversion
    * count every product-analytics stack ships (MATCH_RECOGNIZE-lite
    * via LEAD). One shuffle on user_id; dialect-neutral text.
    */
  val qFunnel: Q = sqlBoth("q_funnel",
    """SELECT user_id, COUNT(*) AS n_conversions
      |FROM (
      |  SELECT user_id, ts, event_type,
      |   LEAD(event_type, 1) OVER w AS e2,
      |   LEAD(event_type, 2) OVER w AS e3,
      |   LEAD(ts, 2) OVER w AS t3
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) x
      |WHERE event_type = 'view' AND e2 = 'click' AND e3 = 'purchase'
      |  AND t3 <= ts + INTERVAL '7' DAY
      |GROUP BY 1 ORDER BY 1""".stripMargin)

  val qPercentRank: Q = sqlBoth("q_percent_rank",
    """SELECT user_id, event_type,
      | PERCENT_RANK() OVER w AS pr,
      | CUME_DIST() OVER w AS cd,
      | NTH_VALUE(user_id, 2) OVER (PARTITION BY event_type ORDER BY n DESC, user_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_heaviest
      |FROM (SELECT user_id, event_type, COUNT(*) AS n
      |      FROM events GROUP BY 1, 2) t
      |WINDOW w AS (PARTITION BY event_type ORDER BY n DESC, user_id)
      |ORDER BY event_type, pr, user_id""".stripMargin)

  // ---------------------------------------------------------------
  val queries: Seq[Q] = Seq(
    qValuesJoin, qIntersectAll, qFirstLast, qLateral,
    qExistsAgg, qSplitPart, qNullifCoalesce, qFunnel, qPercentRank,
    Q("q12_priority_shipping", q12PriorityShipping, Some(q12Oracle)),
    Q("q14_promo_revenue", q14PromoRevenue, Some(q14Oracle)),
    Q("q16_supplier_parts", q16SupplierParts, Some(q16Oracle)),
    Q("q19_disjunctive", q19Disjunctive, Some(q19Oracle)),
    Q("q22_idle_customers", q22IdleCustomers, Some(q22Oracle)),
    Q("q_window_range", qWindowRange, Some(qWindowRangeOracle)),
    qGroupingSets, qInSubquery, qRegexpExtract, qDateQuarter)
}
