package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables
import OracleSafe._

/** Final TPC-H batch — the remaining classic shapes (Q8/Q11/Q13/Q15/
  * Q20/Q21) adapted to the driver schema, completing the 22-query
  * sweep of the Trino analytic surface. Scale notes inline: dimension
  * chains broadcast, the single fact-fact join (lineitem⋈orders)
  * shuffles on the join key, every ratio is fixed-point.
  */
object Relational4 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def rev = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))

  // ---------------------------------------------------------------
  /** Q8 shape: market share — the fraction of ASIA's yearly revenue
    * carried by suppliers of one nation. lineitem⋈orders is the only
    * fact-fact shuffle; customer/nation/region/supplier broadcast.
    */
  def q08MarketShare(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val cAsia = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")
        .filter(col("r_name") === "ASIA")), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cAsia), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .withColumn("year", year(col("o_orderdate")).cast("long"))
      .groupBy("year")
      .agg(
        (sum(when(col("s_nationkey") === 0, rev).otherwise(0L)).cast("double") /
          sum(rev).cast("double")).as("mkt_share"),
        sumMoney(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_rev"))
      .orderBy("year")
  }

  val q08Oracle: String = {
    val r = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
    s"""SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS year,
       | CAST(SUM(CASE WHEN s_nationkey = 0 THEN $r ELSE 0 END) AS DOUBLE)
       |   / CAST(SUM($r) AS DOUBLE) AS mkt_share,
       | ${sqlSumMoney("l_extendedprice * (1 - l_discount)", "total_rev")}
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
       |JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------
  /** Q11 shape: important stock — parts whose shipped value exceeds
    * 1.5× the per-part average (a relative threshold stays meaningful
    * at every scale factor, unlike TPC-H's SF-tied constant). The
    * 1-row global aggregate broadcasts back (scalar HAVING); the
    * comparison is exact-integer on both sides.
    */
  def q11ImportantStock(s: SparkSession, dir: String): DataFrame = {
    val perPart = t(s, dir, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(cents(col("l_extendedprice"))).as("value_cents"))
    val total = perPart.agg(
      sum(col("value_cents")).as("total_cents"), count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value_cents") * col("n_parts") * lit(2) > col("total_cents") * lit(3))
      .select(col("l_partkey"),
        (col("value_cents").cast("double") / lit(100.0)).as("value"))
      .orderBy(desc("value"), col("l_partkey"))
  }

  val q11Oracle: String =
    """WITH per_part AS (
      |  SELECT l_partkey, SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS value_cents
      |  FROM lineitem GROUP BY 1)
      |SELECT l_partkey, CAST(value_cents AS DOUBLE) / 100.0 AS value
      |FROM per_part
      |WHERE value_cents * (SELECT COUNT(*) FROM per_part) * 2 > (SELECT SUM(value_cents) FROM per_part) * 3
      |ORDER BY value DESC, l_partkey""".stripMargin

  // ---------------------------------------------------------------
  /** Q13 shape: customer order-count distribution INCLUDING customers
    * with zero orders — left outer join, count of non-null keys, then
    * a count-of-counts. Two shuffles (custkey, then order count);
    * both aggregate partially.
    */
  def q13CustomerDistribution(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select("c_custkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_custkey")).as("c_count")) // count() skips nulls
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  val q13Oracle: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_custkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY 1) t
      |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------
  /** Q15 shape: top supplier — suppliers whose half-year revenue
    * equals the maximum (scalar MAX over an aggregated view,
    * broadcast back; exact cents so "equal to max" is unambiguous).
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val revenue = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(rev).as("total_cents"))
    val mx = revenue.agg(max(col("total_cents")).as("max_cents"))
    revenue.crossJoin(broadcast(mx))
      .filter(col("total_cents") === col("max_cents"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("total_cents").cast("double") / lit(100.0)).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q15Oracle: String =
    """WITH revenue AS (
      |  SELECT l_suppkey, SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS total_cents
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(total_cents AS DOUBLE) / 100.0 AS total_revenue
      |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_cents = (SELECT MAX(total_cents) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------
  /** Q20 shape: nested IN with aggregate — suppliers who moved more
    * than 100 units of any 'widget' part. Inner HAVING aggregates per
    * (supplier, part) first; the distinct supplier set then
    * semi-joins the dimension. No fact re-scan for the outer query.
    */
  def q20PartAvailability(s: SparkSession, dir: String): DataFrame = {
    val widgets = t(s, dir, "part")
      .filter(col("p_name").endsWith("widget")).select("p_partkey")
    val movers = t(s, dir, "lineitem")
      .join(broadcast(widgets), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(cents(col("l_quantity"))).as("qty_cents"))
      .filter(col("qty_cents") > 100L * 100)
      .select("l_suppkey").distinct()
    t(s, dir, "supplier")
      .join(movers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  val q20Oracle: String =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget')
      |  GROUP BY l_suppkey, l_partkey
      |  HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 10000)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------
  /** Q21 shape: EXISTS + NOT EXISTS chain — suppliers with a returned
    * ('R') line in a finished multi-supplier order where NO other
    * supplier had a return. Per-order supplier/return profiles
    * aggregate once; the exists/not-exists pair becomes two
    * broadcast-friendly flags instead of two correlated re-scans.
    */
  def q21WaitingSupplier(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val finished = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    val lf = l.join(finished, col("l_orderkey") === col("o_orderkey"))
    // per (order, supplier): did this supplier return anything?
    val perSupp = lf.groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_r"))
    // per-order supplier count + returning-supplier count as WINDOWS
    // over the same perSupp pass (r21, §2.4 — operations keyed the
    // same way share one pipeline): the previous shape aggregated
    // perSupp a second time into a perOrder frame and joined it back,
    // which re-ran the whole scan→join→groupBy subtree (perSupp had
    // two plan consumers) and paid two more exchanges for the
    // re-aggregation + join. Same rows out: the window computes
    // exactly the old perOrder values alongside each perSupp row.
    // Window groups are per-ORDER (≤ suppliers-per-order rows) — no
    // skew at any scale.
    val byOrder = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
    perSupp
      .withColumn("n_supp", count(lit(1)).over(byOrder))
      .withColumn("n_r_supp", sum(col("has_r")).over(byOrder))
      .filter(col("has_r") === 1 &&
        col("n_supp") > 1 && col("n_r_supp") === 1) // others exist, none returned
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("l_suppkey"))
  }

  val q21Oracle: String =
    """WITH lf AS (
      |  SELECT l_orderkey, l_suppkey, l_returnflag
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'),
      |per_supp AS (
      |  SELECT l_orderkey, l_suppkey,
      |   MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
      |  FROM lf GROUP BY 1, 2),
      |per_order AS (
      |  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(has_r) AS n_r_supp
      |  FROM per_supp GROUP BY 1)
      |SELECT l_suppkey, COUNT(*) AS numwait
      |FROM per_supp JOIN per_order USING (l_orderkey)
      |WHERE has_r = 1 AND n_supp > 1 AND n_r_supp = 1
      |GROUP BY 1 ORDER BY numwait DESC, l_suppkey""".stripMargin

  // ---------------------------------------------------------------
  val queries: Seq[Q] = Seq(
    Q("q08_market_share", q08MarketShare, Some(q08Oracle)),
    Q("q11_important_stock", q11ImportantStock, Some(q11Oracle)),
    Q("q13_customer_distribution", q13CustomerDistribution, Some(q13Oracle)),
    Q("q15_top_supplier", q15TopSupplier, Some(q15Oracle)),
    Q("q20_part_availability", q20PartAvailability, Some(q20Oracle)),
    Q("q21_waiting_supplier", q21WaitingSupplier, Some(q21Oracle)))
}
