package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables
import OracleSafe._

/** Third relational batch: TPC-H Q2/Q7/Q9/Q17/Q18 shapes adapted to
  * the driver schema (no partsupp/commitdate columns — the unit-cost
  * and nation-pair semantics are reconstructed from lineitem).
  */
object Relational3 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---------------------------------------------------------------
  /** Q2 shape: per-part minimum-cost supplier (correlated min →
    * keyed window top-1). Unit cost derives from lineitem.
    */
  def q02MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        (round(col("l_extendedprice") / col("l_quantity") * 100)).cast("long").as("unit_cents"))
    val w = Window.partitionBy("l_partkey").orderBy(col("unit_cents"), col("l_suppkey"))
    l.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("p_partkey"), col("s_name"),
        (col("unit_cents").cast("double") / lit(100.0)).as("min_unit_price"))
      .orderBy("p_partkey")
  }

  val q02Oracle: String =
    """SELECT l_partkey AS p_partkey, s_name,
      | CAST(unit_cents AS DOUBLE) / 100.0 AS min_unit_price
      |FROM (
      | SELECT l_partkey, l_suppkey,
      |  CAST(ROUND(l_extendedprice / l_quantity * 100) AS BIGINT) AS unit_cents,
      |  ROW_NUMBER() OVER (PARTITION BY l_partkey
      |    ORDER BY CAST(ROUND(l_extendedprice / l_quantity * 100) AS BIGINT), l_suppkey) AS rn
      | FROM lineitem) t
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rn = 1 ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------
  /** Q7 shape: bilateral volume between two nations by year. */
  def q07VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val su = t(s, dir, "supplier")
    val n1 = t(s, dir, "nation").select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation").select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(
        (col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19") ||
          (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
      .withColumn("l_year", year(col("l_shipdate")).cast("long"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sumMoney(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q07Oracle: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       | CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
       | ${sqlSumMoney("l_extendedprice * (1 - l_discount)", "revenue")}
       |FROM lineitem
       | JOIN orders ON l_orderkey = o_orderkey
       | JOIN supplier ON l_suppkey = s_suppkey
       | JOIN customer ON o_custkey = c_custkey
       | JOIN nation n1 ON s_nationkey = n1.n_nationkey
       | JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
       |   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------
  /** Q9 shape: product profit (revenue minus derived cost) by
    * supplier nation and year.
    */
  def q09ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val amount = col("l_extendedprice") * (lit(1) - col("l_discount")) -
      col("p_retailprice") * col("l_quantity") * lit(0.1)
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .withColumn("o_year", year(col("l_shipdate")).cast("long"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(sumMoney(amount).as("profit"))
      .orderBy("nation", "o_year")
  }

  val q09Oracle: String = {
    val amount = "l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1"
    s"""SELECT n_name AS nation, CAST(YEAR(l_shipdate) AS BIGINT) AS o_year,
       | ${sqlSumMoney(amount, "profit")}
       |FROM lineitem
       | JOIN part ON l_partkey = p_partkey
       | JOIN supplier ON l_suppkey = s_suppkey
       | JOIN nation ON s_nationkey = n_nationkey
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // ---------------------------------------------------------------
  /** Q17 shape: revenue of small-quantity lines vs a correlated
    * per-part average (exact fixed-point per-part avg, joined back).
    */
  def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val perPart = l.groupBy(col("l_partkey").as("pk"))
      .agg((sum(cents(col("l_quantity"))).cast("double") / lit(100.0) / count(lit(1))).as("avg_qty"))
    l.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .agg(sumMoney(col("l_extendedprice")).as("small_qty_revenue"), count(lit(1)).as("n_lines"))
  }

  val q17Oracle: String =
    s"""WITH per_part AS (
       | SELECT l_partkey AS pk,
       |  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_qty
       | FROM lineitem GROUP BY 1)
       |SELECT ${sqlSumMoney("l_extendedprice", "small_qty_revenue")}, COUNT(*) AS n_lines
       |FROM lineitem JOIN per_part ON l_partkey = pk
       |WHERE l_quantity < avg_qty * 0.5""".stripMargin

  // ---------------------------------------------------------------
  /** Q18 shape: large-volume orders (HAVING over a join, then join
    * back to customers, top-k).
    */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val big = l.groupBy("l_orderkey")
      .agg(sumMoney(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 150)
    big.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("total_qty"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
      .orderBy(desc("total_qty"), col("o_orderkey"))
      .limit(50)
  }

  val q18Oracle: String =
    s"""SELECT c_custkey, c_name, o_orderkey, total_qty,
       | CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate
       |FROM (SELECT l_orderkey, ${sqlSumMoney("l_quantity", "total_qty")}
       |      FROM lineitem GROUP BY 1 HAVING CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 > 150) t
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY total_qty DESC, o_orderkey LIMIT 50""".stripMargin

  // ---------------------------------------------------------------
  val queries: Seq[Q] = Seq(
    Q("q02_min_cost_supplier", q02MinCostSupplier, Some(q02Oracle)),
    Q("q07_volume_shipping", q07VolumeShipping, Some(q07Oracle)),
    Q("q09_product_profit", q09ProductProfit, Some(q09Oracle)),
    Q("q17_small_quantity", q17SmallQuantity, Some(q17Oracle)),
    Q("q18_large_orders", q18LargeOrders, Some(q18Oracle)))
}
