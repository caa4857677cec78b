package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.plans.AsOf
import graft.sources.Tables
import OracleSafe._

/** Extended relational surface: the as-of custom operator, JSON
  * extraction (the reference's `props`-style semi-structured columns),
  * collect-style aggregation, bucketed co-located joins, and salted
  * skew joins.
  */
object Advanced {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  // ---------------------------------------------------------------
  /** Attribute each purchase to the user's most recent prior view —
    * the custom AsOfJoinExec operator (sort-merge, single pass).
    */
  def qAsOfJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_event_id"), col("user_id").as("v_user_id"),
        col("ts").as("v_ts"))
    AsOf.join(purchases, views, "user_id", "v_user_id", "ts", "v_ts")
      .select(col("event_id"), col("user_id"), col("value"),
        col("v_event_id"), col("v_event_id").isNotNull.as("matched"))
      .orderBy("event_id")
  }

  val qAsOfJoinOracle: String =
    """SELECT p.event_id AS event_id, p.user_id AS user_id, p.value AS value,
      | v.event_id AS v_event_id, v.event_id IS NOT NULL AS matched
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      | ON p.user_id = v.user_id AND v.ts <= p.ts
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------
  /** Tolerance-bounded as-of: the predecessor view only counts when
    * it happened within the last hour — the attribution-window rule
    * every real as-of deployment carries. Exercises the custom exec's
    * tolerance arithmetic under the oracle gate (previously spec-only);
    * DuckDB has no ASOF tolerance, so the oracle states the rule as a
    * correlated LATERAL top-1.
    */
  def qAsOfTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_event_id"), col("user_id").as("v_user_id"),
        col("ts").as("v_ts"))
    AsOf.join(purchases, views, "user_id", "v_user_id", "ts", "v_ts",
        toleranceMicros = Some(3600L * 1000000L))
      .select(col("event_id"), col("user_id"), col("value"),
        col("v_event_id"), col("v_event_id").isNotNull.as("matched"))
      .orderBy("event_id")
  }

  val qAsOfToleranceOracle: String =
    """SELECT p.event_id AS event_id, p.user_id AS user_id, p.value AS value,
      | v.event_id AS v_event_id, v.event_id IS NOT NULL AS matched
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN LATERAL (
      | SELECT event_id FROM events v
      | WHERE v.event_type = 'view' AND v.user_id = p.user_id
      |  AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
      | ORDER BY v.ts DESC LIMIT 1) v ON TRUE
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------
  /** Forward as-of: attribute each purchase to the NEXT view at or
    * after it (follow-up behavior analysis).
    */
  def qAsOfForward(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_event_id"), col("user_id").as("v_user_id"),
        col("ts").as("v_ts"))
    AsOf.join(purchases, views, "user_id", "v_user_id", "ts", "v_ts", forward = true)
      .select(col("event_id"), col("user_id"), col("value"),
        col("v_event_id"), col("v_event_id").isNotNull.as("matched"))
      .orderBy("event_id")
  }

  val qAsOfForwardOracle: String =
    """SELECT p.event_id AS event_id, p.user_id AS user_id, p.value AS value,
      | v.event_id AS v_event_id, v.event_id IS NOT NULL AS matched
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      | ON p.user_id = v.user_id AND v.ts >= p.ts
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------
  /** Nearest as-of: each purchase picks whichever view — predecessor
    * or successor — is closer in time (ties go to the predecessor).
    * Oracle: two chained native ASOF joins + a CASE pick.
    */
  def qAsOfNearest(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_event_id"), col("user_id").as("v_user_id"),
        col("ts").as("v_ts"))
    AsOf.join(purchases, views, "user_id", "v_user_id", "ts", "v_ts", nearest = true)
      .select(col("event_id"), col("user_id"), col("v_event_id"),
        col("v_event_id").isNotNull.as("matched"))
      .orderBy("event_id")
  }

  val qAsOfNearestOracle: String =
    """SELECT p.event_id AS event_id, p.user_id AS user_id,
      | CASE WHEN vb.event_id IS NULL THEN vf.event_id
      |      WHEN vf.event_id IS NULL THEN vb.event_id
      |      WHEN (p.ts - vb.ts) <= (vf.ts - p.ts) THEN vb.event_id
      |      ELSE vf.event_id END AS v_event_id,
      | (vb.event_id IS NOT NULL OR vf.event_id IS NOT NULL) AS matched
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') vb
      |  ON p.user_id = vb.user_id AND vb.ts <= p.ts
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') vf
      |  ON p.user_id = vf.user_id AND vf.ts > p.ts
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------
  /** Semi-structured props column: JSON field extraction + agg. */
  def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"))
      .orderBy("event_type")

  val qJsonExtractOracle: String =
    """SELECT event_type, COUNT(*) AS n,
      | CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      | CAST(CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS DOUBLE)
      |   / COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS avg_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  /** collect_set + deterministic ordering, emitted as a string. */
  def qCollectAgg(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("g", col("user_id") % 10)
      .groupBy("g")
      .agg(
        array_join(array_sort(collect_set(col("event_type"))), ",").as("types"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("g")

  val qCollectAggOracle: String =
    """SELECT user_id % 10 AS g,
      | string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
      | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  /** Bucketed co-located join: both fact tables bucketed+sorted on the
    * join key via the catalog, so the join needs no exchange (bucket
    * pruning + co-location — Spark's answer to the reference's
    * Iceberg `partitioning` table property, RUNBOOK.md §7).
    */
  // bucketed-table DDL runs ONCE per (session, dir): the query (and
  // its bench entry) times the zero-exchange join, not table setup
  private val bucketedReady = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Bucket count: at least the executor-core count, so the
    * exchange-free bucketed join still uses every core (8 buckets on
    * 32 cores left 3/4 idle — the r11 sf5 sweep's 9 s); at cluster
    * scale buckets ≥ total cores is the same sizing rule.
    */
  private val BucketCount = 32

  /** Leaf-file identity of the join inputs — the staleness guard for
    * the persisted bucketed tables (prefixed with the bucket count so
    * a layout change rebuilds).
    */
  private def bucketedFp(dir: String): String = {
    import java.nio.file.{Files, Paths}
    val leaves = Seq("orders", "lineitem").flatMap { n =>
      val src = Paths.get(s"$dir/$n.parquet")
      if (Files.isDirectory(src)) {
        val st = Files.list(src)
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala.filter(_.toString.endsWith(".parquet"))
            .toSeq.sortBy(_.toString)
        } finally st.close()
      } else Seq(src)
    }
    s"b$BucketCount|" + leaves.map(p =>
      s"${p.getFileName}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}")
      .mkString("|")
  }

  /** Build (or REUSE, fingerprint-guarded like the ANN indexes) the
    * two catalog-bucketed tables. The data files outlive the
    * in-memory catalog, so a fresh session whose inputs still match
    * the persisted fingerprint re-REGISTERS the bucket layout over
    * the existing files (CREATE TABLE … CLUSTERED BY … LOCATION —
    * metadata-only) instead of rewriting both tables; only an input
    * change pays the one-time clustered write. This is the offline
    * bucketing lifecycle at 100 TB: one layout job, every subsequent
    * join exchange-free.
    */
  private def ensureBucketedTables(s: SparkSession, dir: String): (String, String) =
    bucketedReady.synchronized {
      val suffix = math.abs(dir.hashCode).toString
      val oTbl = s"graft_b_orders_$suffix"
      val lTbl = s"graft_b_lineitem_$suffix"
      val key = s"${System.identityHashCode(s)}:$dir"
      if (bucketedReady.contains(key) &&
          s.catalog.tableExists(oTbl) && s.catalog.tableExists(lTbl))
        return (oTbl, lTbl)
      val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val fp = bucketedFp(dir)
      def markerPath(tbl: String) = java.nio.file.Paths.get(s"$wh/$tbl/_graft_fp")
      def markerOk(tbl: String): Boolean =
        java.nio.file.Files.exists(markerPath(tbl)) &&
          new String(java.nio.file.Files.readAllBytes(markerPath(tbl)), "UTF-8") == fp
      def registerOver(tbl: String, keyCol: String, schemaDdl: String): Unit =
        s.sql(s"""CREATE TABLE $tbl ($schemaDdl) USING parquet
                 |CLUSTERED BY ($keyCol) SORTED BY ($keyCol) INTO $BucketCount BUCKETS
                 |LOCATION '$wh/$tbl'""".stripMargin)
      if (markerOk(oTbl) && markerOk(lTbl) &&
          !s.catalog.tableExists(oTbl) && !s.catalog.tableExists(lTbl)) {
        registerOver(oTbl, "o_orderkey", Tables.load(s, dir, "orders").schema.toDDL)
        registerOver(lTbl, "l_orderkey", Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_extendedprice", "l_discount").schema.toDDL)
        bucketedReady.add(key)
        return (oTbl, lTbl)
      }
      // stale or absent: drop both the catalog entry and any orphaned
      // location from a previous session, rebuild, stamp the marker
      Seq(oTbl, lTbl).foreach { tbl =>
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        graft.lake.SnapshotTable.drop(s, s"$wh/$tbl")
      }
      Tables.load(s, dir, "orders")
        .write.bucketBy(BucketCount, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(oTbl)
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .write.bucketBy(BucketCount, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(lTbl)
      Seq(oTbl, lTbl).foreach { tbl =>
        java.nio.file.Files.write(markerPath(tbl), fp.getBytes("UTF-8"))
      }
      bucketedReady.add(key)
      (oTbl, lTbl)
    }

  def qBucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val (oTbl, lTbl) = ensureBucketedTables(s, dir)
    s.table(lTbl)
      .join(s.table(oTbl), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sumMoney(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("o_orderstatus")
  }

  val qBucketedJoinOracle: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n,
       | ${sqlSumMoney("l_extendedprice * (1 - l_discount)", "revenue")}
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  /** Salted join: the fact side's 5-value join key is maximally
    * skewed; salting fans the dimension out ×8 so all 32 cores share
    * each hot key. Salt derives from a hash of a unique column — no
    * RNG, so retries/replays are stable. Result is salt-invariant and
    * oracle-checked against the unsalted join.
    */
  def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val nSalts = 8
    val ev = events(s, dir)
    val dim = ev.select(col("event_type")).distinct()
      .withColumn("weight", length(col("event_type")))
    val saltedDim = dim.withColumn("salt",
      explode(expr(s"sequence(0, ${nSalts - 1})")))
    val saltedFacts = ev.withColumn("salt",
      pmod(xxhash64(col("event_id")), lit(nSalts)).cast("int"))
    saltedFacts.join(saltedDim, Seq("event_type", "salt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sumMoney(col("value") * col("weight")).as("weighted_value"))
      .orderBy("event_type")
  }

  val qSaltedJoinOracle: String =
    s"""SELECT e.event_type AS event_type, COUNT(*) AS n,
       | ${sqlSumMoney("e.value * d.weight", "weighted_value")}
       |FROM events e
       |JOIN (SELECT DISTINCT event_type, LENGTH(event_type) AS weight FROM events) d
       |  ON e.event_type = d.event_type
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  val queries: Seq[Q] = Seq(
    Q("q_asof_join", qAsOfJoin, Some(qAsOfJoinOracle)),
    Q("q_asof_forward", qAsOfForward, Some(qAsOfForwardOracle)),
    Q("q_asof_nearest", qAsOfNearest, Some(qAsOfNearestOracle)),
    Q("q_asof_tolerance", qAsOfTolerance, Some(qAsOfToleranceOracle)),
    Q("q_json_extract", qJsonExtract, Some(qJsonExtractOracle)),
    Q("q_collect_agg", qCollectAgg, Some(qCollectAggOracle)),
    Q("q_bucketed_join", qBucketedJoin, Some(qBucketedJoinOracle)),
    Q("q_salted_join", qSaltedJoin, Some(qSaltedJoinOracle)))
}
