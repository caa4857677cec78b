package graft.functions

import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper

import OracleHashSql.{M, mul64, xorShift}

/** DuckDB SQL mirroring Spark's `approx_count_distinct` — the full
  * HyperLogLog++ pipeline, bit-for-bit, so the one remaining
  * sketch-based registry entry can be hash-gated instead of
  * rows-only checked. Every stage replays the engine exactly
  * (algorithm reconstructed from HyperLogLogPlusPlusHelper, tables
  * read off the live Spark classpath — nothing hardcoded to drift):
  *
  *  1. xxhash64(user_id, seed 42) — the 8-byte XXH64 path
  *     (mul/rotl/xor-shift avalanche) in HUGEINT modular arithmetic;
  *  2. register index = top p hash bits; rho = leading-zero count of
  *     `(hash << p) | 2^(p-1)` plus one, maxed per register
  *     (leading zeros via 64 − LENGTH(bin(w)) — DuckDB's bin() is
  *     minimal-length);
  *  3. the estimator's THREE branches: linear counting
  *     `m·ln(m/V)` under the per-p threshold, the raw estimate
  *     `alphaM2/zInverse`, and the bias-corrected middle range with
  *     Spark's K-nearest-window interpolation over the published
  *     RAW_ESTIMATE/BIAS tables (binary-search insertion point, then
  *     the squared-distance window slide), finished by
  *     `floor(x+0.5)` — Math.round.
  *
  * Float-exactness notes: register contributions 2^-rho are dyadic
  * (power-of-two doubles), so zInverse sums exactly in any order at
  * realistic rho; the 6-entry bias window averages via ordered
  * list_sum; LN and double division are IEEE-identical across the
  * engines (established by the BM25/TF-IDF gates).
  */
private[graft] object HllOracleSql {

  /** x ROTL n on a [0,2^64) HUGEINT residue: the shifted-out high
    * bits land in disjoint low positions, so OR is addition.
    */
  private def rotl(x: String, n: Int): String =
    s"((($x) * ${java.math.BigInteger.ONE.shiftLeft(n)}) % $M" +
      s" + ($x) // ${java.math.BigInteger.ONE.shiftLeft(64 - n)})"

  private def xorc(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"

  // XXH64 primes (decimal, as unsigned residues)
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  /** seed(42) + PRIME64_5 + 8 — the 8-byte-input accumulator init. */
  private val H0 = "2870177450012600311"

  /** Spark's p for a relativeSD (HyperLogLogPlusPlusHelper ctor). */
  private def pFor(rsd: Double): Int =
    math.ceil(2.0d * math.log(1.106d / rsd) / math.log(2.0d)).toInt

  /** The estimator's alpha·m² (ctor formula, exact double repr). */
  private def alphaM2(p: Int, m: Int): Double = p match {
    case 4 => 0.673 * m * m
    case 5 => 0.697 * m * m
    case 6 => 0.709 * m * m
    case _ => (0.7213 / (1.0 + 1.079 / m)) * m * m
  }

  /** SQL computing `(event_type, approx_users, n)` over `events` —
    * the [[graft.operators.Relational.qApproxDistinct]] mirror at the
    * default relativeSD 0.05.
    */
  def approxDistinctOracle: String = {
    val rsd = 0.05
    val p = pFor(rsd)
    val m = 1 << p
    val raw = HyperLogLogPlusPlusHelper.RAW_ESTIMATE_DATA(p - 4)
    val bias = HyperLogLogPlusPlusHelper.BIAS_DATA(p - 4)
    val thresh = HyperLogLogPlusPlusHelper.THRESHOLDS(p - 4)
    val k = HyperLogLogPlusPlusHelper.K
    val n = raw.length
    val a2 = alphaM2(p, m)
    s"""WITH rawt AS (
       |  SELECT CAST(UNNEST(range(0, $n)) AS INT) AS i,
       |    (CAST([${raw.mkString(",")}] AS DOUBLE[]))[UNNEST(range(0, $n)) + 1] AS v),
       |biast AS (
       |  SELECT CAST([${bias.mkString(",")}] AS DOUBLE[]) AS bl),
       |u AS (SELECT DISTINCT event_type, user_id FROM events),
       |h0 AS (SELECT event_type,
       |  CASE WHEN user_id >= 0 THEN CAST(user_id AS HUGEINT)
       |       ELSE CAST(user_id AS HUGEINT) + $M END AS v FROM u),
       |h1 AS (SELECT event_type, ${mul64("v", P2)} AS z FROM h0),
       |h2 AS (SELECT event_type, ${rotl("z", 31)} AS z FROM h1),
       |h3 AS (SELECT event_type, ${mul64("z", P1)} AS z FROM h2),
       |h4 AS (SELECT event_type, ${xorc(H0, "z")} AS z FROM h3),
       |h5 AS (SELECT event_type, ${rotl("z", 27)} AS z FROM h4),
       |h6 AS (SELECT event_type, (${mul64("z", P1)} + $P4) % $M AS z FROM h5),
       |h7 AS (SELECT event_type, ${xorShift("z", 33)} AS z FROM h6),
       |h8 AS (SELECT event_type, ${mul64("z", P2)} AS z FROM h7),
       |h9 AS (SELECT event_type, ${xorShift("z", 29)} AS z FROM h8),
       |hA AS (SELECT event_type, ${mul64("z", P3)} AS z FROM h9),
       |hB AS (SELECT event_type, ${xorShift("z", 32)} AS x FROM hA),
       |reg AS (
       |  SELECT event_type, x // ${java.math.BigInteger.ONE.shiftLeft(64 - p)} AS idx,
       |    MAX(64 - LENGTH(bin(CAST((x * $m) % $M + ${1L << (p - 1)} AS UBIGINT))) + 1) AS rho
       |  FROM hB GROUP BY 1, 2),
       |agg AS (
       |  SELECT event_type,
       |    SUM(1.0 / POWER(2.0, rho)) + ($m - COUNT(*)) AS zinv,
       |    $m - COUNT(*) AS nz
       |  FROM reg GROUP BY 1),
       |est0 AS (
       |  SELECT event_type, $a2 / zinv AS e, nz FROM agg),
       |bidx AS (
       |  SELECT s.event_type, s.e, s.nz,
       |    (SELECT COUNT(*) FROM rawt r WHERE r.v < s.e) AS ins
       |  FROM est0 s),
       |bwin AS (
       |  SELECT event_type, e, nz,
       |    GREATEST(ins - ${k - 1}, 0) AS low0,
       |    LEAST(GREATEST(ins - ${k - 1}, 0) + $k, $n) - GREATEST(ins - ${k - 1}, 0) AS wsz
       |  FROM bidx),
       |bslide AS (
       |  SELECT b.event_type, b.e, b.nz, b.wsz,
       |    (SELECT MIN(l.i) FROM rawt l
       |     WHERE l.i >= b.low0
       |       AND (l.i + b.wsz >= $n
       |            OR (SELECT (b.e - r2.v)*(b.e - r2.v) FROM rawt r2 WHERE r2.i = l.i + b.wsz)
       |               >= (SELECT (b.e - r3.v)*(b.e - r3.v) FROM rawt r3 WHERE r3.i = l.i))) AS lo
       |  FROM bwin b),
       |bcorr AS (
       |  SELECT event_type, e, nz,
       |    CASE WHEN e < ${5.0 * m}
       |      THEN e - list_sum((SELECT bl FROM biast)[lo + 1 : lo + wsz]) / wsz
       |      ELSE e END AS ebc
       |  FROM bslide),
       |final AS (
       |  SELECT event_type,
       |    CASE WHEN nz > 0 THEN
       |      CASE WHEN $m.0 * LN($m.0 / nz) <= $thresh OR e <= ${2.5 * m}
       |        THEN $m.0 * LN($m.0 / nz)
       |        ELSE ebc END
       |    ELSE ebc END AS est
       |  FROM bcorr)
       |SELECT f.event_type, CAST(FLOOR(f.est + 0.5) AS BIGINT) AS approx_users, c.n
       |FROM final f JOIN (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1) c USING (event_type)
       |ORDER BY f.event_type""".stripMargin
  }
}
