package graft.functions

/** DuckDB SQL fragments mirroring [[HashUtil]] bit-for-bit, so custom
  * hash Expressions (rolling fingerprint, simhash) can be ORACLED
  * exactly instead of rows-only checked. All values are carried as
  * HUGEINT residues in [0, 2^64): DuckDB's integer arithmetic errors
  * on overflow rather than wrapping, so 64-bit wraparound is explicit
  * `% 2^64`, and the two 64-bit finalizer multiplications split into
  * 32-bit halves to keep every intermediate below 2^97 (inside
  * HUGEINT). XOR and unsigned shifts detour through UBIGINT, where
  * they are total.
  */
private[graft] object OracleHashSql {

  /** 2^64 as a DuckDB HUGEINT literal. */
  val M = "18446744073709551616"

  /** (a*b) mod 2^64 via 32-bit split multiplication. */
  def mul64(a: String, b: String): String =
    s"(((($a)%4294967296)*(($b)%4294967296) + (((($a)%4294967296)*(($b)//4294967296)" +
      s" + (($a)//4294967296)*(($b)%4294967296)) % 4294967296) * 4294967296)" +
      s" % $M)"

  /** x XOR (x >>> n) on a [0,2^64) HUGEINT. */
  def xorShift(x: String, n: Int): String =
    s"CAST(xor(CAST(($x) AS UBIGINT), CAST(($x) AS UBIGINT) >> $n) AS HUGEINT)"

  /** UTF-8 byte list (HUGEINT elements) of a hex-encoded string
    * column `hx` with byte length `n` — `hex()` is uppercase.
    */
  def bytesList(hx: String, n: String): String =
    s"list_transform(range(0, $n), i -> " +
      s"CAST((strpos('0123456789ABCDEF', substr($hx, 2*i+1, 1))-1)*16" +
      s" + (strpos('0123456789ABCDEF', substr($hx, 2*i+2, 1))-1) AS HUGEINT))"

  /** FNV-1a 64 fold over a HUGEINT byte list (pre-finalizer):
    * h = (h XOR b) * prime, from the offset basis. Products stay
    * under 2^104 (byte < 256), so no split needed.
    */
  def fnvFold(bytes: String): String =
    s"list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), $bytes)," +
      s" (a, b) -> (CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT)" +
      s" * 1099511628211) % $M)"

  /** Polynomial fold h = h*prime + b over a HUGEINT byte list
    * (the rolling-window hash, recomputed per window).
    */
  def polyFold(bytes: String): String =
    s"list_reduce($bytes, (a, b) -> (a * 1099511628211 + b) % $M)"

  /** splitmix64 finalizer as a 4-CTE chain: reads column `z` of CTE
    * `from`, emits CTE `<p>4` with the mixed value as `outCol`,
    * carrying `carry` columns through every stage (stage-per-CTE keeps
    * the generated expression linear — inlining would blow up
    * exponentially through the xor-shift-multiply chain).
    */
  def mix64Ctes(from: String, p: String, outCol: String, carry: Seq[String]): String = {
    val c = carry.mkString(", ")
    s""", ${p}1 AS (SELECT $c, (z + 11400714819323198485) % $M AS z FROM $from)
       |, ${p}2 AS (SELECT $c, ${mul64(xorShift("z", 30), "13787848793156543929")} AS z FROM ${p}1)
       |, ${p}3 AS (SELECT $c, ${mul64(xorShift("z", 27), "10723151780598845931")} AS z FROM ${p}2)
       |, ${p}4 AS (SELECT $c, ${xorShift("z", 31)} AS $outCol FROM ${p}3)""".stripMargin
  }

  /** [0,2^64) HUGEINT residue → signed 64-bit BIGINT (Spark LongType). */
  def toSigned(u: String): String =
    s"CAST(CASE WHEN ($u) >= 9223372036854775808 THEN ($u) - $M ELSE ($u) END AS BIGINT)"
}
