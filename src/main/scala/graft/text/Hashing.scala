package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing.
  *
  * The driver's correctness gate compares Spark output against DuckDB
  * running `SparkEntry.oracleSql` — so every hash that reaches query output
  * must be computable identically in both engines. `xxhash64` differs
  * between them; md5 does not. We take the first 15 hex chars (60 bits) of
  * md5 as a non-negative BIGINT:
  *
  *  - Spark : `CAST(conv(substr(md5(s),1,15),16,10) AS BIGINT)`
  *  - DuckDB: `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`
  *
  * For hot paths that never cross the oracle boundary (salting, internal
  * bucketing) prefer `xxhash64` — codegen'd, no md5 cost.
  */
object Hashing {

  /** 60-bit non-negative md5-prefix hash of a string column. */
  def h15(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** The same reduced into 31 bits — safe for `a*h+b` mod-prime MinHash
    * permutations without 64-bit overflow in either engine (DuckDB errors
    * on BIGINT overflow rather than wrapping).
    */
  def h31(c: Column): Column = pmod(h15(c), lit(2147483647L))

  /** DuckDB SQL fragment equivalents (kept adjacent so the two dialects
    * stay in sync; used by SparkEntry.oracleSql).
    */
  def duckH15(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr),1,15)) AS BIGINT)"
  def duckH31(expr: String): String =
    s"(${duckH15(expr)} % 2147483647)"

  /** MinHash permutation family: `perm_i(h) = (a_i*h + b_i) mod p` over
    * h < p = 2^31-1. Coefficients are pure functions of i (Knuth
    * multiplicative constants), identically derivable in SQL.
    */
  val MinHashP = 2147483647L // 2^31 - 1 (Mersenne prime)
  def minHashA(i: Int): Long = ((i + 1L) * 2654435761L) % MinHashP | 1L
  def minHashB(i: Int): Long = ((i + 1L) * 40503L * 65537L) % MinHashP

  def perm(i: Int, h31: Column): Column =
    pmod(lit(minHashA(i)) * h31 + lit(minHashB(i)), lit(MinHashP))
}
