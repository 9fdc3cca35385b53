package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-point + deterministic-randomness column helpers.
  *
  * Two cross-engine determinism problems this library must solve to be
  * oracle-testable (driver compares result hashes against DuckDB):
  *
  *   1. Floating-point SUM/AVG is evaluation-order dependent, and a
  *      distributed engine gives no order guarantee. We aggregate monetary
  *      (fixed-decimal) columns as scaled integers — exact, associative,
  *      order-independent — and convert back with one deterministic division
  *      at the end. This is also the right call at 100 TB: integer sums
  *      never lose precision no matter how many partial aggregates merge.
  *
  *   2. Sampling must be reproducible across engines, retries and
  *      partitionings. Instead of RNG state (reference uses Python
  *      `random`, e.g. /root/reference/data_pipeline/utils/keyword_sampler.py:5-14)
  *      we derive uniforms from a cryptographic hash of (seed, row key):
  *      md5 is bit-identical in Spark, DuckDB, and every engine we care
  *      about. Hash-derived randomness is stateless, so a 1000-executor
  *      run, a retried task, and a single-node oracle all draw the same
  *      value for the same row.
  */
object Fp {

  /** Fixed-decimal double → exact scaled integer. ROUND first: the scaled
    * double is within ~1e-4 of an integer, so round-to-nearest is
    * unambiguous in both Spark and DuckDB (which differ on raw
    * double→long cast semantics).
    */
  def fixed(c: Column, scale: Long): Column =
    round(c * scale.toDouble, 0).cast("long")

  /** SQL mirror of [[fixed]] for the DuckDB oracle. */
  def fixedSql(expr: String, scale: Long): String =
    s"CAST(ROUND(($expr) * $scale.0, 0) AS BIGINT)"

  /** Exact integer sum of a fixed-decimal column as a double in original
    * units: one deterministic division after an exact integer sum.
    */
  def sumFixed(c: Column, scale: Long): Column =
    sum(fixed(c, scale)).cast("double") / scale.toDouble

  /** SQL mirror of [[sumFixed]] (DuckDB SUM(BIGINT) yields HUGEINT — cast
    * back before the division so both engines divide a BIGINT by a double).
    */
  def sumFixedSql(expr: String, scale: Long): String =
    s"(CAST(SUM(${fixedSql(expr, scale)}) AS BIGINT) / $scale.0)"

  /** 2-decimal (money) conveniences. */
  def cents(c: Column): Column = fixed(c, 100)
  def centsSql(expr: String): String = fixedSql(expr, 100)

  /** Deterministic uniform in [0, 1): first 32 bits of md5(tag:key).
    * Bit-identical in Spark and DuckDB ([[detUniformSql]]). Hex parsing
    * goes through the native HexLong expression — conv()'s BigInteger
    * path was the measurable hot spot of every hash-derived draw.
    */
  def detUniform(tag: String, key: Column): Column =
    HexLong(md5(concat_ws(":", lit(tag), key.cast("string"))), 8)
      .cast("double") / lit(4294967296.0)

  /** DuckDB mirror of [[detUniform]]. */
  def detUniformSql(tag: String, keyExpr: String): String =
    s"(CAST(('0x' || substr(md5('$tag' || ':' || CAST(($keyExpr) AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0)"

  /** Raw 32-bit hash as a long in [0, 2^32): the integer numerator behind
    * [[detUniform]]. Use when the consumer needs exact integer arithmetic
    * (e.g. signed hyperplane components) instead of a float uniform.
    */
  def detHash32(tag: String, key: Column): Column =
    HexLong(md5(concat_ws(":", lit(tag), key.cast("string"))), 8)

  /** DuckDB mirror of [[detHash32]]. */
  def detHash32Sql(tag: String, keyExpr: String): String =
    s"CAST(('0x' || substr(md5('$tag' || ':' || CAST(($keyExpr) AS VARCHAR)), 1, 8)) AS BIGINT)"

  /** Driver-side evaluation of [[detHash32]] for keys known at plan-build
    * time (e.g. hyperplane components indexed by (plane, dim)): the same
    * md5("tag:key") first-8-hex-chars value, precomputed into a literal
    * so the executor never runs the hash.
    */
  def detHash32Local(tag: String, key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$tag:$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** Deterministic 60-bit hash of a string (15 hex chars of md5): fits a
    * signed 64-bit int in both engines, no sign-bit surprises.
    */
  def hash60(c: Column): Column = HexLong(md5(c), 15)

  /** DuckDB mirror of [[hash60]]. */
  def hash60Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"
}
