package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic numeric helpers for oracle-comparable output.
  *
  * Double summation is order-dependent, and Spark's shuffle order is
  * not DuckDB's scan order — so any `SUM(double)` can differ in the
  * last ULP between the two engines and break a hash compare. The fix
  * is exact arithmetic: cast the 2-decimal source doubles to
  * DECIMAL(18,2) (exact, associative, order-independent), do sums /
  * products in decimal, and cast the final result back to DOUBLE so
  * both engines emit the identical IEEE value. Further arithmetic
  * (ratios, averages) then happens in double, which is deterministic
  * given identical operands.
  *
  * This matters beyond testing: decimal aggregation is also what the
  * reference's money semantics demand (NUMERIC(15,2) columns,
  * `ETL - Faturamento B2B.py:21-51`), and it stays inside whole-stage
  * codegen at scale.
  */
object Det {
  /** Exact 2-decimal view of a money/quantity double. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent SUM over a 2-decimal double, emitted as double. */
  def dsum(c: Column): Column = sum(dec2(c)).cast("double")

  /** Order-independent AVG (exact sum / count), emitted as double. */
  def davg(c: Column): Column = sum(dec2(c)).cast("double") / count(c)

  /** Exact revenue term: price × (1 − discount) in decimal. */
  def revenue(price: Column, discount: Column): Column =
    dec2(price) * (lit(1).cast(DecimalType(18, 2)) - dec2(discount))

  /** SQL (DuckDB) equivalents for oracle strings. */
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlDavg(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE) / COUNT($expr)"
  def sqlRevenue(price: String, discount: String): String =
    s"CAST($price AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST($discount AS DECIMAL(18,2)))"
}
