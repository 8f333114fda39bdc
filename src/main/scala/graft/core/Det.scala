package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for the DuckDB hash-match gate (SURVEY.md §2).
  *
  * Parallel float summation is not associative, so a double SUM can differ
  * in the last ulp between Spark and DuckDB (different add order). Money
  * aggregates therefore sum as DECIMAL(18,2) — exact, associative,
  * identical on both engines — and cast the final value back to DOUBLE
  * (also sidestepping decimal-precision schema drift: Spark widens sums
  * to DECIMAL(28,2), DuckDB to DECIMAL(38,2)).
  *
  * A double→DECIMAL(18,2) cast is itself deterministic across engines:
  * the exact binary value of a double is never exactly halfway between
  * two 2-decimal values, so HALF_UP vs HALF_EVEN tie-breaks can't differ.
  */
object Det {
  /** Exact money sum: SUM(CAST(x AS DECIMAL(18,2))) cast back to double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** The DuckDB spelling of [[dsum]]. */
  def dsumSql(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  /** Exact mean over the decimal sum: identical double division on both
    * engines (decimal sum exact, count exact, one IEEE divide).
    */
  def davg(c: Column): Column = dsum(c) / count(lit(1))
  def davgSql(x: String): String = s"(${dsumSql(x)} / COUNT(*))"

  /** Revenue-style sum: price × (1 − discount) computed IN decimal.
    *
    * Casting a *computed* double to decimal is NOT cross-engine-safe
    * (Spark rounds the shortest string repr of the double, DuckDB the
    * exact binary value — observed 1-cent drift on join_star). Only raw
    * stored columns (2-decimal-clean doubles) are cast; the multiply and
    * sum then happen in exact decimal arithmetic, identical everywhere.
    */
  def drevenue(price: Column, disc: Column): Column =
    sum(price.cast(DecimalType(18, 2)) * (lit(1) - disc.cast(DecimalType(18, 2)))).cast("double")
  def drevenueSql(price: String, disc: String): String =
    s"CAST(SUM(CAST($price AS DECIMAL(18,2)) * (1 - CAST($disc AS DECIMAL(18,2)))) AS DOUBLE)"
}
