package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator-registry entry (SURVEY.md §2 row): a DataFrame builder
  * `(session, sfDir) => DataFrame` plus, when the semantics are
  * SQL-expressible, an equivalent DuckDB oracle SQL string the driver
  * replays over the same parquet tables (hash-compare gate).
  *
  * Determinism contract for every oracle-checked entry (SURVEY.md §2
  * totals + FIXTURES.md checklist): trailing ORDER BY over a unique key,
  * money aggregates summed as DECIMAL(18,2) then cast back to DOUBLE on
  * both engines, no approx/rand/now, collect_list always sorted.
  */
final case class Q(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Q {
  /** Oracle-checked entry. */
  def apply(sql: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(build, Some(sql))
  /** Non-oracle entry (verified by unit/property tests instead). */
  def noOracle(build: (SparkSession, String) => DataFrame): Q =
    Q(build, None)
}
