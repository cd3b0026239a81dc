package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** A bundle of named queries plus their DuckDB oracle SQL.
  *
  * Each operator family (relational core, dedup, similarity, text, …)
  * contributes one pack; `SparkEntry` concatenates them. A query missing
  * from `oracles` gets the driver's weaker rows-only check (used for ops
  * that ANSI SQL can't express, e.g. the 9-coefficient polynomial fit).
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}

/** Exact-arithmetic helpers for oracle parity.
  *
  * The driver hash-compares Spark results against DuckDB. Double-precision
  * aggregation is order-dependent, so any float that has been through a
  * `sum`/`avg` would hash-mismatch. The fix: route measures through
  * DECIMAL — both engines sum decimals exactly, so the final
  * `CAST(… AS DOUBLE)` yields bit-identical values — and derive any
  * floating-point result (means, slopes, ratios) from those exact sums
  * with the *same* IEEE expression tree on both sides.
  */
object Exact {
  /** Money/measure columns (2 decimal digits in the corpus) → exact decimal. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
}
