package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism helpers for oracle-compared aggregates.
  *
  * Floating-point SUM/AVG are order-dependent: Spark merges partial
  * aggregates in shuffle-arrival order, DuckDB in its own order, so raw
  * `sum(double)` can differ in the last ulps between engines AND between
  * runs. Summing through a fixed-scale decimal is exact and therefore
  * order-independent; casting the exact decimal back to double is a single
  * deterministic rounding. The oracle SQL mirrors the same cast chain
  * (`CAST(SUM(CAST(x AS DECIMAL(30,s))) AS DOUBLE)`).
  *
  * This also holds at cluster scale: decimal sums stay exact across any
  * number of partial/final merge steps, so results are stable under AQE
  * re-planning, speculative tasks, and different partition counts.
  */
object Exact {
  /** Order-independent sum of a double column via exact decimal. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType)

  /** Order-independent mean: exact decimal sum / count, divided as double. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType) /
      count(c).cast(DoubleType)

  /** SQL fragment mirroring [[dsum]] for the DuckDB oracle. */
  def sqlSum(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(30,$scale))) AS DOUBLE)"

  /** SQL fragment mirroring [[davg]]. */
  def sqlAvg(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(30,$scale))) AS DOUBLE) / CAST(COUNT($expr) AS DOUBLE)"
}
