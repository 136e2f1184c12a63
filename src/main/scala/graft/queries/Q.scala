package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Oracle-parity helpers.
  *
  * The driver hash-compares Spark results against DuckDB running the same
  * SQL. Floating-point SUMs are order-dependent, and Spark's partial
  * aggregation order varies run-to-run — so every aggregated double goes
  * through exact DECIMAL(38,6) arithmetic and is cast back to DOUBLE at the
  * end. Identical decimals convert to identical doubles in both engines,
  * making results bit-stable across engines AND across Spark runs.
  * SQL mirror: CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE).
  */
object Q {
  /** order-independent exact sum of a double column, returned as double */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(38, 6))).cast(DoubleType)

  /** exact-sum / count, divided as doubles (identical in both engines) */
  def davg(c: Column): Column =
    dsum(c) / count(c).cast(DoubleType)

  val DSUM_SQL = "CAST(SUM(CAST(%s AS DECIMAL(38,6))) AS DOUBLE)"
  def dsumSql(expr: String): String = DSUM_SQL.format(expr)
  def davgSql(expr: String): String =
    s"${dsumSql(expr)} / CAST(COUNT(${expr}) AS DOUBLE)"
}
