package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Oracle-compatible deterministic aggregation helpers.
  *
  * Floating-point sums are order-dependent, and a distributed engine does
  * not guarantee accumulation order — so every "money" aggregate routes
  * through exact DECIMAL arithmetic and is only converted to double at
  * the very end. That makes results bit-identical across partitionings
  * (and across engines, which is what the DuckDB oracle checks).
  */
object Compat {
  /** Exact sum of a 2-decimal money column, returned as double. */
  def sumMoney(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Exact-decimal mean of a money column, divided in double at the end. */
  def avgMoney(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType) / count(c)

  /** Round to fixed decimals — applied to any statistic whose FP noise is
    * below 1e-6, collapsing cross-engine accumulation differences. */
  def r4(c: Column): Column = round(c, 4)
  def r2(c: Column): Column = round(c, 2)
}
