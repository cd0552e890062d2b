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
  *
  * Rounding is sign·floor(|x|·10^s + 0.5)/10^s rather than native
  * round(): engines disagree at half-boundaries (Spark rounds the
  * exact decimal expansion of the double, DuckDB scales in FP first).
  * The floor formula is pure IEEE double arithmetic, so identical
  * inputs give identical outputs on every engine. Exact for
  * |x|·10^s < 2^53.
  */
object Compat {
  /** Exact sum of a 2-decimal money column, returned as double. */
  def sumMoney(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Exact-decimal mean of a money column, divided in double at the end. */
  def avgMoney(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType) / count(lit(1))

  /** Portable half-away-from-zero rounding (see class doc). */
  def pround(c: Column, s: Int): Column = {
    val f = math.pow(10, s)
    (signum(c) * floor(abs(c) * f + lit(0.5))) / f
  }

  /** The identical formula as SQL text, for oracle construction. */
  def rSql(e: String, s: Int): String = {
    val f = s"1e$s"
    s"(sign($e) * floor(abs($e) * $f + 0.5) / $f)"
  }

  def r2(c: Column): Column = pround(c, 2)
  def r4(c: Column): Column = pround(c, 4)
  def r6(c: Column): Column = pround(c, 6)
}
