package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Statistical helper expressions built from codegen'd built-ins.
  *
  * The normal CDF uses the Abramowitz–Stegun 7.1.26 erf approximation
  * (max abs error 1.5e-7) — chosen over a native erf because it is pure
  * {exp, *, +} arithmetic, so the DuckDB oracle can evaluate the exact
  * same formula and produce bit-comparable results (pre-rounding).
  */
object StatFunctions {
  /** erfc(x) for x >= 0, A&S 7.1.26. */
  private def erfcPos(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * t + lit(-1.453152027)) * t +
      lit(1.421413741)) * t + lit(-0.284496736)) * t + lit(0.254829592)) * t
    poly * exp(-x * x)
  }

  /** Two-sided normal-approximation p-value for a z (or large-df t)
    * statistic: p = erfc(|z| / sqrt(2)). */
  def pTwoSidedNormal(z: Column): Column =
    least(lit(1.0), erfcPos(abs(z) / lit(math.sqrt(2.0))))

  /** Standard normal CDF Φ(x) for any x (A&S erfc + symmetry). */
  def normCdf(x: Column): Column = {
    val e = erfcPos(abs(x) / lit(math.sqrt(2.0)))
    when(x >= 0, lit(1.0) - lit(0.5) * e).otherwise(lit(0.5) * e)
  }

  /** Φ(x) as DuckDB SQL (same arithmetic as [[normCdf]]). */
  def normCdfSql(x: String): String = {
    val ax = s"(abs($x) / sqrt(2))"
    val t = s"(1.0 / (1.0 + 0.3275911 * $ax))"
    val poly = s"(((((1.061405429 * $t + -1.453152027) * $t + 1.421413741) * $t + -0.284496736) * $t + 0.254829592) * $t)"
    val e = s"($poly * exp(-($ax) * ($ax)))"
    s"(CASE WHEN ($x) >= 0 THEN 1.0 - 0.5 * $e ELSE 0.5 * $e END)"
  }

  /** The same formula as DuckDB SQL, for oracle construction. */
  def pTwoSidedNormalSql(z: String): String = {
    val x = s"(abs($z) / sqrt(2))"
    val t = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val poly = s"(((((1.061405429 * $t + -1.453152027) * $t + 1.421413741) * $t + -0.284496736) * $t + 0.254829592) * $t)"
    s"least(1.0, $poly * exp(-($x) * ($x)))"
  }
}
