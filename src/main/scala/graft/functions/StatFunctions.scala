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

  // ---------------------------------------------------------------------
  // Student-t CDF via the regularized incomplete beta function.
  //
  // p_two_sided(t, ν) = I_x(ν/2, 1/2) with x = ν/(ν+t²) — the exact tail
  // probability scipy's ttest_ind reports (the reference's notebooks use
  // scipy t-tests, so p_normal alone mis-states small-n slices).
  //
  // Everything below is emitted as SQL TEXT evaluated by BOTH engines:
  // Spark via expr(...) and DuckDB as the oracle. Same arithmetic, same
  // order → bit-identical doubles → identical after rounding. Only the
  // fold syntax differs (Spark `aggregate` HOF / 0-based arrays vs
  // DuckDB `list_reduce` / 1-based lists); the per-step arithmetic is
  // generated from one template.
  //
  // lgamma: Lanczos approximation (g=7, n=9), valid for arg > 0, ~1e-13
  // relative error. betacf: Lentz continued fraction (the classical
  // incomplete-beta CF), run a FIXED 200 double-steps with no early
  // exit so both engines execute the same op sequence; measured
  // converged (≤1e-12) by ~100 steps even at df = 10⁵ in the NR
  // rapid-convergence branch the code always selects. Cost is
  // per-GROUP (a handful of rows), not per-event, so the fixed count
  // is free.
  // ---------------------------------------------------------------------

  /** ln Γ(x) for x > 0 as portable SQL (Lanczos g=7, n=9). */
  def lgammaSql(x: String): String = {
    val coefs = Seq(
      "676.5203681218851", "-1259.1392167224028", "771.32342877765313",
      "-176.61502916214059", "12.507343278686905", "-0.13857109526572012",
      "0.0000099843695780195716", "0.00000015056327351493116")
    val series = coefs.zipWithIndex
      .map { case (c, i) => s"($c) / (($x) + ${i}.0)" }
      .mkString("(0.99999999999980993 + ", " + ", ")")
    val tt = s"(($x) + 6.5)" // (x-1) + g + 0.5 with g = 7
    // 0.91893853320467274178 = ln(2π)/2
    s"(0.9189385332046727 + (($x) - 0.5) * ln($tt) - $tt + ln($series))"
  }

  /** Lentz continued fraction for I_x(a,b) (the `betacf` of the
    * classical algorithm), fixed 200 steps, as a fold expression.
    * `spark=true` → Spark HOF syntax; false → DuckDB list_reduce. */
  private def betacfSql(a: String, b: String, x: String, spark: Boolean): String = {
    val iters = 200
    val qab = s"(($a) + ($b))"
    val qap = s"(($a) + 1.0)"
    val qam = s"(($a) - 1.0)"
    val d0 = s"(1.0 / (1.0 - $qab * ($x) / $qap))"
    // state triple [c, d, h]; one step = the classical even+odd half-steps
    def acc(i: Int) = if (spark) s"acc[$i]" else s"acc[${i + 1}]"
    val em = if (spark) "CAST(m AS DOUBLE)" else "e[1]"
    val aa1 = s"($em * (($b) - $em) * ($x) / (($qam + 2.0 * $em) * (($a) + 2.0 * $em)))"
    val d1 = s"(1.0 / (1.0 + $aa1 * ${acc(1)}))"
    val c1 = s"(1.0 + $aa1 / ${acc(0)})"
    val h1 = s"(${acc(2)} * $d1 * $c1)"
    val aa2 = s"(-(($a) + $em) * ($qab + $em) * ($x) / ((($a) + 2.0 * $em) * ($qap + 2.0 * $em)))"
    val d2 = s"(1.0 / (1.0 + $aa2 * $d1))"
    val c2 = s"(1.0 + $aa2 / $c1)"
    val h2 = s"($h1 * $d2 * $c2)"
    if (spark)
      s"aggregate(sequence(1, $iters), array(CAST(1.0 AS DOUBLE), CAST($d0 AS DOUBLE), CAST($d0 AS DOUBLE)), (acc, m) -> array($c2, $d2, $h2))[2]"
    else
      s"list_reduce(list_prepend([1.0, $d0, $d0], list_transform(generate_series(1, $iters), m -> [CAST(m AS DOUBLE), 0.0, 0.0])), (acc, e) -> [$c2, $d2, $h2])[3]"
  }

  /** Regularized incomplete beta I_x(a,b), x strictly inside (0,1). */
  private def ibetaSql(a: String, b: String, x: String, spark: Boolean): String = {
    val lnBt = s"(${lgammaSql(s"(($a) + ($b))")} - ${lgammaSql(a)} - ${lgammaSql(b)} + ($a) * ln($x) + ($b) * ln(1.0 - ($x)))"
    val fwd = s"(exp($lnBt) * ${betacfSql(a, b, x, spark)} / ($a))"
    val rev = s"(1.0 - exp($lnBt) * ${betacfSql(b, a, s"(1.0 - ($x))", spark)} / ($b))"
    s"(CASE WHEN ($x) < ((($a) + 1.0) / (($a) + ($b) + 2.0)) THEN $fwd ELSE $rev END)"
  }

  /** Two-sided Student-t p-value p = I_{ν/(ν+t²)}(ν/2, 1/2) as portable
    * SQL over a t-statistic expression and a (possibly fractional,
    * Welch) df expression. Matches scipy.stats.t two-sided tails. */
  def pTwoSidedTSql(t: String, df: String, spark: Boolean): String = {
    // CAST inputs to DOUBLE: Spark parses numeric literals as DECIMAL
    // and its decimal ops clamp scale (min 6) — fatal for the Lentz
    // seed 1 - qab·x/qap ≈ O(1/a). Double-typed inputs make every
    // downstream op IEEE double on both engines (bit-identical).
    val tD = s"(CAST($t AS DOUBLE))"
    val dD = s"(CAST($df AS DOUBLE))"
    val x = s"($dD / ($dD + $tD * $tD))"
    val core = ibetaSql(s"($dD / 2.0)", "(CAST(0.5 AS DOUBLE))", x, spark)
    // t = 0 → x = 1 exactly → p = 1 (guard keeps ln(1-x) off that row)
    s"(CASE WHEN ($x) >= 1.0 THEN 1.0 ELSE least(1.0, greatest(0.0, $core)) END)"
  }
}
