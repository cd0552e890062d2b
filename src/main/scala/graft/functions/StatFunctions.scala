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

  /** Kolmogorov asymptotic survival function Q_KS(z) =
    * 2 Σ_{k≥1} (−1)^{k−1} exp(−2k²z²), truncated at a FIXED 24 terms
    * and clamped to [0,1] — the two-sample KS p-value at
    * z = √(n₁n₂/(n₁+n₂))·D (scipy.stats.ks_2samp mode='asymp').
    * Truncation error ≤ 2·exp(−2·625·z²) (first dropped term): < 1e-12
    * for z ≥ 0.15. Below z = 0.15 the truncated alternating series
    * COLLAPSES toward 0 while the true survival function → 1, so that
    * region short-circuits to the exact limit 1.0 (the clamp alone
    * cannot repair an underestimate). Emitted as SQL text evaluated by
    * BOTH engines (pure {*,+,exp} arithmetic plus one branch on the
    * identical double), so results are bit-identical pre-rounding.
    */
  def ksPSql(z: String): String = {
    val x = s"(($z) * ($z))"
    val terms = (1 to 24).map { k =>
      val c = 2 * k * k
      val sign = if (k % 2 == 1) "+" else "-"
      s"$sign exp(-$c.0 * $x)"
    }.mkString(" ")
    s"(CASE WHEN ($z) < 0.15 THEN 1.0 " +
      s"ELSE least(1.0, greatest(0.0, 2.0 * (0.0 $terms))) END)"
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

  /** Upper-tail F probability P(F_{d1,d2} > f) = I_x(d2/2, d1/2) at
    * x = d2/(d2 + d1·f) — the one-way ANOVA p-value. Same generated-
    * text-for-both-engines discipline as the t CDF (the d1=1 case is
    * exactly pTwoSidedTSql(√f, d2); this generalizes to k groups). */
  def pFSql(f: String, d1: String, d2: String, spark: Boolean): String = {
    val x = s"(($d2) / (($d2) + ($d1) * ($f)))"
    s"least(1.0, greatest(0.0, ${ibetaSql(s"(($d2) / 2.0)", s"(($d1) / 2.0)", x, spark)}))"
  }

  // ---------------------------------------------------------------------
  // Noncentral-t power analysis (the reference's tt_ind_solve_power /
  // TTestIndPower usage — switchback_analysis.ipynb,
  // method_evaluation.ipynb: the notebooks SOLVE for n given an MDE).
  //
  // Exact two-sided power of the pooled two-sample t-test. Lenth's
  // AS 243 series for the noncentral-t CDF is
  //   F(t; ν, δ) = Φ(−δ) + ½ Σ_j [p_j·I_x(j+½, ν/2) + q_j·I_x(j+1, ν/2)]
  // with x = t²/(ν+t²), λ = δ²/2, p_j = e^{−λ}λ^j/j!. Two-sided power is
  //   1 − F(t_c; δ) + F(−t_c; δ)  =  1 − F(t_c; δ) + 1 − F(t_c; −δ),
  // and under δ → −δ only the q_j terms flip sign, so they CANCEL and
  // the whole thing collapses to
  //   power = 1 − Σ_j p_j · I_x(j+½, ν/2)
  // — one Poisson-weighted half-integer incomplete-beta series. The
  // I_x chain has a two-term recurrence (I_x(a+1,b) = I_x(a,b) −
  // x^a(1−x)^b/(a·B(a,b))), so the series is ONE fixed-length fold
  // seeded by a single Lentz continued fraction — portable SQL, same
  // text both engines. PowerSpec validates the series against an
  // independent χ²-mixture quadrature (commons-math3 erfc + Simpson,
  // sharing none of this machinery) to ≤1e-9 — the quadrature's own
  // error floor, not the series'.
  // ---------------------------------------------------------------------

  /** Student-t quantile at one-sided normal quantile `z`, via the
    * Cornish–Fisher expansion (A&S 26.7.5). Truncation error (vs exact
    * inverse-t, PowerSpec): ~2.5e-5 at ν=8, <1e-5 by ν=10, <1e-7 at
    * ν≥30 — contributes <5e-6 to power even at ν=8. */
  def tInvCfSql(z: String, nu: String): String = {
    val zD = s"(CAST($z AS DOUBLE))"
    val nD = s"(CAST($nu AS DOUBLE))"
    val g1 = s"(($zD*$zD*$zD + $zD) / 4.0)"
    val g2 = s"((5.0*$zD*$zD*$zD*$zD*$zD + 16.0*$zD*$zD*$zD + 3.0*$zD) / 96.0)"
    val g3 = s"((3.0*$zD*$zD*$zD*$zD*$zD*$zD*$zD + 19.0*$zD*$zD*$zD*$zD*$zD + 17.0*$zD*$zD*$zD - 15.0*$zD) / 384.0)"
    val g4 = s"((79.0*$zD*$zD*$zD*$zD*$zD*$zD*$zD*$zD*$zD + 776.0*$zD*$zD*$zD*$zD*$zD*$zD*$zD + 1482.0*$zD*$zD*$zD*$zD*$zD - 1920.0*$zD*$zD*$zD - 945.0*$zD) / 92160.0)"
    s"($zD + $g1 / $nD + $g2 / ($nD*$nD) + $g3 / ($nD*$nD*$nD) + $g4 / ($nD*$nD*$nD*$nD))"
  }

  /** Exact two-sided noncentral-t power at critical value `tcrit`:
    * 1 − Σ_{j<128} p_j I_x(j+½, ν/2) (see block comment above). 128
    * Poisson terms cover λ = δ²/2 up to ~64 (δ ≤ 11 — beyond that the
    * power is 1 to double precision, and e^{−λ} underflow gives exactly
    * that limit). */
  def nctTwoSidedPowerSql(delta: String, nu: String, tcrit: String, spark: Boolean): String = {
    val dD = s"(CAST($delta AS DOUBLE))"
    val nD = s"(CAST($nu AS DOUBLE))"
    val tD = s"(CAST($tcrit AS DOUBLE))"
    val x = s"($tD * $tD / ($nD + $tD * $tD))"
    val lam = s"($dD * $dD / 2.0)"
    val p0 = s"(exp(-$lam))"
    val a0 = ibetaSql("(CAST(0.5 AS DOUBLE))", s"($nD / 2.0)", x, spark)
    // 0.5723649429247001 = lgamma(0.5), inlined so both engines share text
    val ta0 = s"(2.0 * sqrt($x) * exp(($nD / 2.0) * ln(1.0 - $x) - 0.5723649429247001 - ${lgammaSql(s"($nD / 2.0)")} + ${lgammaSql(s"($nD / 2.0 + 0.5)")}))"
    val iters = 128
    def acc(i: Int) = if (spark) s"acc[$i]" else s"acc[${i + 1}]"
    val m = if (spark) "CAST(m AS DOUBLE)" else "e[1]"
    // state [p_j, A_j = I_x(j+½, ν/2), TA_j (recurrence term), Σ so far]
    val pNew = s"(${acc(0)} * $lam / $m)"
    val aNew = s"(${acc(1)} - ${acc(2)})"
    val taNew = s"(${acc(2)} * $x * ($m - 0.5 + $nD / 2.0) / ($m + 0.5))"
    val sNew = s"(${acc(3)} + ${acc(0)} * ${acc(1)})"
    val fold =
      if (spark)
        s"aggregate(sequence(1, $iters), array(CAST($p0 AS DOUBLE), CAST($a0 AS DOUBLE), CAST($ta0 AS DOUBLE), CAST(0.0 AS DOUBLE)), (acc, m) -> array($pNew, $aNew, $taNew, $sNew))[3]"
      else
        s"list_reduce(list_prepend([$p0, $a0, $ta0, 0.0], list_transform(generate_series(1, $iters), m -> [CAST(m AS DOUBLE), 0.0, 0.0, 0.0])), (acc, e) -> [$pNew, $aNew, $taNew, $sNew])[4]"
    s"(least(1.0, greatest(0.0, 1.0 - $fold)))"
  }

  /** Two-sided pooled two-sample t-test power at α=0.05 for Cohen's d
    * and per-group sizes n1, n2 (fractional sizes fine — the solve-n
    * Newton path passes them). Matches statsmodels
    * TTestIndPower().power(d, nobs1=n1, ratio=n2/n1) to ≤ 2e-7. */
  def powerTTestSql(d: String, n1: String, n2: String, spark: Boolean): String = {
    val n1D = s"(CAST($n1 AS DOUBLE))"
    val n2D = s"(CAST($n2 AS DOUBLE))"
    val nu = s"($n1D + $n2D - 2.0)"
    val delta = s"(abs(CAST($d AS DOUBLE)) * sqrt($n1D * $n2D / ($n1D + $n2D)))"
    val tc = tInvCfSql("1.959963984540054", nu)
    nctTwoSidedPowerSql(delta, nu, tc, spark)
  }

  /** Classical sample-size iteration for the two-sample t-test at
    * α=0.05, power=0.8: z-based closed-form seed, then 8 fixed
    * refinements n ← 2·(t_{.975,ν} + t_{.80,ν})²/d² with ν = 2n−2
    * (Cornish–Fisher quantiles). Lands within ~0.02 of the exact
    * noncentral-t solution; the operator's Newton steps finish the job. */
  def solveNSeedSql(d: String, spark: Boolean): String = {
    val dD = s"(CAST($d AS DOUBLE))"
    val zsum = "(1.959963984540054 + 0.8416212335729143)"
    val seed = s"(2.0 * $zsum * $zsum / ($dD * $dD))"
    def acc0 = if (spark) "acc[0]" else "acc[1]"
    val nuS = s"(greatest(2.0, 2.0 * $acc0 - 2.0))"
    val ta = tInvCfSql("1.959963984540054", nuS)
    val tb = tInvCfSql("0.8416212335729143", nuS)
    val step = s"(2.0 * ($ta + $tb) * ($ta + $tb) / ($dD * $dD))"
    if (spark)
      s"aggregate(sequence(1, 8), array(CAST($seed AS DOUBLE)), (acc, m) -> array($step))[0]"
    else
      s"list_reduce(list_prepend([$seed], list_transform(generate_series(1, 8), m -> [0.0])), (acc, e) -> [$step])[1]"
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
