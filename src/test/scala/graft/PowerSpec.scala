package graft

import org.apache.commons.math3.distribution.TDistribution
import org.apache.commons.math3.special.{Erf, Gamma}
import org.apache.spark.sql.functions._

import graft.functions.StatFunctions._

/** Validates the portable-SQL noncentral-t power machinery against an
  * INDEPENDENT exact implementation. The SQL path (StatFunctions
  * .nctTwoSidedPowerSql) is a collapsed Lenth-series fold: Poisson
  * weights × a recurrence-chained incomplete-beta, seeded by a Lentz
  * continued fraction and a Cornish–Fisher critical value. The
  * reference here shares NONE of that machinery: two-sided tail mass
  * P(|T| > t) is computed by numerically integrating the scale-mixture
  * representation T = (Z + δ)/√(V/ν), V ~ χ²_ν —
  *   P(|T| > t) = ∫ f_χ²ν(v)·[Φ̄(t√(v/ν) − δ) + Φ(−t√(v/ν) − δ)] dv
  * — with commons-math3 erfc/logGamma and Simpson quadrature, and the
  * exact critical value from commons-math3's TDistribution solver.
  * A shared math error (wrong recurrence coefficient, wrong critical
  * value) cannot hash-match its way through this spec the way it could
  * through the Spark-vs-DuckDB compare (which runs the SAME SQL text
  * on both engines).
  */
class PowerSpec extends SparkSpec {

  /** χ²_ν log-density. */
  private def chi2LogPdf(v: Double, nu: Double): Double =
    (nu / 2 - 1) * math.log(v) - v / 2 - (nu / 2) * math.log(2.0) - Gamma.logGamma(nu / 2)

  /** Φ̄(x) = P(Z > x), to ~1e-15. */
  private def phiBar(x: Double): Double = 0.5 * Erf.erfc(x / math.sqrt(2.0))

  /** Exact two-sided noncentral-t tail P(|T| > t), T ~ nct(ν, δ), by
    * Simpson integration over the mixing χ²_ν variable (~1e-11). */
  private def nctTwoTailExact(t: Double, nu: Double, delta: Double): Double = {
    val lo = math.max(1e-12, nu - 14 * math.sqrt(2 * nu))
    val hi = nu + 16 * math.sqrt(2 * nu)
    val n = 1 << 17 // Simpson intervals (even); h^4 error ≪ 1e-11 here
    val h = (hi - lo) / n
    def g(v: Double): Double = {
      val s = t * math.sqrt(v / nu)
      // P(T>t|v) + P(T<-t|v) = Φ̄(s−δ) + Φ(−s−δ), and Φ(−x) = Φ̄(x)
      math.exp(chi2LogPdf(v, nu)) * (phiBar(s - delta) + phiBar(s + delta))
    }
    val sum = (1 until n).map { i =>
      val w = if (i % 2 == 1) 4.0 else 2.0
      w * g(lo + i * h)
    }.sum + g(lo) + g(hi)
    sum * h / 3
  }

  private def tcritExact(nu: Double): Double =
    new TDistribution(null, nu, 1e-12).inverseCumulativeProbability(0.975)

  /** Exact power of the pooled two-sample t-test, α=0.05 two-sided. */
  private def powerExact(d: Double, n1: Double, n2: Double): Double = {
    val nu = n1 + n2 - 2
    val delta = math.abs(d) * math.sqrt(n1 * n2 / (n1 + n2))
    nctTwoTailExact(tcritExact(nu), nu, delta)
  }

  /** Evaluate one scalar SQL expression (Spark dialect) to a Double. */
  private def evalSql(e: String): Double =
    spark.range(1).selectExpr(s"CAST(($e) AS DOUBLE) AS v").head().getDouble(0)

  private val grid = Seq( // (d, n1, n2) spanning tiny→huge ν and weak→strong effects
    (0.2, 5.0, 5.0), (0.5, 5.0, 9.0), (0.8, 10.0, 10.0),
    (0.2, 30.0, 30.0), (0.5, 30.0, 50.0), (0.5, 64.0, 64.0),
    (0.8, 64.0, 64.0), (0.1, 200.0, 300.0), (0.05, 2000.0, 2000.0),
    (1.5, 12.0, 12.0), (2.5, 8.0, 8.0),
  )

  test("noncentral-t series matches exact integration at the EXACT critical value (isolates the Lenth fold)") {
    for ((d, n1, n2) <- grid) {
      val nu = n1 + n2 - 2
      val delta = math.abs(d) * math.sqrt(n1 * n2 / (n1 + n2))
      val tc = tcritExact(nu)
      val sql = evalSql(nctTwoSidedPowerSql(delta.toString, nu.toString, tc.toString, spark = true))
      val exact = nctTwoTailExact(tc, nu, delta)
      assert(math.abs(sql - exact) <= 1e-9,
        s"series drift d=$d n1=$n1 n2=$n2: sql=$sql exact=$exact")
    }
  }

  test("end-to-end powerTTestSql (Cornish–Fisher tcrit) within CF quantile error of exact power") {
    for ((d, n1, n2) <- grid) {
      val sql = evalSql(powerTTestSql(d.toString, n1.toString, n2.toString, spark = true))
      val exact = powerExact(d, n1, n2)
      // CF quantile error ≤8e-6 at ν=10 × nct density ≤0.4 → ≤~4e-6;
      // shrinks fast with ν (≤3e-8 at ν≥30)
      val tol = if (n1 + n2 - 2 < 30) 5e-6 else 5e-7
      assert(math.abs(sql - exact) <= tol,
        s"power drift d=$d n1=$n1 n2=$n2: sql=$sql exact=$exact")
    }
  }

  test("Cornish–Fisher t quantile vs exact inverse-t") {
    for (nu <- Seq(8.0, 10.0, 18.0, 30.0, 60.0, 126.0, 1000.0)) {
      val cf = evalSql(tInvCfSql("1.959963984540054", nu.toString))
      val ex = tcritExact(nu)
      // 4-term CF truncation error: ~2.5e-5 at ν=8, <1e-5 by ν≥10,
      // <1e-7 by ν≥30 — what the series genuinely delivers
      val tol = if (nu < 10) 4e-5 else if (nu < 30) 1e-5 else 1e-7
      assert(math.abs(cf - ex) <= tol, s"tinv drift nu=$nu: cf=$cf exact=$ex")
    }
  }

  test("null effect: power at d=0 equals the test size α=0.05") {
    for ((n1, n2) <- Seq((10.0, 10.0), (64.0, 64.0), (500.0, 500.0))) {
      val sql = evalSql(powerTTestSql("0.0", n1.toString, n2.toString, spark = true))
      assert(math.abs(sql - 0.05) <= 2e-5, s"size drift n1=$n1 n2=$n2: $sql")
    }
  }

  test("solve-n chain lands on 80% exact power (statsmodels tt_ind_solve_power analog)", SlowTest) {
    // replicate Stats.solveN's SQL chain (seed + 2 finite-diff Newton
    // steps) on literal effect sizes, then judge the result against the
    // independent integrator: power(d, n_req, n_req) must be 0.8
    def newton(n: String, pa: String, pah: String): String =
      s"(CASE WHEN abs($pah - $pa) < 1e-12 THEN $n ELSE $n - ($pa - 0.8) * ($n * 0.001) / ($pah - $pa) END)"
    for (d <- Seq(0.1, 0.2, 0.35, 0.5, 0.8)) {
      val nReq = spark.range(1)
        .selectExpr(s"CAST($d AS DOUBLE) AS d_mde_raw")
        .withColumn("n_seed_raw", expr(solveNSeedSql("d_mde_raw", spark = true)))
        .withColumn("p_a_raw", expr(powerTTestSql("d_mde_raw", "n_seed_raw", "n_seed_raw", spark = true)))
        .withColumn("p_ah_raw", expr(powerTTestSql("d_mde_raw", "(n_seed_raw * 1.001)", "(n_seed_raw * 1.001)", spark = true)))
        .withColumn("n_mid_raw", expr(newton("n_seed_raw", "p_a_raw", "p_ah_raw")))
        .withColumn("p_b_raw", expr(powerTTestSql("d_mde_raw", "n_mid_raw", "n_mid_raw", spark = true)))
        .withColumn("p_bh_raw", expr(powerTTestSql("d_mde_raw", "(n_mid_raw * 1.001)", "(n_mid_raw * 1.001)", spark = true)))
        .selectExpr(s"CAST(${newton("n_mid_raw", "p_b_raw", "p_bh_raw")} AS DOUBLE) AS n")
        .head().getDouble(0)
      val achieved = powerExact(d, nReq, nReq)
      assert(math.abs(achieved - 0.8) <= 1e-4,
        s"solve-n drift d=$d: n=$nReq achieved=$achieved")
    }
    // the classic anchor: d=0.5 at 80% power needs ~64/group
    // (statsmodels tt_ind_solve_power(0.5, power=0.8) = 63.77)
    val n05 = spark.range(1).selectExpr("CAST(0.5 AS DOUBLE) AS d_mde_raw")
      .withColumn("n_seed_raw", expr(solveNSeedSql("d_mde_raw", spark = true)))
      .selectExpr("n_seed_raw AS n").head().getDouble(0)
    assert(n05 > 62.5 && n05 < 65.0, s"seed off the published anchor: $n05")
  }
}
