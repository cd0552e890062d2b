package graft.operators

import graft.{Op, Tables}
import graft.functions.Compat._
import graft.functions.StatFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Statistical significance tests (SURVEY.md §2 block B, part 2) — the
  * analysis layer of the reference:
  *  - Mann-Whitney U (…analysis_script.py:141, scipy.stats.mannwhitneyu
  *    two-sided, tie-corrected normal approximation)
  *  - Welch t-test / CIs / percentiles (notebooks: ttest_ind,
  *    weightstats, np.percentile usage)
  *
  * Determinism: every moment (Σx, Σx²) is accumulated in exact DECIMAL,
  * and rank statistics are sums of exact half-integers, so results are
  * independent of partitioning/accumulation order — then rounded.
  *
  * Scale: the MWU rank table is built per DISTINCT value (groupBy first),
  * so the ordered pass runs over |distinct values| rows per event_type,
  * not raw rows — no global sort of the fact table.
  */
object Stats {

  private def onOff: Column =
    when((expr("unix_micros(date_trunc('hour', ts)) div 3600000000") +
      col("user_id") % 10) % 2 === 0, "On").otherwise("Off")

  private val onOffSql =
    "CASE WHEN ((epoch_us(date_trunc('hour', ts)) // 3600000000) + (user_id % 10)) % 2 = 0 THEN 'On' ELSE 'Off' END"

  /** Divisor guard (the tost/propTest discipline, hoisted): a zero
    * divisor becomes NULL so a degenerate group yields NULL stats
    * instead of an ANSI divide-by-zero error. DuckDB needs no twin —
    * its x/0 is already NULL — so oracles stay textually unchanged
    * and values agree wherever the divisor is nonzero. */
  private def nzc(c: Column): Column = when(c =!= 0, c)

  /** Welch's unequal-variance t-test per event_type, On vs Off.
    * Degenerate-group divisors carry the tost nz() guard: a 0- or
    * 1-row arm yields NULL stats in BOTH engines rather than an ANSI
    * divide-by-zero error on the Spark side. */
  def ttestWelch(spark: SparkSession, dir: String): DataFrame = {
    val moments = onOffMoments(spark, dir)
    val m1 = col("s1") / nzc(col("n1")); val m2 = col("s2") / nzc(col("n2"))
    val v1 = (col("ss1") - col("s1") * col("s1") / nzc(col("n1"))) / nzc(col("n1") - 1)
    val v2 = (col("ss2") - col("s2") * col("s2") / nzc(col("n2"))) / nzc(col("n2") - 1)
    val se2 = v1 / col("n1") + v2 / col("n2")
    val t = (m1 - m2) / nzc(sqrt(se2))
    val df = se2 * se2 / nzc((v1 / col("n1")) * (v1 / col("n1")) / nzc(col("n1") - 1) +
      (v2 / col("n2")) * (v2 / col("n2")) / nzc(col("n2") - 1))
    // raw t/df flow through NAMED columns so the Student-t CF (a big
    // generated expression) references them identically to the oracle
    moments.select(
      col("event_type"), col("n1"), col("n2"),
      m1.as("m1_raw"), m2.as("m2_raw"), t.as("t_raw"), df.as("df_raw"))
      .select(
        col("event_type"), col("n1"), col("n2"),
        r4(col("m1_raw")).as("mean_on"), r4(col("m2_raw")).as("mean_off"),
        r4(col("t_raw")).as("t_stat"), r4(col("df_raw")).as("df"),
        r6(pTwoSidedNormal(col("t_raw"))).as("p_normal"),
        r6(expr(pTwoSidedTSql("t_raw", "df_raw", spark = true))).as("p_t"),
      ).orderBy("event_type")
  }

  private val ttestWelchOracle = {
    val m1 = "(s1 / n1)"; val m2 = "(s2 / n2)"
    val v1 = "((ss1 - s1 * s1 / n1) / (n1 - 1))"
    val v2 = "((ss2 - s2 * s2 / n2) / (n2 - 1))"
    val se2 = s"($v1 / n1 + $v2 / n2)"
    val t = s"(($m1 - $m2) / sqrt($se2))"
    val df = s"($se2 * $se2 / (($v1/n1)*($v1/n1)/(n1-1) + ($v2/n2)*($v2/n2)/(n2-1)))"
    s"""WITH moments AS ($onOffMomentsSql),
       |stats AS (
       |  SELECT event_type, n1, n2, $m1 AS m1_raw, $m2 AS m2_raw,
       |    $t AS t_raw, $df AS df_raw
       |  FROM moments)
       |SELECT event_type, n1, n2,
       |  ${rSql("m1_raw", 4)} AS mean_on, ${rSql("m2_raw", 4)} AS mean_off,
       |  ${rSql("t_raw", 4)} AS t_stat, ${rSql("df_raw", 4)} AS df,
       |  ${rSql(pTwoSidedNormalSql("t_raw"), 6)} AS p_normal,
       |  ${rSql(pTwoSidedTSql("t_raw", "df_raw", spark = false), 6)} AS p_t
       |FROM stats ORDER BY event_type""".stripMargin
  }

  /** Mann-Whitney U, two-sided, tie-corrected + continuity-corrected
    * normal approximation — matches scipy.stats.mannwhitneyu(method=
    * 'asymptotic', use_continuity=True) to ~1e-7
    * (…analysis_script.py:141). */
  def mwu(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .withColumn("g", onOff)
      .groupBy("event_type", "value")
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("g") === "On", 1L).otherwise(0L)).as("cnt_on"))
    val w = Window.partitionBy("event_type").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = counts
      .withColumn("cum_before", coalesce(sum("cnt").over(w), lit(0L)))
      // average rank of a tied value-block: exact half-integer
      .withColumn("avg_rank", col("cum_before") + (col("cnt") + 1) / 2.0)
    val agg = ranked.groupBy("event_type").agg(
      sum(col("avg_rank") * col("cnt_on")).as("r_on"), // exact: sum of halves
      sum("cnt_on").as("n1"),
      sum("cnt").as("n"),
      // cnt³ in DECIMAL(38,0): a value-block with ≥2^21 duplicate rows
      // would silently wrap a 64-bit cnt³ in Spark (and error in
      // DuckDB) — the ksTest overflow discipline
      sum(col("cnt").cast(DecimalType(38, 0)) * col("cnt") * col("cnt") - col("cnt"))
        .as("tie_t"),
    )
    // counts promoted to double BEFORE multiplying (the PMI
    // discipline): n1·n2 and n1·(n1+1) overflow Long past ~3e9 rows
    // per arm; in double they stay exact to 2^53 and merely round
    // beyond — in lockstep with the oracle's identical promotion
    val n1 = col("n1"); val n = col("n")
    val n1d = col("n1").cast(DoubleType)
    val n2d = (col("n") - col("n1")).cast(DoubleType)
    val nd = col("n").cast(DoubleType)
    val u1 = col("r_on") - n1d * (n1d + 1) / 2.0
    val mu = n1d * n2d / 2.0
    val sd = sqrt(n1d * n2d / 12.0 *
      ((nd + 1) - col("tie_t").cast(DoubleType) / (nd * (nd - 1.0))))
    // nzc: an all-tied event_type has sd = 0 exactly (tie_t = n³−n) —
    // NULL z/p in both engines, not an ANSI divide error
    val z = (u1 - mu - signum(u1 - mu) * 0.5) / nzc(sd)
    agg.select(
      col("event_type"), n1.as("n_on"), (n - n1).as("n_off"),
      u1.as("u_stat"), r4(z).as("z"),
      r6(pTwoSidedNormal(z)).as("p_value"),
    ).orderBy("event_type")
  }

  private val mwuOracle = {
    // same promotions as the plan: counts to DOUBLE before any product
    // (Long n1·n2 wraps past ~3e9/arm), cnt³ in DECIMAL(38,0) (BIGINT
    // cnt³ errors in DuckDB at ≥2^21 duplicates), sd NULLIF-guarded
    val n1d = "CAST(n1 AS DOUBLE)"
    val n2d = "CAST(n - n1 AS DOUBLE)"
    val nd = "CAST(n AS DOUBLE)"
    val u1 = s"(r_on - $n1d * ($n1d + 1) / 2.0)"
    val mu = s"($n1d * $n2d / 2.0)"
    val sd = s"sqrt($n1d * $n2d / 12.0 * (($nd + 1) - CAST(tie_t AS DOUBLE) / ($nd * ($nd - 1.0))))"
    val z = s"(($u1 - $mu - sign($u1 - $mu) * 0.5) / NULLIF($sd, 0))"
    s"""WITH counts AS (
       |  SELECT event_type, "value" AS v, COUNT(*) AS cnt,
       |    SUM(CASE WHEN $onOffSql = 'On' THEN 1 ELSE 0 END) AS cnt_on
       |  FROM events GROUP BY 1, 2),
       |ranked AS (
       |  SELECT event_type, cnt, cnt_on,
       |    COALESCE(SUM(cnt) OVER (PARTITION BY event_type ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (cnt + 1) / 2.0 AS avg_rank
       |  FROM counts),
       |agg AS (
       |  SELECT event_type,
       |    SUM(avg_rank * cnt_on) AS r_on,
       |    CAST(SUM(cnt_on) AS BIGINT) AS n1,
       |    CAST(SUM(cnt) AS BIGINT) AS n,
       |    SUM(CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt) AS tie_t
       |  FROM ranked GROUP BY 1)
       |SELECT event_type, n1 AS n_on, n - n1 AS n_off,
       |  $u1 AS u_stat, (sign($z) * floor(abs($z) * 1e4 + 0.5) / 1e4) AS z,
       |  (sign(${pTwoSidedNormalSql(z)}) * floor(abs(${pTwoSidedNormalSql(z)}) * 1e6 + 0.5) / 1e6) AS p_value
       |FROM agg ORDER BY event_type""".stripMargin
  }

  /** Normal-approximation confidence intervals per group (the notebooks'
    * CI_per_country_and_city / weightstats usage). */
  def ciNormal(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    val m = Tables.events(spark, dir)
      .withColumn("g", onOff)
      .groupBy("event_type", "g")
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(d)).cast(DoubleType).as("s"),
        sum((col("value") * col("value")).cast(d)).cast(DoubleType).as("ss"),
      )
    val mean = col("s") / col("n")
    val sd = sqrt((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1))
    val half = lit(1.959963984540054) * sd / sqrt(col("n"))
    m.select(col("event_type"), col("g").as("grp"), col("n"),
      r4(mean).as("mean"), r4(sd).as("sd"),
      r4(mean - half).as("ci_lo"), r4(mean + half).as("ci_hi"))
      .orderBy("event_type", "grp")
  }

  private val ciNormalOracle = {
    val mean = "(s / n)"
    val sd = "sqrt((ss - s * s / n) / (n - 1))"
    val half = s"(1.959963984540054 * $sd / sqrt(n))"
    s"""WITH m AS (
       |  SELECT event_type, $onOffSql AS grp, COUNT(*) AS n,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) AS DOUBLE) AS s,
       |    CAST(SUM(CAST("value" * "value" AS DECIMAL(28,6))) AS DOUBLE) AS ss
       |  FROM events GROUP BY 1, 2)
       |SELECT event_type, grp, n, (sign($mean) * floor(abs($mean) * 1e4 + 0.5) / 1e4) AS mean, (sign($sd) * floor(abs($sd) * 1e4 + 0.5) / 1e4) AS sd,
       |  (sign($mean - $half) * floor(abs($mean - $half) * 1e4 + 0.5) / 1e4) AS ci_lo, (sign($mean + $half) * floor(abs($mean + $half) * 1e4 + 0.5) / 1e4) AS ci_hi
       |FROM m ORDER BY event_type, grp""".stripMargin
  }

  /** Exact linear-interpolation percentiles per group (np.percentile /
    * pd.quantile in the notebooks). */
  def quantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        r4(expr("percentile(value, 0.5)")).as("p50"),
        r4(expr("percentile(value, 0.9)")).as("p90"),
        r4(expr("percentile(value, 0.99)")).as("p99"),
      )
      .orderBy("event_type")

  private val quantilesOracle =
    """SELECT event_type, COUNT(*) AS n,
      |  (sign(quantile_cont("value", 0.5)) * floor(abs(quantile_cont("value", 0.5)) * 1e4 + 0.5) / 1e4) AS p50,
      |  (sign(quantile_cont("value", 0.9)) * floor(abs(quantile_cont("value", 0.9)) * 1e4 + 0.5) / 1e4) AS p90,
      |  (sign(quantile_cont("value", 0.99)) * floor(abs(quantile_cont("value", 0.99)) * 1e4 + 0.5) / 1e4) AS p99
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Post-hoc power of the two-sample z-test at α=0.05 per event_type
    * (the notebooks' statsmodels power analysis,
    * method_evaluation.ipynb): power = Φ(z_eff − z_crit) + Φ(−z_eff −
    * z_crit) with z_eff = |Δ|/se from the observed moments. */
  def powerZtest(spark: SparkSession, dir: String): DataFrame = {
    val m = onOffMoments(spark, dir)
    val v1 = (col("ss1") - col("s1") * col("s1") / nzc(col("n1"))) / nzc(col("n1") - 1)
    val v2 = (col("ss2") - col("s2") * col("s2") / nzc(col("n2"))) / nzc(col("n2") - 1)
    val se = sqrt(v1 / col("n1") + v2 / col("n2"))
    val zEff = abs(col("s1") / nzc(col("n1")) - col("s2") / nzc(col("n2"))) / nzc(se)
    val zCrit = lit(1.959963984540054)
    val power = normCdf(zEff - zCrit) + normCdf(-zEff - zCrit)
    m.select(col("event_type"), col("n1"), col("n2"),
      r4(zEff).as("z_effect"), r6(power).as("power"))
      .orderBy("event_type")
  }

  private val powerZtestOracle = {
    val v1 = "((ss1 - s1 * s1 / n1) / (n1 - 1))"
    val v2 = "((ss2 - s2 * s2 / n2) / (n2 - 1))"
    val se = s"sqrt($v1 / n1 + $v2 / n2)"
    val zEff = s"(abs(s1 / n1 - s2 / n2) / $se)"
    val power = s"(${normCdfSql(s"$zEff - 1.959963984540054")} + ${normCdfSql(s"-$zEff - 1.959963984540054")})"
    s"""WITH moments AS ($onOffMomentsSql)
       |SELECT event_type, n1, n2,
       |  ${rSql(zEff, 4)} AS z_effect, ${rSql(power, 6)} AS power
       |FROM moments ORDER BY event_type""".stripMargin
  }

  // ---- t-based power analysis (tt_ind_solve_power analog) -------------
  // The reference notebooks (switchback_analysis.ipynb,
  // method_evaluation.ipynb, deep_dive_analyses.ipynb) use statsmodels
  // TTestIndPower to (a) compute post-hoc power and (b) SOLVE for the
  // per-group n that detects a given MDE. Both below run on the exact
  // noncentral-t series in StatFunctions (one fold, same SQL text both
  // engines); only the final columns are rounded.

  private val spPooledSql =
    "sqrt((ss1 - s1*s1/n1 + ss2 - s2*s2/n2) / (n1 + n2 - 2))"

  /** Shared moments sub-plan: per event_type On/Off counts and
    * decimal-exact Σv, Σv² (same shape as the Welch moments). */
  private def onOffMoments(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    Tables.events(spark, dir)
      .withColumn("g", onOff)
      .groupBy("event_type")
      .agg(
        sum(when(col("g") === "On", 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") === "On", col("value").cast(d))).cast(DoubleType).as("s1"),
        sum(when(col("g") === "On", (col("value") * col("value")).cast(d))).cast(DoubleType).as("ss1"),
        sum(when(col("g") === "Off", 1L).otherwise(0L)).as("n2"),
        sum(when(col("g") === "Off", col("value").cast(d))).cast(DoubleType).as("s2"),
        sum(when(col("g") === "Off", (col("value") * col("value")).cast(d))).cast(DoubleType).as("ss2"),
      )
  }

  // lazy: referenced by oracle vals declared ABOVE this point (object
  // vals initialize in declaration order; a strict val would read null)
  private lazy val onOffMomentsSql =
    s"""SELECT event_type,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'On') AS n1,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'On') AS DOUBLE) AS s1,
       |    CAST(SUM(CAST("value" * "value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'On') AS DOUBLE) AS ss1,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'Off') AS n2,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'Off') AS DOUBLE) AS s2,
       |    CAST(SUM(CAST("value" * "value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'Off') AS DOUBLE) AS ss2
       |  FROM events GROUP BY 1""".stripMargin

  /** Post-hoc power of the pooled two-sample t-test at α=0.05 per
    * event_type, from the observed Cohen's d — EXACT noncentral-t
    * (statsmodels TTestIndPower().power), not a normal approximation. */
  def powerTtest(spark: SparkSession, dir: String): DataFrame = {
    val dRaw = s"(abs(s1/n1 - s2/n2) / $spPooledSql)"
    onOffMoments(spark, dir)
      .withColumn("d_raw", expr(dRaw))
      .select(col("event_type"), col("n1"), col("n2"),
        r6(col("d_raw")).as("cohen_d"),
        r6(expr(powerTTestSql("d_raw", "n1", "n2", spark = true))).as("power_t"))
      .orderBy("event_type")
  }

  private val powerTtestOracle = {
    val dRaw = s"(abs(s1/n1 - s2/n2) / $spPooledSql)"
    s"""WITH moments AS ($onOffMomentsSql),
       |stats AS (SELECT *, $dRaw AS d_raw FROM moments)
       |SELECT event_type, n1, n2,
       |  ${rSql("d_raw", 6)} AS cohen_d,
       |  ${rSql(powerTTestSql("d_raw", "n1", "n2", spark = false), 6)} AS power_t
       |FROM stats ORDER BY event_type""".stripMargin
  }

  /** Solve for the per-group n that detects a 2%-of-mean lift at
    * α=0.05 with power 0.8 (the notebooks' tt_ind_solve_power(...,
    * nobs1=None)): z-based closed-form seed → 8 classical t-quantile
    * refinements → 2 finite-difference Newton steps on the EXACT
    * noncentral-t power. Matches statsmodels' solve to ≤1e-4 in n
    * (PowerSpec pins reference values). Also reports the achieved
    * power at the rounded-up n. */
  def solveN(spark: SparkSession, dir: String): DataFrame = {
    val dMde = s"(0.02 * abs((s1 + s2) / (n1 + n2)) / $spPooledSql)"
    def newton(n: String, pa: String, pah: String): String =
      s"(CASE WHEN abs($pah - $pa) < 1e-12 THEN $n ELSE $n - ($pa - 0.8) * ($n * 0.001) / ($pah - $pa) END)"
    onOffMoments(spark, dir)
      .withColumn("d_mde_raw", expr(dMde))
      .withColumn("n_seed_raw", expr(solveNSeedSql("d_mde_raw", spark = true)))
      .withColumn("p_a_raw", expr(powerTTestSql("d_mde_raw", "n_seed_raw", "n_seed_raw", spark = true)))
      .withColumn("p_ah_raw", expr(powerTTestSql("d_mde_raw", "(n_seed_raw * 1.001)", "(n_seed_raw * 1.001)", spark = true)))
      .withColumn("n_mid_raw", expr(newton("n_seed_raw", "p_a_raw", "p_ah_raw")))
      .withColumn("p_b_raw", expr(powerTTestSql("d_mde_raw", "n_mid_raw", "n_mid_raw", spark = true)))
      .withColumn("p_bh_raw", expr(powerTTestSql("d_mde_raw", "(n_mid_raw * 1.001)", "(n_mid_raw * 1.001)", spark = true)))
      .withColumn("n_req_raw", expr(newton("n_mid_raw", "p_b_raw", "p_bh_raw")))
      .withColumn("n_ceil", expr("CAST(ceil(n_req_raw) AS BIGINT)"))
      .select(col("event_type"), col("n1"), col("n2"),
        r6(col("d_mde_raw")).as("mde_d"),
        r4(col("n_req_raw")).as("n_per_group"),
        col("n_ceil"),
        r6(expr(powerTTestSql("d_mde_raw", "n_ceil", "n_ceil", spark = true))).as("power_at_n"))
      .orderBy("event_type")
  }

  private val solveNOracle = {
    val dMde = s"(0.02 * abs((s1 + s2) / (n1 + n2)) / $spPooledSql)"
    def newton(n: String, pa: String, pah: String): String =
      s"(CASE WHEN abs($pah - $pa) < 1e-12 THEN $n ELSE $n - ($pa - 0.8) * ($n * 0.001) / ($pah - $pa) END)"
    s"""WITH moments AS ($onOffMomentsSql),
       |s1 AS (SELECT *, $dMde AS d_mde_raw FROM moments),
       |s2 AS (SELECT *, ${solveNSeedSql("d_mde_raw", spark = false)} AS n_seed_raw FROM s1),
       |s3 AS (SELECT *,
       |  ${powerTTestSql("d_mde_raw", "n_seed_raw", "n_seed_raw", spark = false)} AS p_a_raw,
       |  ${powerTTestSql("d_mde_raw", "(n_seed_raw * 1.001)", "(n_seed_raw * 1.001)", spark = false)} AS p_ah_raw
       |  FROM s2),
       |s4 AS (SELECT *, ${newton("n_seed_raw", "p_a_raw", "p_ah_raw")} AS n_mid_raw FROM s3),
       |s5 AS (SELECT *,
       |  ${powerTTestSql("d_mde_raw", "n_mid_raw", "n_mid_raw", spark = false)} AS p_b_raw,
       |  ${powerTTestSql("d_mde_raw", "(n_mid_raw * 1.001)", "(n_mid_raw * 1.001)", spark = false)} AS p_bh_raw
       |  FROM s4),
       |s6 AS (SELECT *, ${newton("n_mid_raw", "p_b_raw", "p_bh_raw")} AS n_req_raw FROM s5),
       |s7 AS (SELECT *, CAST(ceil(n_req_raw) AS BIGINT) AS n_ceil FROM s6)
       |SELECT event_type, n1, n2,
       |  ${rSql("d_mde_raw", 6)} AS mde_d,
       |  ${rSql("n_req_raw", 4)} AS n_per_group,
       |  n_ceil,
       |  ${rSql(powerTTestSql("d_mde_raw", "n_ceil", "n_ceil", spark = false), 6)} AS power_at_n
       |FROM s7 ORDER BY event_type""".stripMargin
  }

  /** A/A sanity test (data_extraction_queries_aa_tests_ph_and_th.sql):
    * a null split by event_id parity must NOT differentiate — Welch t
    * per event_type on a treatment-free partition. */
  def aaTest(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    val m = Tables.events(spark, dir)
      .withColumn("g", when(col("event_id") % 2 === 0, "A1").otherwise("A2"))
      .groupBy("event_type")
      .agg(
        sum(when(col("g") === "A1", 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") === "A1", col("value").cast(d))).cast(DoubleType).as("s1"),
        sum(when(col("g") === "A1", (col("value") * col("value")).cast(d))).cast(DoubleType).as("ss1"),
        sum(when(col("g") === "A2", 1L).otherwise(0L)).as("n2"),
        sum(when(col("g") === "A2", col("value").cast(d))).cast(DoubleType).as("s2"),
        sum(when(col("g") === "A2", (col("value") * col("value")).cast(d))).cast(DoubleType).as("ss2"),
      )
    val v1 = (col("ss1") - col("s1") * col("s1") / nzc(col("n1"))) / nzc(col("n1") - 1)
    val v2 = (col("ss2") - col("s2") * col("s2") / nzc(col("n2"))) / nzc(col("n2") - 1)
    val se2 = v1 / col("n1") + v2 / col("n2")
    val t = (col("s1") / nzc(col("n1")) - col("s2") / nzc(col("n2"))) / nzc(sqrt(se2))
    val df = se2 * se2 / nzc((v1 / col("n1")) * (v1 / col("n1")) / nzc(col("n1") - 1) +
      (v2 / col("n2")) * (v2 / col("n2")) / nzc(col("n2") - 1))
    m.select(col("event_type"), col("n1"), col("n2"),
      t.as("t_raw"), df.as("df_raw"))
      .select(col("event_type"), col("n1"), col("n2"),
        r4(col("t_raw")).as("t_stat"),
        r6(pTwoSidedNormal(col("t_raw"))).as("p_normal"),
        r6(expr(pTwoSidedTSql("t_raw", "df_raw", spark = true))).as("p_t"))
      .orderBy("event_type")
  }

  private val aaTestOracle = {
    val g = "CASE WHEN event_id % 2 = 0 THEN 'A1' ELSE 'A2' END"
    val v1 = "((ss1 - s1 * s1 / n1) / (n1 - 1))"
    val v2 = "((ss2 - s2 * s2 / n2) / (n2 - 1))"
    val se2 = s"($v1 / n1 + $v2 / n2)"
    val t = s"((s1 / n1 - s2 / n2) / sqrt($se2))"
    val df = s"($se2 * $se2 / (($v1/n1)*($v1/n1)/(n1-1) + ($v2/n2)*($v2/n2)/(n2-1)))"
    s"""WITH moments AS (
       |  SELECT event_type,
       |    COUNT(*) FILTER (WHERE $g = 'A1') AS n1,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE $g = 'A1') AS DOUBLE) AS s1,
       |    CAST(SUM(CAST("value" * "value" AS DECIMAL(28,6))) FILTER (WHERE $g = 'A1') AS DOUBLE) AS ss1,
       |    COUNT(*) FILTER (WHERE $g = 'A2') AS n2,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE $g = 'A2') AS DOUBLE) AS s2,
       |    CAST(SUM(CAST("value" * "value" AS DECIMAL(28,6))) FILTER (WHERE $g = 'A2') AS DOUBLE) AS ss2
       |  FROM events GROUP BY 1),
       |stats AS (
       |  SELECT event_type, n1, n2, $t AS t_raw, $df AS df_raw FROM moments)
       |SELECT event_type, n1, n2,
       |  ${rSql("t_raw", 4)} AS t_stat, ${rSql(pTwoSidedNormalSql("t_raw"), 6)} AS p_normal,
       |  ${rSql(pTwoSidedTSql("t_raw", "df_raw", spark = false), 6)} AS p_t
       |FROM stats ORDER BY event_type""".stripMargin
  }

  /** Poisson(1) inverse-CDF thresholds scaled to the LCG's 2^31 state
    * space: state < floor(CDF(k)·2^31) ⇔ u < CDF(k), all-integer. */
  private val poissonThresholds: Seq[Long] =
    Seq(790015084L, 1580030168L, 1975037710L, 2106706891L, 2139624186L, 2146207645L)

  /** Bootstrap confidence interval for the per-group mean via POISSON
    * bootstrap (the notebooks bootstrap in pandas; at scale you cannot
    * index-resample, so each row contributes Poisson(1) weight per
    * replicate — the standard streaming/distributed bootstrap). Weights
    * derive from the same two-round portable LCG as q_permutation
    * (pure 63-bit-safe integer arithmetic, IDENTICAL text in both
    * engines) through an all-integer Poisson(1) inverse-CDF threshold
    * table — so unlike the earlier murmur3 formulation the whole
    * procedure is ORACLE-backed. Replicate means are r6-rounded then
    * averaged in exact DECIMAL (order-invariant). */
  def bootstrapCi(spark: SparkSession, dir: String, replicates: Int = 50): DataFrame = {
    val d = DecimalType(28, 6)
    val w = bootstrapWeightSql _
    // All B replicates in ONE aggregation pass: 2B weighted partial
    // sums per group (map-side combined), instead of explode()ing every
    // row B times — shuffle input stays |events|, not B·|events|.
    val sums = (0 until replicates).flatMap { b =>
      Seq(sum((expr(w(b)) * col("value")).cast(d)).cast(DoubleType).as(s"swv_$b"),
        sum(expr(w(b)).cast(LongType)).as(s"sw_$b"))
    }
    val wide = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"))
      .groupBy("event_type")
      .agg(sums.head, sums.tail: _*)
    // replicate means as an array → explode B rows per group (tiny);
    // r6-round each mean so downstream stats are order- and
    // engine-exact on the 6-decimal grid
    val repMeans = wide.select(col("event_type"), explode(array(
      (0 until replicates).map(b => r6(col(s"swv_$b") / col(s"sw_$b"))): _*)).as("rep_mean"))
    repMeans.groupBy("event_type")
      .agg(
        count(lit(1)).as("n_replicates"),
        r4(sum(col("rep_mean").cast(d)).cast(DoubleType) / count(lit(1))).as("boot_mean"),
        r4(expr("percentile(rep_mean, 0.025)")).as("ci_lo"),
        r4(expr("percentile(rep_mean, 0.975)")).as("ci_hi"),
      )
      .orderBy("event_type")
  }

  /** Two-round portable LCG state on (event_id, replicate b) — the ONE
    * kernel every replicate weight/flip in this file derives from
    * (bootstrap weights, permutation flips, FPR flips); a single
    * definition so the plan/oracle texts can never drift. The
    * replicate offset folds into one literal at generation time:
    * 12345 + b·1013904223 can exceed INT32, and a `b * c` subterm
    * would be INT×INT → ANSI overflow in Spark. */
  private def lcgStateSql(b: Int): String =
    s"(((((event_id % 2147483648) * 1103515245 + ${12345L + b.toLong * 1013904223L}) % 2147483648)" +
      s" * 1103515245 + 12345) % 2147483648)"

  /** Fair coin from [[lcgStateSql]]: state below 2³⁰ (half the range). */
  private def lcgFlipSql(b: Int): String = s"(${lcgStateSql(b)} < 1073741824)"

  /** Replicate-b Poisson weight as SQL text shared verbatim by both
    * engines: two LCG rounds on (event_id, b), then the integer
    * threshold ladder. */
  private def bootstrapWeightSql(b: Int): String = {
    val st = lcgStateSql(b)
    val whens = poissonThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN $st < $t THEN $k" }.mkString(" ")
    s"(CASE $whens ELSE 6 END)"
  }

  private def bootstrapCiOracle(replicates: Int = 50): String = {
    val repAggs = (0 until replicates).map { b =>
      val w = bootstrapWeightSql(b)
      s"""    CAST(SUM(CAST($w * "value" AS DECIMAL(28,6))) AS DOUBLE) AS swv_$b,
         |    CAST(SUM($w) AS BIGINT) AS sw_$b""".stripMargin
    }.mkString(",\n")
    val means = (0 until replicates)
      .map(b => rSql(s"(swv_$b / sw_$b)", 6)).mkString(", ")
    s"""WITH wide AS (
       |  SELECT event_type,
       |$repAggs
       |  FROM events GROUP BY 1),
       |rep AS (SELECT event_type, unnest([$means]) AS rep_mean FROM wide)
       |SELECT event_type, COUNT(*) AS n_replicates,
       |  ${rSql("(CAST(SUM(CAST(rep_mean AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))", 4)} AS boot_mean,
       |  ${rSql("quantile_cont(rep_mean, 0.025)", 4)} AS ci_lo,
       |  ${rSql("quantile_cont(rep_mean, 0.975)", 4)} AS ci_hi
       |FROM rep GROUP BY 1 ORDER BY event_type""".stripMargin
  }

  /** Permutation (randomization) test for the On/Off mean difference per
    * event_type — the reference evaluates its switchback method by
    * RE-RANDOMIZING assignments and recomputing the statistic
    * (mwu_randomization_temp.ipynb's np.random shuffles,
    * random_choice_of_zones_question.ipynb's re-drawn zone choices,
    * method_evaluation.ipynb's simulation loops). Each of the R=64
    * pseudo-permutations relabels every row via TWO rounds of a 31-bit
    * LCG on (event_id, replicate) — pure 63-bit-safe integer arithmetic
    * with IDENTICAL text in Spark and DuckDB (unlike murmur3), so the
    * whole procedure is oracle-backed. Two rounds matter: a single
    * round is linear in the replicate index, so consecutive replicates
    * would shift the state by a constant and almost never flip the
    * label; the second multiply turns that shift into a full-range one.
    *
    * Scale: all R replicate statistics accumulate in ONE aggregation
    * pass — per replicate just two more partial sums (n, Σx as exact
    * decimal) per group, map-side combined; shuffle input stays
    * |events|, not R·|events|. The empirical p uses the add-one
    * estimator p = (1 + #{|d_r| ≥ |d_obs|}) / (R + 1), so p ∈ (0, 1]
    * and the test is exact-level under the randomization null. */
  def permutationTest(spark: SparkSession, dir: String, replicates: Int = 64): DataFrame = {
    val dec = DecimalType(28, 6)
    def lcgOn(b: Int): String = lcgFlipSql(b) // identical text both engines
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n_tot"),
        sum(col("value").cast(dec)).cast(DoubleType).as("s_tot"),
        sum(when(onOff === "On", 1L).otherwise(0L)).as("n1_obs"),
        sum(when(onOff === "On", col("value").cast(dec))).cast(DoubleType).as("s1_obs")) ++
      (0 until replicates).flatMap { b =>
        val on = expr(lcgOn(b))
        Seq(sum(when(on, 1L).otherwise(0L)).as(s"n1_$b"),
          sum(when(on, col("value").cast(dec))).cast(DoubleType).as(s"s1_$b"))
      }
    def dSql(n1: String, s1: String): String =
      s"($s1 / $n1 - (s_tot - $s1) / (n_tot - $n1))"
    val exceed = (0 until replicates)
      .map(b => s"(CASE WHEN abs(${dSql(s"n1_$b", s"s1_$b")}) >= abs(d_obs_raw) THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("d_obs_raw", expr(dSql("n1_obs", "s1_obs")))
      .select(col("event_type"),
        col("n1_obs").as("n_on"), (col("n_tot") - col("n1_obs")).as("n_off"),
        r6(col("d_obs_raw")).as("d_obs"),
        r6(expr(s"CAST(1 + $exceed AS DOUBLE) / ${replicates + 1}")).as("p_perm"))
      .orderBy("event_type")
  }

  private def permutationOracle(replicates: Int = 64): String = {
    def lcgOn(b: Int): String = lcgFlipSql(b)
    val repAggs = (0 until replicates).map { b =>
      s"""    COUNT(*) FILTER (WHERE ${lcgOn(b)}) AS n1_$b,
         |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE ${lcgOn(b)}) AS DOUBLE) AS s1_$b""".stripMargin
    }.mkString(",\n")
    def dSql(n1: String, s1: String): String =
      s"($s1 / $n1 - (s_tot - $s1) / (n_tot - $n1))"
    val exceed = (0 until replicates)
      .map(b => s"(CASE WHEN abs(${dSql(s"n1_$b", s"s1_$b")}) >= abs(d_obs_raw) THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")
    s"""WITH wide AS (
       |  SELECT event_type,
       |    COUNT(*) AS n_tot,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) AS DOUBLE) AS s_tot,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'On') AS n1_obs,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'On') AS DOUBLE) AS s1_obs,
       |$repAggs
       |  FROM events GROUP BY 1),
       |obs AS (SELECT *, ${dSql("n1_obs", "s1_obs")} AS d_obs_raw FROM wide)
       |SELECT event_type, n1_obs AS n_on, n_tot - n1_obs AS n_off,
       |  ${rSql("d_obs_raw", 6)} AS d_obs,
       |  ${rSql(s"CAST(1 + $exceed AS DOUBLE) / ${replicates + 1}", 6)} AS p_perm
       |FROM obs ORDER BY event_type""".stripMargin
  }

  /** Winsorized group means beside raw — the notebooks' recurring
    * "have you filtered outliers?" checklist item
    * (switchback_analysis.ipynb, switchback_analysis_delivery_time
    * .ipynb) as a first-class readout: clip `value` at the per-group
    * [p01, p99] before averaging, report both means and how many rows
    * were clipped.
    *
    * Determinism: clipped values cast to exact DECIMAL before summing,
    * and the clip bounds are r6-PINNED before any comparison (the
    * propTest quantile-cutoff discipline: Spark `percentile` and
    * DuckDB `quantile_cont` can differ by 1 ulp, and an unrounded
    * hard cutoff would flip the integer clip counts across engines).
    * Scale: one quantile pass + one broadcast join + one aggregation;
    * the fact table is never sorted globally. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(28, 6)
    val q = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(r6(expr("percentile(value, 0.01)")).as("lo"),
        r6(expr("percentile(value, 0.99)")).as("hi"))
    Tables.events(spark, dir).join(broadcast(q), Seq("event_type"))
      .withColumn("vw", least(greatest(col("value"), col("lo")), col("hi")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("lo") || col("value") > col("hi"), 1L)
          .otherwise(0L)).as("n_clipped"),
        r4((sum(col("value").cast(dec)).cast(DoubleType) / count(lit(1)))).as("mean_raw"),
        r4((sum(col("vw").cast(dec)).cast(DoubleType) / count(lit(1)))).as("mean_winsor"),
        r4(first("lo")).as("p01"), r4(first("hi")).as("p99"))
      .orderBy("event_type")
  }

  private val winsorizeOracle =
    s"""WITH q AS (
       |  SELECT event_type, ${rSql("quantile_cont(\"value\", 0.01)", 6)} AS lo,
       |    ${rSql("quantile_cont(\"value\", 0.99)", 6)} AS hi
       |  FROM events GROUP BY 1)
       |SELECT e.event_type, COUNT(*) AS n,
       |  CAST(SUM(CASE WHEN e."value" < q.lo OR e."value" > q.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
       |  ${rSql("CAST(SUM(CAST(e.\"value\" AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)", 4)} AS mean_raw,
       |  ${rSql("CAST(SUM(CAST(LEAST(GREATEST(e.\"value\", q.lo), q.hi) AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)", 4)} AS mean_winsor,
       |  ${rSql("MIN(q.lo)", 4)} AS p01, ${rSql("MIN(q.hi)", 4)} AS p99
       |FROM events e JOIN q ON e.event_type = q.event_type
       |GROUP BY 1 ORDER BY e.event_type""".stripMargin

  /** Cluster-robust ratio-metric readout: the notebooks analyze
    * per-order KPIs, but orders cluster within users — treating rows
    * as independent understates the variance. Per (event_type, group):
    * R = Σx_u / Σy_u over per-USER sums (x = value, y = row count),
    * with the delta-method variance of a ratio of cluster sums
    *   var(R) ≈ (var(x) + R²·var(y) − 2R·cov(x,y)) / (n·ȳ²)
    * and a normal 95% CI. The standard ratio-metric estimator for
    * experiment platforms (Deng et al., KDD'18 delta-method lineage).
    *
    * Scale: one user-level aggregation (shuffle on user_id ~ cluster
    * count), then a group-level aggregation over |users| rows; all
    * moments decimal-exact, cuped-style. */
  def ratioDelta(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(28, 6); val d12 = DecimalType(30, 12)
    val perUser = Tables.events(spark, dir)
      .withColumn("grp", onOff)
      .groupBy("event_type", "grp", "user_id")
      .agg(sum(col("value").cast(d6)).cast(DoubleType).as("x"),
        count(lit(1)).cast(DoubleType).as("y"))
    val m = perUser.groupBy("event_type", "grp")
      .agg(count(lit(1)).as("n_users"),
        sum(col("x").cast(d6)).cast(DoubleType).as("sx"),
        sum(col("y").cast(d6)).cast(DoubleType).as("sy"),
        sum((col("x") * col("x")).cast(d12)).cast(DoubleType).as("sxx"),
        sum((col("y") * col("y")).cast(d12)).cast(DoubleType).as("syy"),
        sum((col("x") * col("y")).cast(d12)).cast(DoubleType).as("sxy"))
    val n = col("n_users")
    val r = col("sx") / nzc(col("sy"))
    val my = col("sy") / n
    val vx = (col("sxx") - col("sx") * col("sx") / n) / nzc(n - 1)
    val vy = (col("syy") - col("sy") * col("sy") / n) / nzc(n - 1)
    val cxy = (col("sxy") - col("sx") * col("sy") / n) / nzc(n - 1)
    val vr = (vx + r * r * vy - lit(2.0) * r * cxy) / nzc(n * my * my)
    m.select(col("event_type"), col("grp"), col("n_users"),
      r.as("ratio_raw"), sqrt(vr).as("se_raw"))
      .select(col("event_type"), col("grp"), col("n_users"),
        r6(col("ratio_raw")).as("ratio"),
        r6(col("se_raw")).as("se"),
        r6(col("ratio_raw") - lit(1.959963984540054) * col("se_raw")).as("ci_lo"),
        r6(col("ratio_raw") + lit(1.959963984540054) * col("se_raw")).as("ci_hi"))
      .orderBy("event_type", "grp")
  }

  private val ratioDeltaOracle = {
    val r = "(sx / sy)"; val my = "(sy / n_users)"
    val vx = "((sxx - sx * sx / n_users) / (n_users - 1))"
    val vy = "((syy - sy * sy / n_users) / (n_users - 1))"
    val cxy = "((sxy - sx * sy / n_users) / (n_users - 1))"
    val vr = s"(($vx + $r * $r * $vy - 2.0 * $r * $cxy) / (n_users * $my * $my))"
    s"""WITH per_user AS (
       |  SELECT event_type, $onOffSql AS grp, user_id,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) AS DOUBLE) AS x,
       |    CAST(COUNT(*) AS DOUBLE) AS y
       |  FROM events GROUP BY 1, 2, 3),
       |m AS (
       |  SELECT event_type, grp, COUNT(*) AS n_users,
       |    CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(x * x AS DECIMAL(30,12))) AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(y * y AS DECIMAL(30,12))) AS DOUBLE) AS syy,
       |    CAST(SUM(CAST(x * y AS DECIMAL(30,12))) AS DOUBLE) AS sxy
       |  FROM per_user GROUP BY 1, 2),
       |s AS (SELECT event_type, grp, n_users, $r AS ratio_raw, sqrt($vr) AS se_raw FROM m)
       |SELECT event_type, grp, n_users,
       |  ${rSql("ratio_raw", 6)} AS ratio,
       |  ${rSql("se_raw", 6)} AS se,
       |  ${rSql("ratio_raw - 1.959963984540054 * se_raw", 6)} AS ci_lo,
       |  ${rSql("ratio_raw + 1.959963984540054 * se_raw", 6)} AS ci_hi
       |FROM s ORDER BY event_type, grp""".stripMargin
  }

  /** Always-valid sequential inference — the mixture SPRT (mSPRT,
    * Robbins 1970; the "always-valid p-value" construction behind
    * modern experiment platforms' continuous monitoring). The
    * reference's notebooks slice results repeatedly while tests run
    * (deep_dive_analyses.ipynb re-reads live tests; README's
    * monitoring loop) — a fixed-horizon p peeked at daily inflates
    * false positives, so this operator reports the anytime-valid
    * alternative: per (event_type, day), the running On/Off mean
    * difference, the normal-mixture log likelihood-ratio
    *   ln Λ_t = ½·ln(se²/(se²+τ²)) + τ²·Δ̄²/(2·se²·(se²+τ²))
    * with se² = σ̂²·(1/n₁+1/n₂) from cumulative moments and the
    * unit-information prior τ² = σ̂², and p_avp = running min over
    * days of min(1, 1/Λ) — valid at EVERY peek.
    *
    * Determinism: cumulative moments are window sums of exact
    * DECIMALs; ln Λ is computed in log space (no exp overflow at
    * strong effects); exp underflow to 0 is IEEE-identical in both
    * engines. Scale: one aggregation to |event_type|·|days| rows,
    * then windows over that tiny table. */
  def msprt(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(28, 6)
    val m = Tables.events(spark, dir)
      .withColumn("g", onOff)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(
        sum(when(col("g") === "On", 1L).otherwise(0L)).as("dn1"),
        sum(when(col("g") === "On", col("value").cast(dec))).as("ds1"),
        sum(when(col("g") === "On", (col("value") * col("value")).cast(dec))).as("dss1"),
        sum(when(col("g") === "Off", 1L).otherwise(0L)).as("dn2"),
        sum(when(col("g") === "Off", col("value").cast(dec))).as("ds2"),
        sum(when(col("g") === "Off", (col("value") * col("value")).cast(dec))).as("dss2"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = m.select(col("event_type"), col("day"),
      sum("dn1").over(w).as("n1"), sum("ds1").over(w).cast(DoubleType).as("s1"),
      sum("dss1").over(w).cast(DoubleType).as("ss1"),
      sum("dn2").over(w).as("n2"), sum("ds2").over(w).cast(DoubleType).as("s2"),
      sum("dss2").over(w).cast(DoubleType).as("ss2"))
      .filter(col("n1") > 1 && col("n2") > 1)
    val delta = col("s1") / col("n1") - col("s2") / col("n2")
    val sig2 = ((col("ss1") - col("s1") * col("s1") / col("n1")) +
      (col("ss2") - col("s2") * col("s2") / col("n2"))) / (col("n1") + col("n2") - 2)
    val se2 = sig2 * (lit(1.0) / col("n1") + lit(1.0) / col("n2"))
    // r6-round each logLambda addend THEN sum in exact DECIMAL (the
    // q_ngram_lm discipline): a 1-ulp engine divergence inside either
    // transcendental chain can no longer flip the final half-way
    // rounding, and p_seq derives from the ROUNDED log-lambda so both
    // engines exponentiate the identical double.
    val llTerm1 = lit(0.5) * log(se2 / (se2 + sig2))
    val llTerm2 = sig2 * delta * delta / (lit(2.0) * se2 * (se2 + sig2))
    val llDec = DecimalType(28, 6)
    val logLambda = (r6(llTerm1).cast(llDec) + r6(llTerm2).cast(llDec))
      .cast(DoubleType)
    cum.select(col("event_type"), col("day"), col("n1"), col("n2"),
      r6(delta).as("delta"), r4(logLambda).as("log_lambda"),
      r6(least(lit(1.0), exp(-logLambda))).as("p_seq"))
      // p_avp runs over the SAME cumulative frame `w` as the moments —
      // one WindowSpec, one sort
      .withColumn("p_avp", min(col("p_seq")).over(w))
      .orderBy("event_type", "day")
  }

  private val msprtOracle = {
    val delta = "(s1 / n1 - s2 / n2)"
    val sig2 = "(((ss1 - s1 * s1 / n1) + (ss2 - s2 * s2 / n2)) / (n1 + n2 - 2))"
    val se2 = s"($sig2 * (1.0 / n1 + 1.0 / n2))"
    val llTerm1 = s"(0.5 * ln($se2 / ($se2 + $sig2)))"
    val llTerm2 = s"($sig2 * $delta * $delta / (2.0 * $se2 * ($se2 + $sig2)))"
    // r6-round each addend then sum in exact DECIMAL — mirrors the
    // Spark side so the rounded log-lambda is the identical double.
    val logLambda = s"CAST(CAST(${rSql(llTerm1, 6)} AS DECIMAL(28,6)) + " +
      s"CAST(${rSql(llTerm2, 6)} AS DECIMAL(28,6)) AS DOUBLE)"
    s"""WITH daily AS (
       |  SELECT event_type, date_trunc('day', ts) AS day,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'On') AS dn1,
       |    SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'On') AS ds1,
       |    SUM(CAST("value" * "value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'On') AS dss1,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'Off') AS dn2,
       |    SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'Off') AS ds2,
       |    SUM(CAST("value" * "value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'Off') AS dss2
       |  FROM events GROUP BY 1, 2),
       |cum AS (
       |  SELECT event_type, day,
       |    CAST(SUM(dn1) OVER win AS BIGINT) AS n1, CAST(SUM(ds1) OVER win AS DOUBLE) AS s1,
       |    CAST(SUM(dss1) OVER win AS DOUBLE) AS ss1,
       |    CAST(SUM(dn2) OVER win AS BIGINT) AS n2, CAST(SUM(ds2) OVER win AS DOUBLE) AS s2,
       |    CAST(SUM(dss2) OVER win AS DOUBLE) AS ss2
       |  FROM daily
       |  WINDOW win AS (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |scored AS (
       |  SELECT event_type, day, n1, n2,
       |    ${rSql(delta, 6)} AS delta,
       |    ${rSql(logLambda, 4)} AS log_lambda,
       |    ${rSql(s"LEAST(1.0, exp(-($logLambda)))", 6)} AS p_seq
       |  FROM cum WHERE n1 > 1 AND n2 > 1)
       |SELECT event_type, day, n1, n2, delta, log_lambda, p_seq,
       |  MIN(p_seq) OVER (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_avp
       |FROM scored ORDER BY event_type, day""".stripMargin
  }

  /** Method-evaluation FPR harness — method_evaluation.ipynb's core
    * loop: re-randomize assignment under the NULL many times, run the
    * test each time, and check the false-positive rate sits at the
    * nominal 5% (the notebooks' evidence that naive per-order tests
    * are or aren't valid on switchback data). R=48 LCG relabelings
    * (portable integer arithmetic, like q_permutation), each scored
    * with the pooled two-sample t at the z critical value; everything
    * folds into ONE aggregation pass: per replicate only (n₁, Σv) vary
    * — Σv² is assignment-independent, so the pooled variance needs no
    * per-replicate squared sums. */
  def fprEval(spark: SparkSession, dir: String, replicates: Int = 48): DataFrame = {
    val dec = DecimalType(28, 6)
    def lcgOn(b: Int): String = lcgFlipSql(b) // identical text both engines
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n_tot"),
        sum(col("value").cast(dec)).cast(DoubleType).as("s_tot"),
        sum((col("value") * col("value")).cast(dec)).cast(DoubleType).as("ss_tot")) ++
      (0 until replicates).flatMap { b =>
        val on = expr(lcgOn(b))
        Seq(sum(when(on, 1L).otherwise(0L)).as(s"n1_$b"),
          sum(when(on, col("value").cast(dec))).cast(DoubleType).as(s"s1_$b"))
      }
    def tAbsSql(n1: String, s1: String): String = {
      val n0 = s"(n_tot - $n1)"; val s0 = s"(s_tot - $s1)"
      val d = s"($s1 / $n1 - $s0 / $n0)"
      val sp2 = s"((ss_tot - $s1 * $s1 / $n1 - $s0 * $s0 / $n0) / (n_tot - 2))"
      s"abs($d / sqrt($sp2 * (1.0 / $n1 + 1.0 / $n0)))"
    }
    val rejects = (0 until replicates)
      .map(b => s"(CASE WHEN ${tAbsSql(s"n1_$b", s"s1_$b")} > 1.959963984540054 THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("event_type"), col("n_tot"),
        lit(replicates).cast("long").as("n_reps"),
        expr(s"CAST($rejects AS BIGINT)").as("n_reject"),
        r6(expr(s"CAST($rejects AS DOUBLE) / $replicates")).as("fpr"))
      .orderBy("event_type")
  }

  private def fprEvalOracle(replicates: Int = 48): String = {
    def lcgOn(b: Int): String = lcgFlipSql(b)
    val repAggs = (0 until replicates).map { b =>
      s"""    COUNT(*) FILTER (WHERE ${lcgOn(b)}) AS n1_$b,
         |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE ${lcgOn(b)}) AS DOUBLE) AS s1_$b""".stripMargin
    }.mkString(",\n")
    def tAbsSql(n1: String, s1: String): String = {
      val n0 = s"(n_tot - $n1)"; val s0 = s"(s_tot - $s1)"
      val d = s"($s1 / $n1 - $s0 / $n0)"
      val sp2 = s"((ss_tot - $s1 * $s1 / $n1 - $s0 * $s0 / $n0) / (n_tot - 2))"
      s"abs($d / sqrt($sp2 * (1.0 / $n1 + 1.0 / $n0)))"
    }
    val rejects = (0 until replicates)
      .map(b => s"(CASE WHEN ${tAbsSql(s"n1_$b", s"s1_$b")} > 1.959963984540054 THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")
    s"""WITH m AS (
       |  SELECT event_type, COUNT(*) AS n_tot,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) AS DOUBLE) AS s_tot,
       |    CAST(SUM(CAST("value" * "value" AS DECIMAL(28,6))) AS DOUBLE) AS ss_tot,
       |$repAggs
       |  FROM events GROUP BY 1)
       |SELECT event_type, n_tot, CAST($replicates AS BIGINT) AS n_reps,
       |  CAST($rejects AS BIGINT) AS n_reject,
       |  ${rSql(s"CAST($rejects AS DOUBLE) / $replicates", 6)} AS fpr
       |FROM m ORDER BY event_type""".stripMargin
  }

  /** Cluster-robust standard errors (CRSE) — THE readout method of the
    * reference's switchback notebooks: `smf.ols('KPI ~ group_binary')
    * .fit(cov_type="cluster", cov_kwds={'groups': time_unit})` appears
    * in 8 notebooks (counterpart_method.ipynb CRSE_CI,
    * switchback_analysis_*.ipynb CRSE_significance, …). Orders inside
    * one switchback time unit share shocks, so the OLS slope's SE must
    * cluster on the randomization unit.
    *
    * For a binary regressor OLS is closed-form: β₁ = ȳ₁ − ȳ₀,
    * β₀ = ȳ₀; the Liang–Zeger sandwich needs only per-cluster score
    * sums u_g = Σ_{i∈g} e_i·[1, d_i]:
    *   Var(β̂₁) = c · (N₁²·M₁₁ − 2·N₁·N·M₁₂ + N²·M₂₂) / det²,
    * det = N₁·N₀, M = Σ_g u_g u_gᵀ, with statsmodels' small-sample
    * correction c = G/(G−1) · (N−1)/(N−2) and df = G−1 for the t.
    *
    * Determinism: per-cluster moments are exact DECIMAL sums; the
    * cluster score sums are derived ALGEBRAICALLY from them
    * (su_g = S_g − n_{g1}·m̄₁ − n_{g0}·m̄₀ — no float accumulation over
    * rows); the meat sums round each cluster's product to
    * DECIMAL(30,12) per row, then sum exactly (order-invariant).
    * Scale: rows → clusters is one map-side-combinable aggregation;
    * everything after runs on |event_type|·|clusters| rows. */
  def crse(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(28, 6); val d12 = DecimalType(30, 12)
    val cluster = expr("unix_micros(date_trunc('hour', ts)) div 3600000000") * 10 +
      col("user_id") % 10
    val g = Tables.events(spark, dir)
      .withColumn("d", when(onOff === "On", 1L).otherwise(0L))
      .withColumn("cl", cluster)
      .groupBy("event_type", "cl")
      .agg(count(lit(1)).as("n_g"), sum("d").as("n1_g"),
        sum(col("value").cast(d6)).as("s_g"),
        sum((col("value") * col("d")).cast(d6)).as("s1_g"))
    val w = Window.partitionBy("event_type")
    val tot = g.select(col("event_type"),
      col("n_g"), col("n1_g"), col("s_g"), col("s1_g"),
      sum("n_g").over(w).as("n"), sum("n1_g").over(w).as("n1"),
      sum("s_g").over(w).cast(DoubleType).as("s"),
      sum("s1_g").over(w).cast(DoubleType).as("s1"))
    val m1 = col("s1") / col("n1")
    val m0 = (col("s") - col("s1")) / (col("n") - col("n1"))
    val su = col("s_g").cast(DoubleType) - col("n1_g") * m1 -
      (col("n_g") - col("n1_g")) * m0
    val sd = col("s1_g").cast(DoubleType) - col("n1_g") * m1
    val scored = tot.select(col("event_type"), col("n"), col("n1"),
      m1.as("m1"), m0.as("m0"), su.as("su"), sd.as("sd"))
    val agg = scored.groupBy("event_type").agg(
      count(lit(1)).as("g_clusters"),
      max("n").as("n"), max("n1").as("n1"), max("m1").as("m1"), max("m0").as("m0"),
      sum((col("su") * col("su")).cast(d12)).cast(DoubleType).as("m11"),
      sum((col("su") * col("sd")).cast(d12)).cast(DoubleType).as("m12"),
      sum((col("sd") * col("sd")).cast(d12)).cast(DoubleType).as("m22"))
      .filter(col("n1") >= 1 && col("n") - col("n1") >= 1 &&
        col("g_clusters") >= 2 && col("n") > 2)
    val det = col("n1").cast(DoubleType) * (col("n") - col("n1"))
    val varRaw = (col("n1") * col("n1") * col("m11") -
      lit(2.0) * col("n1") * col("n") * col("m12") +
      col("n") * col("n") * col("m22")) / (det * det)
    val c = (col("g_clusters") / (col("g_clusters") - lit(1.0))) *
      ((col("n") - lit(1.0)) / (col("n") - lit(2.0)))
    val base = agg.select(col("event_type"), col("g_clusters"), col("n"),
      (col("m1") - col("m0")).as("beta1_raw"), col("m0").as("beta0_raw"),
      sqrt(c * varRaw).as("se_raw"),
      (col("g_clusters") - lit(1.0)).as("dfc"))
      .withColumn("t_raw", col("beta1_raw") / col("se_raw"))
      .withColumn("tcrit", expr(tInvCfSql("1.959963984540054", "dfc")))
    base.select(col("event_type"), col("g_clusters"), col("n"),
      r4(col("beta0_raw")).as("beta0"), r6(col("beta1_raw")).as("beta1"),
      r6(col("se_raw")).as("se"), r4(col("t_raw")).as("t_stat"),
      col("dfc").cast("long").as("df"),
      r6(expr(pTwoSidedTSql("t_raw", "dfc", spark = true))).as("p_t"),
      r6(col("beta1_raw") - col("tcrit") * col("se_raw")).as("ci_lo"),
      r6(col("beta1_raw") + col("tcrit") * col("se_raw")).as("ci_hi"))
      .orderBy("event_type")
  }

  private val crseOracle = {
    val m1 = "(s1 / n1)"; val m0 = "((s - s1) / (n - n1))"
    val det = "(CAST(n1 AS DOUBLE) * (n - n1))"
    val varRaw = s"((n1 * n1 * m11 - 2.0 * n1 * n * m12 + n * n * m22) / ($det * $det))"
    val corr = "((g_clusters / (g_clusters - 1.0)) * ((n - 1.0) / (n - 2.0)))"
    s"""WITH cl AS (
       |  SELECT event_type,
       |    (epoch_us(date_trunc('hour', ts)) // 3600000000) * 10 + user_id % 10 AS cl,
       |    COUNT(*) AS n_g,
       |    CAST(SUM(CASE WHEN $onOffSql = 'On' THEN 1 ELSE 0 END) AS BIGINT) AS n1_g,
       |    SUM(CAST("value" AS DECIMAL(28,6))) AS s_g,
       |    SUM(CAST("value" * (CASE WHEN $onOffSql = 'On' THEN 1 ELSE 0 END) AS DECIMAL(28,6))) AS s1_g
       |  FROM events GROUP BY 1, 2),
       |tot AS (
       |  SELECT event_type, n_g, n1_g, s_g, s1_g,
       |    CAST(SUM(n_g) OVER w AS BIGINT) AS n, CAST(SUM(n1_g) OVER w AS BIGINT) AS n1,
       |    CAST(SUM(s_g) OVER w AS DOUBLE) AS s,
       |    CAST(SUM(s1_g) OVER w AS DOUBLE) AS s1
       |  FROM cl WINDOW w AS (PARTITION BY event_type)),
       |scored AS (
       |  SELECT event_type, n, n1, $m1 AS m1, $m0 AS m0,
       |    CAST(s_g AS DOUBLE) - n1_g * $m1 - (n_g - n1_g) * $m0 AS su,
       |    CAST(s1_g AS DOUBLE) - n1_g * $m1 AS sd
       |  FROM tot),
       |agg AS (
       |  SELECT event_type, COUNT(*) AS g_clusters,
       |    MAX(n) AS n, MAX(n1) AS n1, MAX(m1) AS m1, MAX(m0) AS m0,
       |    CAST(SUM(CAST(su * su AS DECIMAL(30,12))) AS DOUBLE) AS m11,
       |    CAST(SUM(CAST(su * sd AS DECIMAL(30,12))) AS DOUBLE) AS m12,
       |    CAST(SUM(CAST(sd * sd AS DECIMAL(30,12))) AS DOUBLE) AS m22
       |  FROM scored GROUP BY 1
       |  HAVING MAX(n1) >= 1 AND MAX(n) - MAX(n1) >= 1 AND COUNT(*) >= 2 AND MAX(n) > 2),
       |base AS (
       |  SELECT event_type, g_clusters, n,
       |    (m1 - m0) AS beta1_raw, m0 AS beta0_raw,
       |    sqrt($corr * $varRaw) AS se_raw,
       |    (g_clusters - 1.0) AS dfc
       |  FROM agg),
       |tstats AS (
       |  SELECT *, beta1_raw / se_raw AS t_raw,
       |    ${tInvCfSql("1.959963984540054", "dfc")} AS tcrit
       |  FROM base)
       |SELECT event_type, g_clusters, n,
       |  ${rSql("beta0_raw", 4)} AS beta0, ${rSql("beta1_raw", 6)} AS beta1,
       |  ${rSql("se_raw", 6)} AS se, ${rSql("t_raw", 4)} AS t_stat,
       |  CAST(dfc AS BIGINT) AS df,
       |  ${rSql(pTwoSidedTSql("t_raw", "dfc", spark = false), 6)} AS p_t,
       |  ${rSql("beta1_raw - tcrit * se_raw", 6)} AS ci_lo,
       |  ${rSql("beta1_raw + tcrit * se_raw", 6)} AS ci_hi
       |FROM tstats ORDER BY event_type""".stripMargin
  }

  /** Fixed-width histogram of `value` (the notebooks' pd.cut binning
    * for distribution plots). */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("bin", floor(col("value") / 10.0) * 10)
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        r4((sum(col("value").cast(DecimalType(28, 6))).cast(DoubleType) /
          count(lit(1)))).as("bin_mean"))
      .orderBy("bin")

  private val histogramOracle =
    s"""SELECT CAST(floor("value" / 10.0) AS BIGINT) * 10 AS bin, COUNT(*) AS n,
       |  ${rSql("CAST(SUM(CAST(\"value\" AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)", 4)} AS bin_mean
       |FROM events GROUP BY 1 ORDER BY bin""".stripMargin

  /** NTILE quartile assignment per event_type with per-quartile value
    * ranges (the analyst's quartile table). */
  def ntileQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("value", "event_id")
    Tables.events(spark, dir)
      .withColumn("quartile", ntile(4).over(w))
      .groupBy("event_type", "quartile")
      .agg(count(lit(1)).as("n"),
        r4(min("value")).as("lo"), r4(max("value")).as("hi"))
      .orderBy("event_type", "quartile")
  }

  private val ntileQuartilesOracle =
    s"""SELECT event_type, quartile, COUNT(*) AS n,
       |  ${rSql("MIN(\"value\")", 4)} AS lo, ${rSql("MAX(\"value\")", 4)} AS hi
       |FROM (SELECT event_type, "value",
       |        NTILE(4) OVER (PARTITION BY event_type ORDER BY "value", event_id) AS quartile
       |      FROM events)
       |GROUP BY 1, 2 ORDER BY event_type, quartile""".stripMargin

  /** Benjamini-Hochberg FDR correction over the per-event_type MWU
    * p-values — the multiple-testing step after running a batch of
    * tests: rank p ascending, p_adj(i) = min_{j≥i} p(j)·m/j, clamped
    * to 1. All windows here are GLOBAL by design: they run over one
    * row per test (a handful), never raw events. */
  def fdrBh(spark: SparkSession, dir: String): DataFrame = {
    val p = mwu(spark, dir).select(col("event_type"), col("p_value"))
    // NULLS LAST explicitly: a degenerate (all-tied) test emits a NULL
    // p-value, and Spark's ascending default is nulls FIRST while
    // DuckDB's is nulls LAST — unpinned, one degenerate row would
    // shift EVERY rank (and thus every p·m/rank) between engines
    val wRank = Window.orderBy(col("p_value").asc_nulls_last, col("event_type"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // running min over the tail = min of padj_raw from this rank upward
    val wTail = Window.orderBy(col("rnk").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.withColumn("rnk", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("padj_raw", col("p_value") * col("m") / col("rnk"))
      .withColumn("p_adj", r6(least(lit(1.0), min("padj_raw").over(wTail))))
      .select(col("event_type"), col("rnk"), col("p_value"), col("p_adj"))
      .orderBy("rnk")
  }

  private val fdrBhOracle =
    s"""WITH pv AS (
       |  SELECT event_type, p_value FROM ($mwuOracle)),
       |ranked AS (
       |  SELECT event_type, p_value,
       |    ROW_NUMBER() OVER (ORDER BY p_value ASC NULLS LAST, event_type) AS rnk,
       |    COUNT(*) OVER () AS m
       |  FROM pv),
       |adj AS (SELECT *, p_value * m / rnk AS padj_raw FROM ranked)
       |SELECT event_type, rnk, p_value,
       |  ${rSql("least(1.0, MIN(padj_raw) OVER (ORDER BY rnk DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))", 6)} AS p_adj
       |FROM adj ORDER BY rnk""".stripMargin

  /** CUPED variance reduction: adjust the in-period per-user metric by
    * the pre-period covariate, θ = cov(x,y)/var(x),
    * mean_adj(g) = mean_y(g) − θ·(mean_x(g) − x̄). Reported per
    * user-parity assignment group beside the raw means — the standard
    * pre-experiment-data adjustment for experiment readouts.
    *
    * Determinism: per-user x/y means are r6-rounded, all cross-moments
    * accumulate as DECIMAL(30,12) of products of those rounded values,
    * and the group adjustment uses only group-level sums — no per-row
    * double accumulation anywhere. */
  def cuped(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(28, 6)
    val d12 = DecimalType(30, 12)
    val cut = lit("2024-01-15").cast("timestamp")
    val perUser = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        sum(when(col("ts") < cut, col("value").cast(d6))).cast(DoubleType).as("sx"),
        sum(when(col("ts") < cut, 1L).otherwise(0L)).as("nx"),
        sum(when(col("ts") >= cut, col("value").cast(d6))).cast(DoubleType).as("sy"),
        sum(when(col("ts") >= cut, 1L).otherwise(0L)).as("ny"))
      .filter(col("nx") > 0 && col("ny") > 0)
      .select(col("user_id"),
        r6(col("sx") / col("nx")).as("x"), r6(col("sy") / col("ny")).as("y"),
        when(col("user_id") % 2 === 0, "A").otherwise("B").as("grp"))
    val mom = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(d6)).cast(DoubleType).as("sx"),
      sum(col("y").cast(d6)).cast(DoubleType).as("sy"),
      sum((col("x") * col("x")).cast(d12)).cast(DoubleType).as("sxx"),
      sum((col("x") * col("y")).cast(d12)).cast(DoubleType).as("sxy"))
    val groups = perUser.groupBy("grp").agg(
      count(lit(1)).as("n_users"),
      sum(col("x").cast(d6)).cast(DoubleType).as("gx"),
      sum(col("y").cast(d6)).cast(DoubleType).as("gy"))
    // nzc: a constant pre-period covariate makes var(x) exactly 0 —
    // NULL theta in both engines, not an ANSI divide error
    val theta = (col("sxy") - col("sx") * col("sy") / col("n")) /
      nzc(col("sxx") - col("sx") * col("sx") / col("n"))
    val xbar = col("sx") / col("n")
    groups.crossJoin(broadcast(mom))
      .select(col("grp"), col("n_users"),
        r4(col("gy") / col("n_users")).as("mean_y"),
        r4(col("gy") / col("n_users") -
          theta * (col("gx") / col("n_users") - xbar)).as("mean_y_adj"),
        r6(theta).as("theta"))
      .orderBy("grp")
  }

  private val cupedOracle = {
    val x = rSql("CAST(SUM(CAST(\"value\" AS DECIMAL(28,6))) FILTER (WHERE ts < TIMESTAMP '2024-01-15 00:00:00') AS DOUBLE) / nx", 6)
    val y = rSql("CAST(SUM(CAST(\"value\" AS DECIMAL(28,6))) FILTER (WHERE ts >= TIMESTAMP '2024-01-15 00:00:00') AS DOUBLE) / ny", 6)
    val theta = "((sxy - sx * sy / n) / (sxx - sx * sx / n))"
    val xbar = "(sx / n)"
    s"""WITH per_user AS (
       |  SELECT user_id,
       |    COUNT(*) FILTER (WHERE ts < TIMESTAMP '2024-01-15 00:00:00') AS nx,
       |    COUNT(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-15 00:00:00') AS ny,
       |    $x AS x, $y AS y,
       |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp
       |  FROM events GROUP BY user_id HAVING nx > 0 AND ny > 0),
       |mom AS (
       |  SELECT COUNT(*) AS n,
       |    CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(x * x AS DECIMAL(30,12))) AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(x * y AS DECIMAL(30,12))) AS DOUBLE) AS sxy
       |  FROM per_user),
       |grps AS (
       |  SELECT grp, COUNT(*) AS n_users,
       |    CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS gx,
       |    CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS gy
       |  FROM per_user GROUP BY grp)
       |SELECT grp, n_users,
       |  ${rSql("gy / n_users", 4)} AS mean_y,
       |  ${rSql(s"gy / n_users - $theta * (gx / n_users - $xbar)", 4)} AS mean_y_adj,
       |  ${rSql(theta, 6)} AS theta
       |FROM grps CROSS JOIN mom ORDER BY grp""".stripMargin
  }

  /** Two-sample Kolmogorov–Smirnov test per event_type, On vs Off —
    * the distribution-level complement to the mean-level t and
    * rank-level MWU readouts (scipy.stats.ks_2samp, mode='asymp').
    *
    * Built on the same per-DISTINCT-VALUE cumulative table as MWU (no
    * global sort of raw rows): the ECDF gap at value v is
    * cum_on/n₁ − cum_off/n₂, and D = max|gap| is found EXACTLY with
    * the integer cross-multiplication |cum_on·n₂ − cum_off·n₁| (no FP
    * until the final division), so D is partition- and engine-exact.
    * p = Q_KS(√(n₁n₂/n)·D) via [[graft.functions.StatFunctions.ksPSql]].
    */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .withColumn("g", onOff)
      .groupBy("event_type", "value")
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("g") === "On", 1L).otherwise(0L)).as("cnt_on"))
    val wCum = Window.partitionBy("event_type").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("event_type")
    // Cross-multiplication in DECIMAL(38,0): the BIGINT product
    // cum_on·n₂ overflows once n₁·n₂ > 2^63 (~3e9 rows per arm) and
    // Spark (non-ANSI) would wrap SILENTLY — decimal keeps the order
    // statistic exact to 1e38, i.e. any realistic corpus.
    val d380 = DecimalType(38, 0)
    val gaps = counts
      .withColumn("cum", sum("cnt").over(wCum).cast(d380))
      .withColumn("cum_on", sum("cnt_on").over(wCum).cast(d380))
      .withColumn("n", sum("cnt").over(wAll).cast(d380))
      .withColumn("n1", sum("cnt_on").over(wAll).cast(d380))
      .withColumn("num",
        abs(col("cum_on") * (col("n") - col("n1")) - (col("cum") - col("cum_on")) * col("n1")))
    val agg = gaps.groupBy("event_type").agg(
      max("n1").cast(LongType).as("n_on"),
      (max("n") - max("n1")).cast(LongType).as("n_off"),
      max("num").as("d_num"))
    // n_on·n_off likewise overflows long past ~3e9/arm: promote each
    // factor to double FIRST (both engines, same order → same double).
    val d = col("d_num").cast(DoubleType) /
      (col("n_on").cast(DoubleType) * col("n_off").cast(DoubleType))
    val z = sqrt((col("n_on").cast(DoubleType) * col("n_off").cast(DoubleType)) /
      (col("n_on") + col("n_off")).cast(DoubleType)) * col("d_raw")
    agg.select(col("event_type"), col("n_on"), col("n_off"), d.as("d_raw"))
      .select(col("event_type"), col("n_on"), col("n_off"), col("d_raw"),
        z.as("z_raw"))
      .select(col("event_type"), col("n_on"), col("n_off"),
        r6(col("d_raw")).as("ks_d"), r4(col("z_raw")).as("ks_z"),
        r6(expr(ksPSql("z_raw"))).as("p_value"))
      .orderBy("event_type")
  }

  private val ksTestOracle = {
    // factors promoted to double BEFORE multiplying — same order as the
    // Spark side, so the (possibly inexact past 2^53) product is the
    // identical double in both engines.
    val d = "(CAST(d_num AS DOUBLE) / (CAST(n_on AS DOUBLE) * CAST(n_off AS DOUBLE)))"
    val z = "(sqrt((CAST(n_on AS DOUBLE) * CAST(n_off AS DOUBLE)) / CAST(n_on + n_off AS DOUBLE)) * d_raw)"
    s"""WITH counts AS (
       |  SELECT event_type, "value" AS v, COUNT(*) AS cnt,
       |    CAST(COUNT(*) FILTER (WHERE $onOffSql = 'On') AS BIGINT) AS cnt_on
       |  FROM events GROUP BY 1, 2),
       |cums AS (
       |  SELECT event_type, cnt, cnt_on,
       |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    SUM(cnt_on) OVER (PARTITION BY event_type ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_on,
       |    SUM(cnt) OVER (PARTITION BY event_type) AS n,
       |    SUM(cnt_on) OVER (PARTITION BY event_type) AS n1
       |  FROM counts),
       |agg AS (
       |  SELECT event_type,
       |    CAST(MAX(n1) AS BIGINT) AS n_on,
       |    CAST(MAX(n) - MAX(n1) AS BIGINT) AS n_off,
       |    CAST(MAX(abs(cum_on * (n - n1) - (cum - cum_on) * n1)) AS BIGINT) AS d_num
       |  FROM cums GROUP BY event_type),
       |ds AS (
       |  SELECT event_type, n_on, n_off, $d AS d_raw FROM agg),
       |zs AS (
       |  SELECT event_type, n_on, n_off, d_raw, $z AS z_raw FROM ds)
       |SELECT event_type, n_on, n_off,
       |  ${rSql("d_raw", 6)} AS ks_d, ${rSql("z_raw", 4)} AS ks_z,
       |  ${rSql(ksPSql("z_raw"), 6)} AS p_value
       |FROM zs ORDER BY event_type""".stripMargin
  }

  /** Brown–Forsythe variance-equality test per event_type, On vs Off
    * (scipy.stats.levene(center='median')) — the methodology gate the
    * notebooks apply before choosing pooled vs Welch t: reject → use
    * Welch. One-way ANOVA F on |x − group median|; with k=2 groups,
    * F(1, ν) = t²(ν), so the p-value reuses the portable Student-t CF
    * (p_F = p_two_sided_t(√W, N−2)) — no new special function.
    *
    * Group medians are exact interpolated percentiles rounded to 6
    * decimals (the grid both engines agree on), deviations accumulate
    * in DECIMAL, and the two-group F assembles from those exact
    * moments in fixed order — partitioning- and engine-deterministic.
    */
  def levene(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(28, 6)
    val med = Tables.events(spark, dir)
      .withColumn("g", onOff)
      .groupBy("event_type", "g")
      .agg(r6(expr("percentile(value, 0.5)")).as("med"))
    val z = Tables.events(spark, dir)
      .withColumn("g", onOff)
      .join(broadcast(med), Seq("event_type", "g"))
      .withColumn("z", abs(col("value") - col("med")))
    val moments = z.groupBy("event_type").agg(
      sum(when(col("g") === "On", 1L).otherwise(0L)).as("n1"),
      sum(when(col("g") === "On", col("z").cast(dec))).cast(DoubleType).as("s1"),
      sum(when(col("g") === "On", (col("z") * col("z")).cast(dec))).cast(DoubleType).as("ss1"),
      sum(when(col("g") === "Off", 1L).otherwise(0L)).as("n2"),
      sum(when(col("g") === "Off", col("z").cast(dec))).cast(DoubleType).as("s2"),
      sum(when(col("g") === "Off", (col("z") * col("z")).cast(dec))).cast(DoubleType).as("ss2"))
    val m1 = col("s1") / col("n1"); val m2 = col("s2") / col("n2")
    val mg = (col("s1") + col("s2")) / (col("n1") + col("n2"))
    val ssb = col("n1") * (m1 - mg) * (m1 - mg) + col("n2") * (m2 - mg) * (m2 - mg)
    val ssw = (col("ss1") - col("s1") * col("s1") / col("n1")) +
      (col("ss2") - col("s2") * col("s2") / col("n2"))
    val w = ssb / (ssw / (col("n1") + col("n2") - 2))
    moments
      .select(col("event_type"), col("n1").as("n_on"), col("n2").as("n_off"),
        w.as("w_raw"), (col("n1") + col("n2") - 2).cast(DoubleType).as("df_raw"))
      .select(col("event_type"), col("n_on"), col("n_off"),
        r4(col("w_raw")).as("w_stat"),
        r6(expr(pTwoSidedTSql("sqrt(w_raw)", "df_raw", spark = true))).as("p_value"))
      .orderBy("event_type")
  }

  private val leveneOracle = {
    val m1 = "(s1 / n1)"; val m2 = "(s2 / n2)"
    val mg = "((s1 + s2) / (n1 + n2))"
    val ssb = s"(n1 * ($m1 - $mg) * ($m1 - $mg) + n2 * ($m2 - $mg) * ($m2 - $mg))"
    val ssw = "((ss1 - s1 * s1 / n1) + (ss2 - s2 * s2 / n2))"
    val w = s"($ssb / ($ssw / (n1 + n2 - 2)))"
    s"""WITH med AS (
       |  SELECT event_type, $onOffSql AS g,
       |    ${rSql("quantile_cont(\"value\", 0.5)", 6)} AS med
       |  FROM events GROUP BY 1, 2),
       |z AS (
       |  SELECT e.event_type, $onOffSql AS g, abs(e."value" - m.med) AS z
       |  FROM events e JOIN med m ON e.event_type = m.event_type AND $onOffSql = m.g),
       |moments AS (
       |  SELECT event_type,
       |    COUNT(*) FILTER (WHERE g = 'On') AS n1,
       |    CAST(SUM(CAST(z AS DECIMAL(28,6))) FILTER (WHERE g = 'On') AS DOUBLE) AS s1,
       |    CAST(SUM(CAST(z * z AS DECIMAL(28,6))) FILTER (WHERE g = 'On') AS DOUBLE) AS ss1,
       |    COUNT(*) FILTER (WHERE g = 'Off') AS n2,
       |    CAST(SUM(CAST(z AS DECIMAL(28,6))) FILTER (WHERE g = 'Off') AS DOUBLE) AS s2,
       |    CAST(SUM(CAST(z * z AS DECIMAL(28,6))) FILTER (WHERE g = 'Off') AS DOUBLE) AS ss2
       |  FROM z GROUP BY 1),
       |stats AS (
       |  SELECT event_type, n1 AS n_on, n2 AS n_off, $w AS w_raw,
       |    CAST(n1 + n2 - 2 AS DOUBLE) AS df_raw
       |  FROM moments)
       |SELECT event_type, n_on, n_off,
       |  ${rSql("w_raw", 4)} AS w_stat,
       |  ${rSql(pTwoSidedTSql("sqrt(w_raw)", "df_raw", spark = false), 6)} AS p_value
       |FROM stats ORDER BY event_type""".stripMargin
  }

  /** One-way ANOVA across the four hour-positions of a 4h switchback
    * block, per event_type — the F-test readout of the propagation
    * question ("does the KPI level depend on where in the block the
    * hour sits?"; q_propagation shows the per-position deltas, this
    * tests them jointly). Decimal-exact per-position moments pivot
    * into ONE row per event_type via conditional aggregation (no
    * second shuffle); F assembles from the exact sums in fixed order;
    * p = P(F₍₃,N₋₄₎ > F) through the portable incomplete-beta CF. */
  def anovaPosition(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(28, 6)
    val pos = expr("(unix_micros(date_trunc('hour', ts)) div 3600000000) % 4")
    val aggs = (0 to 3).flatMap { j =>
      Seq(
        sum(when(col("pos") === j, 1L).otherwise(0L)).as(s"n$j"),
        sum(when(col("pos") === j, col("value").cast(dec))).cast(DoubleType).as(s"s$j"),
        sum(when(col("pos") === j, (col("value") * col("value")).cast(dec)))
          .cast(DoubleType).as(s"ss$j"))
    }
    val moments = Tables.events(spark, dir)
      .withColumn("pos", pos)
      .groupBy("event_type")
      .agg(aggs.head, aggs.tail: _*)
    val nTot = (0 to 3).map(j => col(s"n$j")).reduce(_ + _)
    val sTot = (0 to 3).map(j => col(s"s$j")).reduce(_ + _)
    val grand = sTot / nTot.cast(DoubleType)
    val ssb = (0 to 3).map { j =>
      val m = col(s"s$j") / col(s"n$j")
      col(s"n$j") * (m - grand) * (m - grand)
    }.reduce(_ + _)
    val ssw = (0 to 3).map { j =>
      col(s"ss$j") - col(s"s$j") * col(s"s$j") / col(s"n$j")
    }.reduce(_ + _)
    val f = (ssb / 3.0) / (ssw / (nTot - 4).cast(DoubleType))
    moments
      .select(col("event_type"), nTot.as("n"), f.as("f_raw"),
        (nTot - 4).cast(DoubleType).as("df2_raw"))
      .select(col("event_type"), col("n"),
        r4(col("f_raw")).as("f_stat"),
        r6(expr(pFSql("f_raw", "3.0", "df2_raw", spark = true))).as("p_value"))
      .orderBy("event_type")
  }

  private val anovaPositionOracle = {
    val posSql = "(epoch_us(date_trunc('hour', ts)) // 3600000000) % 4"
    val momCols = (0 to 3).map { j =>
      s"""    COUNT(*) FILTER (WHERE $posSql = $j) AS n$j,
         |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE $posSql = $j) AS DOUBLE) AS s$j,
         |    CAST(SUM(CAST("value" * "value" AS DECIMAL(28,6))) FILTER (WHERE $posSql = $j) AS DOUBLE) AS ss$j""".stripMargin
    }.mkString(",\n")
    val nTot = "(((n0 + n1) + n2) + n3)"
    val sTot = "(((s0 + s1) + s2) + s3)"
    val grand = s"($sTot / CAST($nTot AS DOUBLE))"
    val ssb = (0 to 3).map { j =>
      s"(n$j * ((s$j / n$j) - $grand) * ((s$j / n$j) - $grand))"
    }.reduce((a, b) => s"($a + $b)")
    val ssw = (0 to 3).map { j =>
      s"(ss$j - s$j * s$j / n$j)"
    }.reduce((a, b) => s"($a + $b)")
    val f = s"(($ssb / 3.0) / ($ssw / CAST($nTot - 4 AS DOUBLE)))"
    s"""WITH moments AS (
       |  SELECT event_type,
       |$momCols
       |  FROM events GROUP BY 1),
       |stats AS (
       |  SELECT event_type, CAST($nTot AS BIGINT) AS n, $f AS f_raw,
       |    CAST($nTot - 4 AS DOUBLE) AS df2_raw
       |  FROM moments)
       |SELECT event_type, n,
       |  ${rSql("f_raw", 4)} AS f_stat,
       |  ${rSql(pFSql("f_raw", "3.0", "df2_raw", spark = false), 6)} AS p_value
       |FROM stats ORDER BY event_type""".stripMargin
  }

  /** Delete-one-block (grouped) jackknife for the ratio metric
    * Σ value / n per event_type — the standard alternative to the
    * delta method (q_ratio_delta) for ratio-metric standard errors,
    * and the one large experimentation platforms actually run because
    * it needs only per-block sufficient statistics: B = 20 user
    * blocks (user_id mod 20, the q_crse clustering), each leave-one-
    * out replicate θ̂₍ᵢ₎ = (S − sᵢ)/(N − nᵢ) computed FROM THE TOTALS,
    * so the whole estimator is one |blocks×types| aggregation over
    * one fact pass — no resampling, no per-replicate scan.
    *
    * SE² = (B−1)/B · Σ (θ̂₍ᵢ₎ − θ̄)². Determinism: block sums are
    * exact DECIMAL; each replicate is r6-rounded before the moment
    * pass; deviations re-round and DECIMAL-sum, so accumulation order
    * never shows. */
  def jackknife(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    val blocks = Tables.events(spark, dir)
      .select(col("event_type"), (col("user_id") % 20).as("blk"), col("value"))
      .groupBy("event_type", "blk")
      .agg(count(lit(1)).as("n_b"), sum(col("value").cast(d)).as("s_b"))
    val tot = blocks.groupBy("event_type")
      .agg(sum("n_b").as("n"), sum("s_b").as("s"), count(lit(1)).as("b"))
    // NULLIF-guard the delete-one divisor (q_did discipline): a type
    // whose rows all share one block has n - n_b = 0 for its single
    // replicate — Spark NULL vs DuckDB inf would diverge unguarded
    val reps = blocks.join(tot, "event_type")
      .withColumn("theta_i", r6((col("s") - col("s_b")).cast(DoubleType) /
        when(col("n") - col("n_b") =!= 0, col("n") - col("n_b"))))
    val moments = reps.groupBy("event_type")
      .agg(max("n").as("n"), max("s").as("s"), max("b").as("b"),
        sum(col("theta_i").cast(d)).cast(DoubleType).as("sum_t"))
    val withBar = moments.withColumn("theta_bar", r6(col("sum_t") / col("b")))
    val dev = reps.join(withBar.select("event_type", "theta_bar"), "event_type")
      .withColumn("dsq", r6((col("theta_i") - col("theta_bar")) *
        (col("theta_i") - col("theta_bar"))))
      .groupBy("event_type")
      .agg(sum(col("dsq").cast(d)).cast(DoubleType).as("ssd"))
    withBar.join(dev, "event_type")
      .withColumn("ratio", r6(col("s").cast(DoubleType) / col("n")))
      .withColumn("jk_se", r6(sqrt((col("b") - 1).cast(DoubleType) / col("b") * col("ssd"))))
      .select(col("event_type"), col("n"), col("b").as("n_blocks"),
        col("ratio"), col("jk_se"),
        r4(col("ratio") - lit(1.96) * col("jk_se")).as("ci_lo"),
        r4(col("ratio") + lit(1.96) * col("jk_se")).as("ci_hi"))
      .orderBy("event_type")
  }

  private val jackknifeOracle: String =
    s"""WITH blocks AS (
       |  SELECT event_type, user_id % 20 AS blk,
       |    COUNT(*) AS n_b, SUM(CAST("value" AS DECIMAL(28,6))) AS s_b
       |  FROM events GROUP BY 1, 2),
       |tot AS (
       |  SELECT event_type, CAST(SUM(n_b) AS BIGINT) AS n, SUM(s_b) AS s,
       |    COUNT(*) AS b
       |  FROM blocks GROUP BY 1),
       |reps AS (
       |  SELECT blocks.event_type, b, n, s,
       |    ${rSql("(CAST(s - s_b AS DOUBLE) / NULLIF(n - n_b, 0))", 6)} AS theta_i
       |  FROM blocks JOIN tot ON blocks.event_type = tot.event_type),
       |bar AS (
       |  SELECT event_type, MAX(b) AS b, MAX(n) AS n, MAX(s) AS s,
       |    ${rSql("(CAST(SUM(CAST(theta_i AS DECIMAL(28,6))) AS DOUBLE) / MAX(b))", 6)} AS theta_bar
       |  FROM reps GROUP BY 1),
       |dev AS (
       |  SELECT reps.event_type,
       |    CAST(SUM(CAST(${rSql("((theta_i - theta_bar) * (theta_i - theta_bar))", 6)} AS DECIMAL(28,6))) AS DOUBLE) AS ssd
       |  FROM reps JOIN bar ON reps.event_type = bar.event_type
       |  GROUP BY 1),
       |fin AS (
       |  SELECT bar.event_type, n, b AS n_blocks,
       |    ${rSql("(CAST(s AS DOUBLE) / n)", 6)} AS ratio,
       |    ${rSql("sqrt(CAST(b - 1 AS DOUBLE) / b * ssd)", 6)} AS jk_se
       |  FROM bar JOIN dev ON bar.event_type = dev.event_type)
       |SELECT event_type, n, n_blocks, ratio, jk_se,
       |  ${rSql("(ratio - 1.96 * jk_se)", 4)} AS ci_lo,
       |  ${rSql("(ratio + 1.96 * jk_se)", 4)} AS ci_hi
       |FROM fin ORDER BY event_type""".stripMargin

  // ------------------------------------------- Spearman rank correlation

  /** Spearman rank correlation between gross price and net revenue
    * (price·(1−disc)·(1+tax)) per return flag — the monotone-
    * association readout (scipy.stats.spearmanr) the notebooks reach
    * for when the KPI relationship is nonlinear: discount and tax
    * perturb the ranking, Spearman measures how much order survives.
    * Tie-corrected by construction: average ranks per tied block, then
    * the Pearson formula on ranks (the textbook tie-general form).
    *
    * Determinism: doubled average ranks 2R = 2·cum_before + cnt + 1 are
    * exact INTEGERS, so every moment (Σ2Rx·2Ry, …) is an exact
    * DECIMAL(38,0) sum; ρ is computed from the (scale-invariant)
    * doubled ranks in one fixed-order double expression.
    *
    * Scale (the MWU discipline): ranks come from per-DISTINCT-value
    * count tables (a window over |distinct| rows per group, never a
    * raw-row sort), and the rank join-back happens on the (x, y) PAIR
    * vocabulary — the fact table is touched by exactly one groupBy. */
  def spearman(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    // the pair table feeds three branches (both rank tables + the
    // join-back); persist it so the fact-table groupBy runs ONCE —
    // static planning does not reuse the identical exchanges
    val pairs = graft.CacheScope.track(Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_extendedprice").as("x"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))).as("y"))
      .agg(count(lit(1)).as("cnt"))
      .persist())
    def rankTable(v: String, rk: String): DataFrame = {
      val w = Window.partitionBy("flag").orderBy(v)
        .rowsBetween(Window.unboundedPreceding, -1)
      pairs.groupBy("flag", v).agg(sum("cnt").as("c"))
        .withColumn(rk,
          lit(2) * coalesce(sum("c").over(w), lit(0L)) + col("c") + 1)
        .drop("c")
    }
    val j = pairs
      .join(rankTable("x", "rx2"), Seq("flag", "x"))
      .join(rankTable("y", "ry2"), Seq("flag", "y"))
    val m = j.groupBy("flag").agg(
      sum("cnt").as("n"),
      sum((col("cnt").cast(d38) * col("rx2"))).cast(DoubleType).as("sx"),
      sum((col("cnt").cast(d38) * col("ry2"))).cast(DoubleType).as("sy"),
      sum((col("cnt").cast(d38) * col("rx2") * col("rx2"))).cast(DoubleType).as("sxx"),
      sum((col("cnt").cast(d38) * col("ry2") * col("ry2"))).cast(DoubleType).as("syy"),
      sum((col("cnt").cast(d38) * col("rx2") * col("ry2"))).cast(DoubleType).as("sxy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val den = sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
      (col("n") * col("syy") - col("sy") * col("sy")))
    m.select(col("flag"), col("n"),
        r6(num / when(den =!= 0, den)).as("rho"))
      .orderBy("flag")
  }

  private val spearmanOracle = {
    val num = "(n * sxy - sx * sy)"
    val den = "sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))"
    s"""WITH pairs AS (
       |  SELECT l_returnflag AS flag, l_extendedprice AS x,
       |    l_extendedprice * (1 - l_discount) * (1 + l_tax) AS y,
       |    COUNT(*) AS cnt
       |  FROM lineitem GROUP BY 1, 2, 3),
       |xr AS (
       |  SELECT flag, x,
       |    2 * COALESCE(SUM(c) OVER (PARTITION BY flag ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS rx2
       |  FROM (SELECT flag, x, SUM(cnt) AS c FROM pairs GROUP BY 1, 2)),
       |yr AS (
       |  SELECT flag, y,
       |    2 * COALESCE(SUM(c) OVER (PARTITION BY flag ORDER BY y
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS ry2
       |  FROM (SELECT flag, y, SUM(cnt) AS c FROM pairs GROUP BY 1, 2)),
       |m AS (
       |  SELECT p.flag, CAST(SUM(cnt) AS BIGINT) AS n,
       |    CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * rx2) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * ry2) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * rx2 * rx2) AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * ry2 * ry2) AS DOUBLE) AS syy,
       |    CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * rx2 * ry2) AS DOUBLE) AS sxy
       |  FROM pairs p
       |  JOIN xr ON p.flag = xr.flag AND p.x = xr.x
       |  JOIN yr ON p.flag = yr.flag AND p.y = yr.y
       |  GROUP BY 1)
       |SELECT flag, n, ${rSql(s"($num / NULLIF($den, 0))", 6)} AS rho
       |FROM m ORDER BY flag""".stripMargin
  }

  // ------------------------------------------------ two-proportion z-test

  /** Two-proportion z-test per event_type — the conversion-rate
    * readout (statsmodels proportions_ztest): "conversion" is a value
    * above the type's own median (data-derived, so every type has a
    * non-degenerate rate), compared On vs Off with the pooled-SE z,
    * two-sided normal p, and the unpooled-SE 95% CI on the
    * difference — the one test family (proportions, not means/ranks)
    * the block was still missing.
    *
    * Determinism: the median threshold is an exact interpolating
    * percentile (the q_quantiles pairing) and conversion counting is
    * pure integer; all divisions happen once, in fixed order.
    *
    * Scale: one aggregation for the medians (|types| rows, broadcast
    * back), one conditional aggregation for the 2×2 counts. */
  def propTest(spark: SparkSession, dir: String): DataFrame = {
    def nz(c: Column): Column = when(c =!= 0, c)
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value"), onOff.as("g"))
    // r6 the threshold (the levene discipline): the two engines'
    // interpolation formulas can differ by 1 ulp, and an unrounded
    // hard cutoff would flip integer conversion counts across engines
    val med = ev.groupBy("event_type")
      .agg(r6(expr("percentile(value, 0.5)")).as("med"))
    val m = ev.join(broadcast(med), Seq("event_type"))
      .groupBy("event_type")
      .agg(
        sum(when(col("g") === "On", 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") === "On" && col("value") > col("med"), 1L).otherwise(0L)).as("x1"),
        sum(when(col("g") === "Off", 1L).otherwise(0L)).as("n2"),
        sum(when(col("g") === "Off" && col("value") > col("med"), 1L).otherwise(0L)).as("x2"))
    val p1 = col("x1") / nz(col("n1"))
    val p2 = col("x2") / nz(col("n2"))
    val pPool = (col("x1") + col("x2")) / nz(col("n1") + col("n2"))
    val sePool = sqrt(pPool * (lit(1) - pPool) * (lit(1.0) / col("n1") + lit(1.0) / col("n2")))
    val seDiff = sqrt(p1 * (lit(1) - p1) / col("n1") + p2 * (lit(1) - p2) / col("n2"))
    val z = (p1 - p2) / nz(sePool)
    m.select(col("event_type"), col("n1"), col("x1"), col("n2"), col("x2"),
        r4(p1).as("p_on"), r4(p2).as("p_off"),
        r4(z).as("z"), r6(pTwoSidedNormal(z)).as("p_value"),
        r4(p1 - p2 - lit(1.959964) * seDiff).as("ci_lo"),
        r4(p1 - p2 + lit(1.959964) * seDiff).as("ci_hi"))
      .orderBy("event_type")
  }

  private val propTestOracle = {
    def nzS(e: String) = s"NULLIF($e, 0)"
    val p1 = s"(x1 / ${nzS("n1")})"
    val p2 = s"(x2 / ${nzS("n2")})"
    val pPool = s"((x1 + x2) / ${nzS("n1 + n2")})"
    val sePool = s"sqrt($pPool * (1 - $pPool) * (1.0 / n1 + 1.0 / n2))"
    val seDiff = s"sqrt($p1 * (1 - $p1) / n1 + $p2 * (1 - $p2) / n2)"
    val z = s"(($p1 - $p2) / ${nzS(sePool)})"
    s"""WITH med AS (
       |  SELECT event_type, ${rSql("quantile_cont(\"value\", 0.5)", 6)} AS med
       |  FROM events GROUP BY 1),
       |m AS (
       |  SELECT e.event_type,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'On') AS n1,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'On' AND "value" > med) AS x1,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'Off') AS n2,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'Off' AND "value" > med) AS x2
       |  FROM events e JOIN med ON e.event_type = med.event_type
       |  GROUP BY 1)
       |SELECT event_type, n1, x1, n2, x2,
       |  ${rSql(p1, 4)} AS p_on, ${rSql(p2, 4)} AS p_off,
       |  ${rSql(z, 4)} AS z,
       |  ${rSql(pTwoSidedNormalSql(z), 6)} AS p_value,
       |  ${rSql(s"($p1 - $p2 - 1.959964 * $seDiff)", 4)} AS ci_lo,
       |  ${rSql(s"($p1 - $p2 + 1.959964 * $seDiff)", 4)} AS ci_hi
       |FROM m ORDER BY event_type""".stripMargin
  }

  // ---------------------------------------- Cochran–Mantel–Haenszel test

  /** Cochran–Mantel–Haenszel stratified conversion test per
    * event_type, stratified by zone — q_prop_test's Simpson's-paradox-
    * safe companion: when conversion AND assignment both vary by zone,
    * the marginal 2×2 can show an effect that reverses within every
    * stratum; CMH pools the per-stratum evidence instead. Conversion
    * is the same r6-pinned per-type median cutoff; the statistic is
    * the continuity-corrected (|Σ(a−E[a])| − 0.5)²/Σvar with
    * hypergeometric E/var per stratum, p from χ²(1) = the two-sided
    * normal on √χ².
    *
    * Determinism: cell counts are integers; each stratum's E and var
    * terms are r6-rounded then DECIMAL-summed across strata.
    *
    * Scale: one medians pass broadcast back + ONE map-side-combined
    * aggregation keyed (type, zone); CMH arithmetic runs on the
    * |types×zones| frame. */
  def cmhTest(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    def nz(c: Column): Column = when(c =!= 0, c)
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value"), onOff.as("g"),
        (col("user_id") % 10).as("zone"))
    val med = ev.groupBy("event_type")
      .agg(r6(expr("percentile(value, 0.5)")).as("med"))
    val cell = ev.join(broadcast(med), Seq("event_type"))
      .groupBy("event_type", "zone")
      .agg(
        sum(when(col("g") === "On", 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") === "On" && col("value") > col("med"), 1L).otherwise(0L)).as("a"),
        sum(when(col("g") === "Off", 1L).otherwise(0L)).as("n2"),
        sum(when(col("g") === "Off" && col("value") > col("med"), 1L).otherwise(0L)).as("c"))
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("m1", col("a") + col("c"))
      .withColumn("e", r6(col("n1").cast(DoubleType) * col("m1") /
        nz(col("n").cast(DoubleType))))
      .withColumn("v", r6(
        (col("n1").cast(DoubleType) * col("n2") * col("m1") * (col("n") - col("m1"))) /
          nz(col("n").cast(DoubleType) * col("n") * (col("n") - 1))))
    val agg = cell.groupBy("event_type").agg(
      count(lit(1)).as("n_strata"),
      sum("a").as("sum_a"),
      sum(col("e").cast(d)).cast(DoubleType).as("sum_e"),
      sum(col("v").cast(d)).cast(DoubleType).as("sum_v"))
    val dev = abs(col("sum_a") - col("sum_e")) - 0.5
    val chi = dev * dev / nz(col("sum_v"))
    agg.select(col("event_type"), col("n_strata"), col("sum_a"),
        r4(col("sum_e")).as("e_a"), r4(chi).as("cmh_chi2"),
        r6(pTwoSidedNormal(sqrt(chi))).as("p_value"))
      .orderBy("event_type")
  }

  private val cmhTestOracle = {
    def nzS(e: String) = s"NULLIF($e, 0)"
    val e = rSql(s"(CAST(n1 AS DOUBLE) * m1 / ${nzS("CAST(n AS DOUBLE)")})", 6)
    val v = rSql(s"((CAST(n1 AS DOUBLE) * n2 * m1 * (n - m1)) / ${nzS("(CAST(n AS DOUBLE) * n * (n - 1))")})", 6)
    val dev = "(abs(sum_a - sum_e) - 0.5)"
    val chi = s"($dev * $dev / ${nzS("sum_v")})"
    s"""WITH med AS (
       |  SELECT event_type, ${rSql("quantile_cont(\"value\", 0.5)", 6)} AS med
       |  FROM events GROUP BY 1),
       |cell0 AS (
       |  SELECT e.event_type, user_id % 10 AS zone,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'On') AS n1,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'On' AND "value" > med) AS a,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'Off') AS n2,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'Off' AND "value" > med) AS c
       |  FROM events e JOIN med ON e.event_type = med.event_type
       |  GROUP BY 1, 2),
       |cell AS (
       |  SELECT *, n1 + n2 AS n, a + c AS m1 FROM cell0),
       |agg AS (
       |  SELECT event_type, COUNT(*) AS n_strata,
       |    CAST(SUM(a) AS BIGINT) AS sum_a,
       |    CAST(SUM(CAST($e AS DECIMAL(28,6))) AS DOUBLE) AS sum_e,
       |    CAST(SUM(CAST($v AS DECIMAL(28,6))) AS DOUBLE) AS sum_v
       |  FROM cell GROUP BY 1)
       |SELECT event_type, n_strata, sum_a,
       |  ${rSql("sum_e", 4)} AS e_a, ${rSql(chi, 4)} AS cmh_chi2,
       |  ${rSql(pTwoSidedNormalSql(s"sqrt($chi)"), 6)} AS p_value
       |FROM agg ORDER BY event_type""".stripMargin
  }

  // ------------------------------------------------ TOST equivalence test

  /** TOST equivalence test per event_type (two one-sided Welch t's):
    * "is the On−Off difference provably INSIDE ±δ?" — the question the
    * notebooks' A/A checks and non-inferiority calls actually ask,
    * which a non-significant ordinary t-test cannot answer. δ is 5% of
    * the Off-arm mean (data-derived, r6-pinned so both engines use the
    * identical margin); p_equiv = max of the two one-sided p's
    * (Schuirmann 1987), equivalent ⟺ p_equiv < 0.05.
    *
    * Scale: one map-side-combined moment aggregation; inference is
    * arithmetic on the |event_type| frame. */
  def tost(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    def nz(c: Column): Column = when(c =!= 0, c)
    val m = Tables.events(spark, dir)
      .select(col("event_type"), col("value"), onOff.as("g"))
      .groupBy("event_type")
      .agg(
        sum(when(col("g") === "On", 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") === "On", col("value").cast(d))).cast(DoubleType).as("s1"),
        sum(when(col("g") === "On", (col("value") * col("value")).cast(d))).cast(DoubleType).as("ss1"),
        sum(when(col("g") === "Off", 1L).otherwise(0L)).as("n2"),
        sum(when(col("g") === "Off", col("value").cast(d))).cast(DoubleType).as("s2"),
        sum(when(col("g") === "Off", (col("value") * col("value")).cast(d))).cast(DoubleType).as("ss2"))
      .withColumn("m1", col("s1") / col("n1"))
      .withColumn("m2", col("s2") / col("n2"))
      .withColumn("v1", (col("ss1") - col("s1") * col("s1") / col("n1")) / nz(col("n1") - 1))
      .withColumn("v2", (col("ss2") - col("s2") * col("s2") / col("n2")) / nz(col("n2") - 1))
      .withColumn("se", sqrt(col("v1") / col("n1") + col("v2") / col("n2")))
      .withColumn("df",
        pow(col("v1") / col("n1") + col("v2") / col("n2"), 2) /
          (pow(col("v1") / col("n1"), 2) / nz(col("n1") - 1) +
            pow(col("v2") / col("n2"), 2) / nz(col("n2") - 1)))
      .withColumn("delta", r6(abs(col("m2")) * 0.05))
      .withColumn("t_lo", (col("m1") - col("m2") + col("delta")) / nz(col("se")))
      .withColumn("t_hi", (col("delta") - (col("m1") - col("m2"))) / nz(col("se")))
    // one-sided upper-tail p from the two-sided helper:
    // p = two_sided(|t|)/2 when t ≥ 0, else 1 − two_sided(|t|)/2.
    def oneSided(t: Column): Column = {
      val two = expr(pTwoSidedTSql(
        "least(greatest(tt, -300.0), 300.0)", "df", spark = true))
      when(t >= 0, two / 2).otherwise(lit(1) - two / 2)
    }
    val withP = m
      .withColumn("tt", col("t_lo"))
      .withColumn("p_lo", oneSided(col("t_lo")))
      .drop("tt")
      .withColumn("tt", col("t_hi"))
      .withColumn("p_hi", oneSided(col("t_hi")))
      .drop("tt")
    // decide on the ROUNDED p (the q_gst discipline): the CF p's are
    // libm-dependent at the last ulp, so the flag must compare the
    // same r6 value both engines emit
    withP.select(col("event_type"),
        r4(col("m1") - col("m2")).as("diff"), col("delta"),
        r4(col("t_lo")).as("t_lower"), r4(col("t_hi")).as("t_upper"),
        r6(greatest(col("p_lo"), col("p_hi"))).as("p_equiv"),
        (r6(greatest(col("p_lo"), col("p_hi"))) < 0.05).as("equivalent"))
      .orderBy("event_type")
  }

  private val tostOracle = {
    def nzS(e: String) = s"NULLIF($e, 0)"
    val p2 = pTwoSidedTSql("least(greatest(tt, -300.0), 300.0)", "df", spark = false)
    s"""WITH m0 AS (
       |  SELECT event_type,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'On') AS n1,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'On') AS DOUBLE) AS s1,
       |    CAST(SUM(CAST("value" * "value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'On') AS DOUBLE) AS ss1,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'Off') AS n2,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'Off') AS DOUBLE) AS s2,
       |    CAST(SUM(CAST("value" * "value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'Off') AS DOUBLE) AS ss2
       |  FROM events GROUP BY 1),
       |m1 AS (
       |  SELECT event_type, s1 / n1 AS m1, s2 / n2 AS m2,
       |    (ss1 - s1 * s1 / n1) / ${nzS("n1 - 1")} AS v1,
       |    (ss2 - s2 * s2 / n2) / ${nzS("n2 - 1")} AS v2,
       |    n1, n2
       |  FROM m0),
       |m2 AS (
       |  SELECT event_type, m1, m2,
       |    sqrt(v1 / n1 + v2 / n2) AS se,
       |    pow(v1 / n1 + v2 / n2, 2) /
       |      (pow(v1 / n1, 2) / ${nzS("n1 - 1")} +
       |       pow(v2 / n2, 2) / ${nzS("n2 - 1")}) AS df,
       |    ${rSql("(abs(m2) * 0.05)", 6)} AS delta
       |  FROM m1),
       |m3 AS (
       |  SELECT event_type, m1, m2, delta, df,
       |    (m1 - m2 + delta) / ${nzS("se")} AS t_lo,
       |    (delta - (m1 - m2)) / ${nzS("se")} AS t_hi
       |  FROM m2),
       |plo AS (
       |  SELECT m3.*, CASE WHEN t_lo >= 0 THEN ($p2) / 2 ELSE 1 - ($p2) / 2 END AS p_lo
       |  FROM (SELECT m3.*, t_lo AS tt FROM m3) m3),
       |phi AS (
       |  SELECT plo.*, CASE WHEN t_hi >= 0 THEN ($p2) / 2 ELSE 1 - ($p2) / 2 END AS p_hi
       |  FROM (SELECT plo.* EXCLUDE (tt), t_hi AS tt FROM plo) plo)
       |SELECT event_type, ${rSql("(m1 - m2)", 4)} AS diff, delta,
       |  ${rSql("t_lo", 4)} AS t_lower, ${rSql("t_hi", 4)} AS t_upper,
       |  ${rSql("greatest(p_lo, p_hi)", 6)} AS p_equiv,
       |  (${rSql("greatest(p_lo, p_hi)", 6)} < 0.05) AS equivalent
       |FROM phi ORDER BY event_type""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("q_ks_test", ksTest, Some(ksTestOracle)),
    Op("q_spearman", spearman, Some(spearmanOracle)),
    Op("q_tost", tost, Some(tostOracle)),
    Op("q_prop_test", propTest, Some(propTestOracle)),
    Op("q_cmh", cmhTest, Some(cmhTestOracle)),
    Op("q_jackknife", jackknife, Some(jackknifeOracle)),
    Op("q_levene", levene, Some(leveneOracle)),
    Op("q_anova", anovaPosition, Some(anovaPositionOracle)),
    Op("q_histogram", histogram, Some(histogramOracle)),
    Op("q_fdr_bh", fdrBh, Some(fdrBhOracle)),
    Op("q_cuped", cuped, Some(cupedOracle)),
    Op("q_ntile", ntileQuartiles, Some(ntileQuartilesOracle)),
    Op("q_bootstrap_ci", (s, dir) => bootstrapCi(s, dir), Some(bootstrapCiOracle())),
    Op("q_permutation", (s, dir) => permutationTest(s, dir), Some(permutationOracle())),
    Op("q_winsorize", winsorize, Some(winsorizeOracle)),
    Op("q_ratio_delta", ratioDelta, Some(ratioDeltaOracle)),
    Op("q_msprt", msprt, Some(msprtOracle)),
    Op("q_crse", crse, Some(crseOracle)),
    Op("q_fpr_eval", (s, dir) => fprEval(s, dir), Some(fprEvalOracle())),
    Op("q_power_ztest", powerZtest, Some(powerZtestOracle)),
    Op("q_power_ttest", powerTtest, Some(powerTtestOracle)),
    Op("q_solve_n", solveN, Some(solveNOracle)),
    Op("q_aa_test", aaTest, Some(aaTestOracle)),
    Op("q_ttest_welch", ttestWelch, Some(ttestWelchOracle)),
    Op("q_mwu", mwu, Some(mwuOracle), headline = true),
    Op("q_ci_normal", ciNormal, Some(ciNormalOracle)),
    Op("q_quantiles", quantiles, Some(quantilesOracle)),
  )
}
