package graft.operators

import graft.{Op, Tables}
import graft.functions.Compat._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Causal-inference operators beyond the plain two-sample tests
  * (SURVEY.md §2 block B): difference-in-differences and covariate-
  * adjusted OLS — the standard upgrades a reference user reaches for
  * when the naive On/Off delta is confounded by time trends or known
  * covariates (the reference's notebooks fit `ols` with controls for
  * exactly this reason; its CUPED/CRSE cousins live in Stats.scala).
  *
  * Determinism (SURVEY §4): every moment is an exact DECIMAL sum of
  * integer-or-money-grained terms, converted to double ONCE, then
  * combined in a fixed expression order shared textually with the
  * oracle — bit-identical across partitionings and engines.
  *
  * Scale: both operators are single map-side-combined aggregations over
  * the fact table (one shuffle of |groups| rows); the DiD midpoint is a
  * one-row broadcast frame. Nothing collects to the driver.
  */
object Causal {

  private def onOff: Column =
    when((expr("unix_micros(date_trunc('hour', ts)) div 3600000000") +
      col("user_id") % 10) % 2 === 0, "On").otherwise("Off")

  private val onOffSql =
    "CASE WHEN ((epoch_us(date_trunc('hour', ts)) // 3600000000) + (user_id % 10)) % 2 = 0 THEN 'On' ELSE 'Off' END"

  /** Integer epoch-day of the event — pure integer arithmetic, so both
    * engines bucket identically. */
  private val epochDay = "(unix_micros(date_trunc('day', ts)) div 86400000000)"
  private val epochDaySql = "(epoch_us(date_trunc('day', ts)) // 86400000000)"

  // ------------------------------------------- difference-in-differences

  /** Difference-in-differences per event_type: split the observation
    * window at its data-derived midpoint day, treat the switchback On
    * arm as "treated", and report
    * did = (ȳ_on,post − ȳ_on,pre) − (ȳ_off,post − ȳ_off,pre)
    * with the four cell means, its pooled standard error
    * se = √(Σ s²ᵢ/nᵢ) over the four cells, and the t-statistic — the
    * trend-robust effect estimate when assignment correlates with time.
    *
    * The midpoint ((min_d + max_d + 1) / 2 in integer days) is computed
    * by a one-row aggregate and broadcast — no driver round-trip, same
    * value in the oracle's CTE.
    */
  def did(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value"), onOff.as("g"),
        expr(epochDay).as("day"))
    val mid = ev.agg(((min("day") + max("day") + 1) / 2).cast("long").as("mid_day"))
    val cells = ev.crossJoin(broadcast(mid))
      .withColumn("period", when(col("day") < col("mid_day"), "pre").otherwise("post"))
    def m(g: String, p: String, f: Column => Column, c: Column): Column =
      f(when(col("g") === g && col("period") === p, c))
    def cell(g: String, p: String): Seq[Column] = Seq(
      m(g, p, count, lit(1)).as(s"n_${g}_$p"),
      m(g, p, x => sum(x.cast(d)).cast(DoubleType), col("value")).as(s"s_${g}_$p"),
      m(g, p, x => sum(x.cast(d)).cast(DoubleType), col("value") * col("value")).as(s"ss_${g}_$p"))
    val aggs = cell("On", "pre") ++ cell("On", "post") ++
      cell("Off", "pre") ++ cell("Off", "post")
    val moments = cells.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
    // NULLIF-style guards on every cell divisor: a 0- or 1-row cell
    // divides by zero, where Spark returns NULL but DuckDB IEEE float
    // division returns NaN/inf — nulling the divisor makes both
    // engines agree (the whole row's stats degrade to NULL, which is
    // the honest answer for a degenerate cell)
    def nz(c: Column): Column = when(c =!= 0, c)
    def mean(g: String, p: String): Column = col(s"s_${g}_$p") / nz(col(s"n_${g}_$p"))
    // per-cell sample variance of the mean: s²/n with s² = (ss − s²/n)/(n−1)
    def varMean(g: String, p: String): Column =
      (col(s"ss_${g}_$p") - col(s"s_${g}_$p") * col(s"s_${g}_$p") / nz(col(s"n_${g}_$p"))) /
        nz(col(s"n_${g}_$p") - 1) / nz(col(s"n_${g}_$p"))
    val didEst = (mean("On", "post") - mean("On", "pre")) -
      (mean("Off", "post") - mean("Off", "pre"))
    val se = sqrt(varMean("On", "post") + varMean("On", "pre") +
      varMean("Off", "post") + varMean("Off", "pre"))
    moments.select(col("event_type"),
        col("n_On_pre"), col("n_On_post"), col("n_Off_pre"), col("n_Off_post"),
        r6(mean("On", "pre")).as("mean_on_pre"),
        r6(mean("On", "post")).as("mean_on_post"),
        r6(mean("Off", "pre")).as("mean_off_pre"),
        r6(mean("Off", "post")).as("mean_off_post"),
        r6(didEst).as("did"),
        r6(se).as("se"),
        r4(didEst / nz(se)).as("t_stat"))
      .orderBy("event_type")
  }

  private val didOracle = {
    def cell(g: String, p: String): String = {
      val f = s"FILTER (WHERE g = '$g' AND period = '$p')"
      s"""    COUNT(*) $f AS n_${g}_$p,
         |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) $f AS DOUBLE) AS s_${g}_$p,
         |    CAST(SUM(CAST("value" * "value" AS DECIMAL(28,6))) $f AS DOUBLE) AS ss_${g}_$p""".stripMargin
    }
    val aggs = Seq(cell("On", "pre"), cell("On", "post"),
      cell("Off", "pre"), cell("Off", "post")).mkString(",\n")
    def mean(g: String, p: String) = s"(s_${g}_$p / NULLIF(n_${g}_$p, 0))"
    def varMean(g: String, p: String) =
      s"((ss_${g}_$p - s_${g}_$p * s_${g}_$p / NULLIF(n_${g}_$p, 0)) / NULLIF(n_${g}_$p - 1, 0) / NULLIF(n_${g}_$p, 0))"
    val didEst = s"((${mean("On", "post")} - ${mean("On", "pre")}) - " +
      s"(${mean("Off", "post")} - ${mean("Off", "pre")}))"
    val se = s"sqrt(${varMean("On", "post")} + ${varMean("On", "pre")} + " +
      s"${varMean("Off", "post")} + ${varMean("Off", "pre")})"
    s"""WITH ev AS (
       |  SELECT event_type, "value", $onOffSql AS g, $epochDaySql AS d
       |  FROM events),
       |mid AS (SELECT CAST((MIN(d) + MAX(d) + 1) // 2 AS BIGINT) AS mid_day FROM ev),
       |cells AS (
       |  SELECT event_type, "value", g,
       |    CASE WHEN d < mid_day THEN 'pre' ELSE 'post' END AS period
       |  FROM ev CROSS JOIN mid),
       |moments AS (
       |  SELECT event_type,
       |$aggs
       |  FROM cells GROUP BY event_type)
       |SELECT event_type, n_On_pre, n_On_post, n_Off_pre, n_Off_post,
       |  ${rSql(mean("On", "pre"), 6)} AS mean_on_pre,
       |  ${rSql(mean("On", "post"), 6)} AS mean_on_post,
       |  ${rSql(mean("Off", "pre"), 6)} AS mean_off_pre,
       |  ${rSql(mean("Off", "post"), 6)} AS mean_off_post,
       |  ${rSql(didEst, 6)} AS did,
       |  ${rSql(se, 6)} AS se,
       |  ${rSql(s"($didEst / NULLIF($se, 0))", 4)} AS t_stat
       |FROM moments ORDER BY event_type""".stripMargin
  }

  // ------------------------------------------- covariate-adjusted OLS

  /** OLS of value on [1, treated, x] per event_type, where `treated` is
    * the switchback On dummy and x = user_id % 10 is the known user-
    * level covariate the assignment hashes on — the "ols with controls"
    * fit the reference's analysis notebooks run. Solves the 3×3 normal
    * equations XᵀXβ = Xᵀy by Cramer's rule on decimal-exact moments
    * (x and treated are small integers, y is money-grained, so every
    * XᵀX / Xᵀy entry is EXACT; the determinant arithmetic then runs in
    * double with textually identical expression order in both engines).
    * Reports β, the treatment effect's homoskedastic se, and R².
    *
    * One map-side-combined aggregation — 9 moment columns, |groups|
    * output rows; nothing iterative, nothing driver-side.
    */
  def olsMulti(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value"),
        when(onOff === "On", 1L).otherwise(0L).as("t"),
        (col("user_id") % 10).cast("long").as("x"))
    def ds(c: Column): Column = sum(c.cast(d)).cast(DoubleType)
    val moments = ev.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum("t").as("st"), sum("x").as("sx"),
      sum(col("t") * col("x")).as("stx"),
      sum(col("t") * col("t")).as("stt"),
      sum(col("x") * col("x")).as("sxx"),
      ds(col("value")).as("sy"),
      ds(col("value") * col("t")).as("sty"),
      ds(col("value") * col("x")).as("sxy"),
      ds(col("value") * col("value")).as("syy"))
    // Cramer's rule on A = [[n,st,sx],[st,stt,stx],[sx,stx,sxx]],
    // b = [sy,sty,sxy]; every cofactor spelled in one fixed order.
    val D = expr(olsDet("n", "st", "sx", "st", "stt", "stx", "sx", "stx", "sxx"))
    val D0 = expr(olsDet("sy", "st", "sx", "sty", "stt", "stx", "sxy", "stx", "sxx"))
    val D1 = expr(olsDet("n", "sy", "sx", "st", "sty", "stx", "sx", "sxy", "sxx"))
    val D2 = expr(olsDet("n", "st", "sy", "st", "stt", "sty", "sx", "stx", "sxy"))
    // nz on every divisor (the did/hte discipline): a <=2-row group
    // makes the design matrix exactly singular (D = 0) and a 3-row
    // group zeroes the dof — NULL stats in both engines, never an
    // ANSI divide error
    def nz(c: Column): Column = when(c =!= 0, c)
    val b0 = D0 / nz(D); val b1 = D1 / nz(D); val b2 = D2 / nz(D)
    // SSE = Σy² − βᵀXᵀy (fixed order); R² = 1 − SSE/SST
    val sse = col("syy") - (b0 * col("sy") + b1 * col("sty") + b2 * col("sxy"))
    val sst = col("syy") - col("sy") * col("sy") / col("n")
    val sigma2 = sse / nz(col("n") - 3)
    // var(β₁) = σ²·(A⁻¹)₁₁ = σ²·cof₁₁/D with cof₁₁ = n·sxx − sx²
    val seT = sqrt(sigma2 * (col("n") * col("sxx") - col("sx") * col("sx")) / nz(D))
    moments.select(col("event_type"), col("n"),
        r6(b0).as("beta0"), r6(b1).as("beta_treat"), r6(b2).as("beta_x"),
        r6(seT).as("se_treat"), r4(b1 / nz(seT)).as("t_treat"),
        r4(lit(1.0) - sse / nz(sst)).as("r2"))
      .orderBy("event_type")
  }

  /** 3×3 determinant, fixed cofactor-expansion order (first row). */
  private def olsDet(a: String, b: String, c: String,
      d: String, e: String, f: String,
      g: String, h: String, i: String): String =
    s"(CAST($a AS DOUBLE) * (CAST($e AS DOUBLE) * CAST($i AS DOUBLE) - CAST($f AS DOUBLE) * CAST($h AS DOUBLE)) " +
      s"- CAST($b AS DOUBLE) * (CAST($d AS DOUBLE) * CAST($i AS DOUBLE) - CAST($f AS DOUBLE) * CAST($g AS DOUBLE)) " +
      s"+ CAST($c AS DOUBLE) * (CAST($d AS DOUBLE) * CAST($h AS DOUBLE) - CAST($e AS DOUBLE) * CAST($g AS DOUBLE)))"

  private val olsMultiOracle = {
    val D = olsDet("n", "st", "sx", "st", "stt", "stx", "sx", "stx", "sxx")
    val D0 = olsDet("sy", "st", "sx", "sty", "stt", "stx", "sxy", "stx", "sxx")
    val D1 = olsDet("n", "sy", "sx", "st", "sty", "stx", "sx", "sxy", "sxx")
    val D2 = olsDet("n", "st", "sy", "st", "stt", "sty", "sx", "stx", "sxy")
    val b0 = s"($D0 / NULLIF($D, 0))"; val b1 = s"($D1 / NULLIF($D, 0))"
    val b2 = s"($D2 / NULLIF($D, 0))"
    val sse = s"(syy - ($b0 * sy + $b1 * sty + $b2 * sxy))"
    val sst = "(syy - sy * sy / n)"
    val sigma2 = s"($sse / NULLIF(n - 3, 0))"
    val seT = s"sqrt($sigma2 * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / NULLIF($D, 0))"
    s"""WITH ev AS (
       |  SELECT event_type, "value",
       |    CASE WHEN $onOffSql = 'On' THEN 1 ELSE 0 END AS t,
       |    user_id % 10 AS x
       |  FROM events),
       |moments AS (
       |  SELECT event_type, COUNT(*) AS n,
       |    CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(x) AS BIGINT) AS sx,
       |    CAST(SUM(t * x) AS BIGINT) AS stx,
       |    CAST(SUM(t * t) AS BIGINT) AS stt,
       |    CAST(SUM(x * x) AS BIGINT) AS sxx,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST("value" * t AS DECIMAL(28,6))) AS DOUBLE) AS sty,
       |    CAST(SUM(CAST("value" * x AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
       |    CAST(SUM(CAST("value" * "value" AS DECIMAL(28,6))) AS DOUBLE) AS syy
       |  FROM ev GROUP BY event_type)
       |SELECT event_type, n,
       |  ${rSql(b0, 6)} AS beta0, ${rSql(b1, 6)} AS beta_treat,
       |  ${rSql(b2, 6)} AS beta_x,
       |  ${rSql(seT, 6)} AS se_treat, ${rSql(s"($b1 / NULLIF($seT, 0))", 4)} AS t_treat,
       |  ${rSql(s"(1.0 - $sse / NULLIF($sst, 0))", 4)} AS r2
       |FROM moments ORDER BY event_type""".stripMargin
  }

  // ------------------------------------- heterogeneous treatment effects

  /** Conditional average treatment effects (CATE) per segment: the
    * On−Off lift re-estimated within every event_type × zone cell, with
    * its own standard error and t — the heterogeneity readout that
    * tells an experimenter WHERE the effect lives (the reference's
    * per-zone switchback design makes zone the natural segment; its
    * notebooks slice exactly this way before pooling). Degenerate
    * cells (0/1 rows in an arm) NULLIF-guard every divisor in both
    * engines — the q_did discipline — so sparse segments agree
    * cross-engine instead of diverging NULL-vs-NaN.
    *
    * Scale: one map-side-combined moment aggregation keyed on
    * (event_type, zone) — |segments| result rows; nothing else. */
  def hte(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    def nz(c: Column): Column = when(c =!= 0, c)
    val m = Tables.events(spark, dir)
      .select(col("event_type"), (col("user_id") % 10).as("zone"),
        col("value"), onOff.as("g"))
      .groupBy("event_type", "zone")
      .agg(
        sum(when(col("g") === "On", 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") === "On", col("value").cast(d))).cast(DoubleType).as("s1"),
        sum(when(col("g") === "On", (col("value") * col("value")).cast(d))).cast(DoubleType).as("ss1"),
        sum(when(col("g") === "Off", 1L).otherwise(0L)).as("n2"),
        sum(when(col("g") === "Off", col("value").cast(d))).cast(DoubleType).as("s2"),
        sum(when(col("g") === "Off", (col("value") * col("value")).cast(d))).cast(DoubleType).as("ss2"),
      )
    val v1 = (col("ss1") - col("s1") * col("s1") / nz(col("n1"))) /
      nz(col("n1") - 1) / nz(col("n1"))
    val v2 = (col("ss2") - col("s2") * col("s2") / nz(col("n2"))) /
      nz(col("n2") - 1) / nz(col("n2"))
    val cate = col("s1") / nz(col("n1")) - col("s2") / nz(col("n2"))
    val se = sqrt(v1 + v2)
    m.select(col("event_type"), col("zone"), col("n1").as("n_on"), col("n2").as("n_off"),
        r4(cate).as("cate"), r4(se).as("se"), r4(cate / nz(se)).as("t"))
      .orderBy("event_type", "zone")
  }

  private val hteOracle = {
    def nzS(e: String) = s"NULLIF($e, 0)"
    val v1 = s"((ss1 - s1 * s1 / ${nzS("n1")}) / ${nzS("n1 - 1")} / ${nzS("n1")})"
    val v2 = s"((ss2 - s2 * s2 / ${nzS("n2")}) / ${nzS("n2 - 1")} / ${nzS("n2")})"
    val cate = s"(s1 / ${nzS("n1")} - s2 / ${nzS("n2")})"
    val se = s"sqrt($v1 + $v2)"
    s"""WITH m AS (
       |  SELECT event_type, user_id % 10 AS zone,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'On') AS n1,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'On') AS DOUBLE) AS s1,
       |    CAST(SUM(CAST("value" * "value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'On') AS DOUBLE) AS ss1,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'Off') AS n2,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'Off') AS DOUBLE) AS s2,
       |    CAST(SUM(CAST("value" * "value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'Off') AS DOUBLE) AS ss2
       |  FROM events GROUP BY 1, 2)
       |SELECT event_type, zone, n1 AS n_on, n2 AS n_off,
       |  ${rSql(cate, 4)} AS cate, ${rSql(se, 4)} AS se,
       |  ${rSql(s"($cate / NULLIF($se, 0))", 4)} AS t
       |FROM m ORDER BY event_type, zone""".stripMargin
  }

  // ------------------------------------------ inverse propensity weighting

  /** Inverse-propensity-weighted treatment effect with stratified
    * propensities: within each event_type stratum the propensity
    * ê_s = n_treated/n, and the overall (Horvitz–Thompson) arms are
    * μ̂₁ = (1/N)·Σ_s (Σ t·y)/ê_s and μ̂₀ = (1/N)·Σ_s (Σ (1−t)·y)/(1−ê_s)
    * — the standardization estimator that reweights each stratum back
    * to the full population when treatment shares differ by stratum
    * (the notebooks' "control for segment mix" concern as a first-class
    * estimator). Per-stratum rows carry the raw cell means beside the
    * ALL row's reweighted readout.
    *
    * Determinism: cell sums are exact DECIMAL; every per-stratum
    * reweighted term is r6-rounded THEN DECIMAL-summed across strata;
    * all divisions NULLIF-guarded so degenerate cells yield NULL
    * identically in both engines.
    *
    * Scale: ONE map-side-combined aggregation over the fact table (the
    * only shuffle, |strata| rows out); the ALL row folds the stratum
    * frame. Nothing collects to the driver. */
  def ipw(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    val st = Tables.events(spark, dir)
      .select(col("event_type"), col("value"),
        when(onOff === "On", 1L).otherwise(0L).as("t"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("t")).as("n1"),
        sum(when(col("t") === 1, col("value")).cast(d)).cast(DoubleType).as("s1"),
        sum(when(col("t") === 0, col("value")).cast(d)).cast(DoubleType).as("s0"))
    val per = st.select(
      col("event_type").as("stratum"), col("n"), col("n1").as("n_treated"),
      r6(col("n1") / col("n")).as("e_hat"),
      r4(expr("s1 / NULLIF(n1, 0)")).as("mu1"),
      r4(expr("s0 / NULLIF(n - n1, 0)")).as("mu0"),
      r4(expr("s1 / NULLIF(n1, 0) - s0 / NULLIF(n - n1, 0)")).as("ate"))
    val all = st
      .withColumn("e", r6(col("n1") / col("n")))
      .withColumn("w1", r6(col("s1") / expr("NULLIF(e, 0.0)")))
      .withColumn("w0", r6(col("s0") / expr("NULLIF(1.0 - e, 0.0)")))
      .agg(sum("n").as("n"), sum("n1").as("n_treated"),
        sum(col("w1").cast(d)).cast(DoubleType).as("sw1"),
        sum(col("w0").cast(d)).cast(DoubleType).as("sw0"))
      .select(lit("ALL").as("stratum"), col("n"), col("n_treated"),
        r6(col("n_treated") / col("n")).as("e_hat"),
        r4(col("sw1") / col("n")).as("mu1"),
        r4(col("sw0") / col("n")).as("mu0"),
        r4(r4(col("sw1") / col("n")) - r4(col("sw0") / col("n"))).as("ate"))
    per.unionByName(all).orderBy("stratum")
  }

  private val ipwOracle: String = {
    val mu1 = "(s1 / NULLIF(n1, 0))"
    val mu0 = "(s0 / NULLIF(n - n1, 0))"
    s"""WITH base AS (
       |  SELECT event_type, "value",
       |    CASE WHEN $onOffSql = 'On' THEN 1 ELSE 0 END AS t
       |  FROM events),
       |st AS (
       |  SELECT event_type, COUNT(*) AS n, CAST(SUM(t) AS BIGINT) AS n1,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE t = 1) AS DOUBLE) AS s1,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE t = 0) AS DOUBLE) AS s0
       |  FROM base GROUP BY 1),
       |per AS (
       |  SELECT event_type AS stratum, n, n1 AS n_treated,
       |    ${rSql("(n1 / n)", 6)} AS e_hat,
       |    ${rSql(mu1, 4)} AS mu1,
       |    ${rSql(mu0, 4)} AS mu0,
       |    ${rSql(s"($mu1 - $mu0)", 4)} AS ate
       |  FROM st),
       |allr AS (
       |  SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(n1) AS BIGINT) AS n_treated,
       |    CAST(SUM(CAST(${rSql("(s1 / NULLIF(e, 0.0))", 6)} AS DECIMAL(28,6))) AS DOUBLE) AS sw1,
       |    CAST(SUM(CAST(${rSql("(s0 / NULLIF(1.0 - e, 0.0))", 6)} AS DECIMAL(28,6))) AS DOUBLE) AS sw0
       |  FROM (SELECT st.*, ${rSql("(n1 / n)", 6)} AS e FROM st))
       |SELECT stratum, n, n_treated, e_hat, mu1, mu0, ate FROM per
       |UNION ALL
       |SELECT 'ALL' AS stratum, n, n_treated,
       |  ${rSql("(n_treated / n)", 6)} AS e_hat,
       |  ${rSql("(sw1 / n)", 4)} AS mu1,
       |  ${rSql("(sw0 / n)", 4)} AS mu0,
       |  ${rSql(s"(${rSql("(sw1 / n)", 4)} - ${rSql("(sw0 / n)", 4)})", 4)} AS ate
       |FROM allr
       |ORDER BY stratum""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("q_did", did, Some(didOracle)),
    Op("q_ipw", ipw, Some(ipwOracle)),
    Op("q_ols_multi", olsMulti, Some(olsMultiOracle)),
    Op("q_hte", hte, Some(hteOracle)),
  )
}
