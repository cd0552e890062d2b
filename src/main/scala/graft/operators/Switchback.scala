package graft.operators

import graft.{Op, Tables}
import graft.functions.Compat._
import graft.functions.StatFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Switchback-experiment analytics (SURVEY.md §2 block B, part 1).
  *
  * The reference assigns treatment by time slice ("even/odd day",
  * automated_script.sql:208) and aggregates KPIs per test × On/Off group
  * (py_scripts/automated_switchback_test_analysis_script.py:104-133).
  * Here the switchback window is 1 hour (the repo's README §4 finding)
  * and assignment is the parity of (hour index + zone), i.e. randomized
  * by time-of-day AND geographical zone exactly as the reference's
  * research concluded (README §4 point 1).
  *
  * Scale: assignment is a pure per-row expression (no shuffle);
  * aggregations are partial-agg friendly; window-level rollups shuffle
  * once on (event_type, window).
  */
object Switchback {

  /** Divisor guard: NULL on a zero divisor in both engines, never an
    * ANSI divide error (the tost/propTest discipline, object-hoisted). */
  private def nzW(c: Column): Column = when(c =!= 0, c)

  /** Clamp a rounding-residue-negative variance at 0 before sqrt:
    * Spark's sqrt(−ε) is NaN but DuckDB's hard-errors. CASE rather
    * than greatest — so a NULL variance stays NULL in both engines. */
  private def pos(c: Column): Column = when(c < 0, lit(0.0)).otherwise(c)
  private def posSql(e: String) = s"(CASE WHEN $e < 0 THEN 0.0 ELSE $e END)"

  /** Hour-index of the switchback window an event falls into. */
  private def hourIdx: Column =
    expr("unix_micros(date_trunc('hour', ts)) div 3600000000")

  private def zoneId: Column = col("user_id") % 10

  /** 'On'/'Off' switchback assignment: parity of hour-index + zone. */
  private def onOff: Column =
    when((hourIdx + zoneId) % 2 === 0, "On").otherwise("Off")

  private val onOffSql =
    "CASE WHEN ((epoch_us(date_trunc('hour', ts)) // 3600000000) + (user_id % 10)) % 2 = 0 THEN 'On' ELSE 'Off' END"

  /** Per-event switchback window assignment (window start, zone, group). */
  def sbAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        date_trunc("hour", col("ts")).as("window_start"),
        zoneId.as("zone_id"),
        onOff.as("on_off"),
      )
      .orderBy("event_id")

  private val sbAssignOracle =
    s"""SELECT event_id, date_trunc('hour', ts) AS window_start,
       |  user_id % 10 AS zone_id, $onOffSql AS on_off
       |FROM events ORDER BY event_id""".stripMargin

  /** Per-group per-order means and totals of the KPIs — the analysis
    * script's step 5 (…analysis_script.py:124-129), with `value` and the
    * props `k` playing the role of the money/logistics KPI columns. */
  def sbMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("on_off", onOff)
      // empty-string guard: see Relational.regexpExtract — an unmatched
      // props row must be NULL, not an ANSI cast error. Inline (no helper
      // column): a leftover k_str would leak through a future star-select
      // or union-by-position; codegen's subexpression elimination shares
      // the two regexp_extract calls.
      .withColumn("k", when(regexp_extract(col("props"), "\"k\": (\\d+)", 1) =!= "",
        regexp_extract(col("props"), "\"k\": (\\d+)", 1)).cast("int"))
      .groupBy("event_type", "on_off")
      .agg(
        count(lit(1)).as("n_orders"),
        r2(avgMoney(col("value"))).as("value_per_order"),
        sumMoney(col("value")).as("value_total"),
        r2(sum(col("k")).cast(DoubleType) / count(lit(1))).as("k_per_order"),
        sum(col("k")).cast("long").as("k_total"),
      )
      .orderBy("event_type", "on_off")

  private val sbMetricsOracle =
    s"""SELECT event_type, $onOffSql AS on_off,
       |  COUNT(*) AS n_orders,
       |  (sign(CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) * floor(abs(CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) * 1e2 + 0.5) / 1e2) AS value_per_order,
       |  CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS value_total,
       |  (sign(CAST(SUM(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT)) AS DOUBLE) / COUNT(*)) * floor(abs(CAST(SUM(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT)) AS DOUBLE) / COUNT(*)) * 1e2 + 0.5) / 1e2) AS k_per_order,
       |  CAST(SUM(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT)) AS BIGINT) AS k_total
       |FROM events GROUP BY 1, 2 ORDER BY event_type, on_off""".stripMargin

  /** Counterpart method (notebooks/switchback_analysis/counterpart_method
    * .ipynb): pair each On window with the next Off window of the same
    * stream and emit the per-window mean delta. */
  def counterpart(spark: SparkSession, dir: String): DataFrame =
    counterpartPairs(spark, dir)
      .select(col("event_type"), col("zone_id"), col("window_start"),
        r4(col("wmean")).as("on_mean"),
        r4(col("next_wmean")).as("off_mean"),
        r4(col("wmean") - col("next_wmean")).as("delta"))
      .orderBy("event_type", "zone_id", "window_start")

  /** The On→Off adjacent-window pairing shared by q_counterpart and
    * q_counterpart_ttest — pair within (event_type, zone): a zone's
    * consecutive hourly windows alternate On/Off, so the next window
    * is always the counterpart. ONE construction, so the t-test can
    * never run on different pairs than the deltas it claims to test. */
  private def counterpartPairs(spark: SparkSession, dir: String): DataFrame = {
    val perWindow = Tables.events(spark, dir)
      .withColumn("on_off", onOff)
      .groupBy(col("event_type"), zoneId.as("zone_id"),
        date_trunc("hour", col("ts")).as("window_start"), col("on_off"))
      .agg((sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType) /
        count(lit(1))).as("wmean"))
    val w = Window.partitionBy("event_type", "zone_id").orderBy("window_start")
    perWindow
      .withColumn("next_on_off", lead("on_off", 1).over(w))
      .withColumn("next_wmean", lead("wmean", 1).over(w))
      .filter(col("on_off") === "On" && col("next_on_off") === "Off")
  }

  private val counterpartOracle =
    s"""WITH per_window AS (
       |  SELECT event_type, user_id % 10 AS zone_id, date_trunc('hour', ts) AS window_start, $onOffSql AS on_off,
       |    CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS wmean
       |  FROM events GROUP BY 1, 2, 3, 4),
       |paired AS (
       |  SELECT event_type, zone_id, window_start, on_off, wmean,
       |    LEAD(on_off) OVER (PARTITION BY event_type, zone_id ORDER BY window_start) AS next_on_off,
       |    LEAD(wmean) OVER (PARTITION BY event_type, zone_id ORDER BY window_start) AS next_wmean
       |  FROM per_window)
       |SELECT event_type, zone_id, window_start, (sign(wmean) * floor(abs(wmean) * 1e4 + 0.5) / 1e4) AS on_mean,
       |  (sign(next_wmean) * floor(abs(next_wmean) * 1e4 + 0.5) / 1e4) AS off_mean, (sign(wmean - next_wmean) * floor(abs(wmean - next_wmean) * 1e4 + 0.5) / 1e4) AS delta
       |FROM paired WHERE on_off = 'On' AND next_on_off = 'Off'
       |ORDER BY event_type, zone_id, window_start""".stripMargin

  /** Sample-ratio-mismatch chi-square: is the On/Off split 50/50?
    * (The A/A sanity checks in data_extraction_queries_aa_tests….sql.) */
  def srmChisq(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("on_off", onOff)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("on_off") === "On", 1L).otherwise(0L)).as("n_on"),
      )
      .withColumn("n_off", col("n") - col("n_on"))
      .withColumn("chisq", r4(
        (col("n_on") - col("n") / 2.0) * (col("n_on") - col("n") / 2.0) / (col("n") / 2.0) +
          (col("n_off") - col("n") / 2.0) * (col("n_off") - col("n") / 2.0) / (col("n") / 2.0)))
      .select("event_type", "n", "n_on", "n_off", "chisq")
      .orderBy("event_type")

  private val srmChisqOracle =
    s"""WITH counts AS (
       |  SELECT event_type, COUNT(*) AS n,
       |    SUM(CASE WHEN $onOffSql = 'On' THEN 1 ELSE 0 END) AS n_on
       |  FROM events GROUP BY 1)
       |SELECT event_type, n, CAST(n_on AS BIGINT) AS n_on, CAST(n - n_on AS BIGINT) AS n_off,
       |  (sign((n_on - n/2.0)*(n_on - n/2.0)/(n/2.0) + ((n - n_on) - n/2.0)*((n - n_on) - n/2.0)/(n/2.0)) * floor(abs((n_on - n/2.0)*(n_on - n/2.0)/(n/2.0) + ((n - n_on) - n/2.0)*((n - n_on) - n/2.0)/(n/2.0)) * 1e4 + 0.5) / 1e4) AS chisq
       |FROM counts ORDER BY event_type""".stripMargin

  /** Propagation-effect analysis (notebooks/propagation_effect_analysis
    * .ipynb; README §4 point 3 — "the effect is felt after 1-2 hours"):
    * with 4-hour switchback blocks, measure the On−Off delta at each
    * hour-position within the block. A ramp across positions 0→3 is
    * the treatment effect propagating through the ecosystem. */
  def propagation(spark: SparkSession, dir: String): DataFrame = {
    val blockIdx = expr("(unix_micros(date_trunc('hour', ts)) div 3600000000) div 4")
    val position = expr("(unix_micros(date_trunc('hour', ts)) div 3600000000) % 4")
    val grp = when((blockIdx + zoneId) % 2 === 0, "On").otherwise("Off")
    Tables.events(spark, dir)
      .withColumn("position_in_window", position)
      .withColumn("grp", grp)
      .groupBy("position_in_window", "grp")
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType) /
          count(lit(1))).as("mean_raw"))
      .groupBy("position_in_window")
      .pivot("grp", Seq("On", "Off"))
      .agg(first(r4(col("mean_raw"))).as("mean"), first(col("n")).as("n"))
      .select(col("position_in_window"),
        col("On_mean").as("on_mean"), col("Off_mean").as("off_mean"),
        col("On_n").as("n_on"), col("Off_n").as("n_off"),
        r4(col("On_mean") - col("Off_mean")).as("delta"))
      .orderBy("position_in_window")
  }

  private val propagationOracle = {
    val blockOnOff =
      "CASE WHEN (((epoch_us(date_trunc('hour', ts)) // 3600000000) // 4) + (user_id % 10)) % 2 = 0 THEN 'On' ELSE 'Off' END"
    s"""WITH per_pos AS (
       |  SELECT (epoch_us(date_trunc('hour', ts)) // 3600000000) % 4 AS position_in_window,
       |    $blockOnOff AS grp, COUNT(*) AS n,
       |    CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS mean_raw
       |  FROM events GROUP BY 1, 2)
       |SELECT position_in_window,
       |  MAX(CASE WHEN grp = 'On' THEN ${rSql("mean_raw", 4)} END) AS on_mean,
       |  MAX(CASE WHEN grp = 'Off' THEN ${rSql("mean_raw", 4)} END) AS off_mean,
       |  MAX(CASE WHEN grp = 'On' THEN n END) AS n_on,
       |  MAX(CASE WHEN grp = 'Off' THEN n END) AS n_off,
       |  ${rSql(s"MAX(CASE WHEN grp = 'On' THEN ${rSql("mean_raw", 4)} END) - MAX(CASE WHEN grp = 'Off' THEN ${rSql("mean_raw", 4)} END)", 4)} AS delta
       |FROM per_pos GROUP BY 1 ORDER BY position_in_window""".stripMargin
  }

  /** Switchback window-size sweep — the reference's central research
    * question (README §4 point 2: "the best switchback window size is
    * 1 hour"; notebooks compare 1d/12h/2h/1h). For each candidate
    * window size, re-derive the On/Off assignment from that size's
    * block parity and measure the detected On−Off delta: smaller
    * windows wash out carryover but shrink per-window samples. */
  def windowSweep(spark: SparkSession, dir: String): DataFrame = {
    // uses the object's canonical hourIdx — a shadowed local copy here
    // previously risked silently diverging from every other operator's
    // assignment if the shared definition ever changed
    Tables.events(spark, dir)
      .withColumn("window_hours", explode(array(lit(1), lit(2), lit(4), lit(8))))
      .withColumn("grp",
        when((floor(hourIdx / col("window_hours")) + zoneId) % 2 === 0, "On")
          .otherwise("Off"))
      .groupBy("window_hours")
      .agg(
        sum(when(col("grp") === "On", 1L).otherwise(0L)).as("n_on"),
        sum(when(col("grp") === "Off", 1L).otherwise(0L)).as("n_off"),
        sum(when(col("grp") === "On", col("value").cast(DecimalType(28, 6))))
          .cast(DoubleType).as("s_on"),
        sum(when(col("grp") === "Off", col("value").cast(DecimalType(28, 6))))
          .cast(DoubleType).as("s_off"),
      )
      .select(col("window_hours"), col("n_on"), col("n_off"),
        r4(col("s_on") / col("n_on")).as("on_mean"),
        r4(col("s_off") / col("n_off")).as("off_mean"),
        r4(col("s_on") / col("n_on") - col("s_off") / col("n_off")).as("delta"))
      .orderBy("window_hours")
  }

  private val windowSweepOracle = {
    val grp =
      """CASE WHEN (CAST(floor((epoch_us(date_trunc('hour', ts)) // 3600000000) / wh) AS BIGINT) + (user_id % 10)) % 2 = 0
        | THEN 'On' ELSE 'Off' END""".stripMargin.replace("\n", "")
    s"""WITH sized AS (
       |  SELECT unnest([1, 2, 4, 8]) AS wh, * FROM events),
       |tagged AS (
       |  SELECT wh AS window_hours, "value", $grp AS grp FROM sized),
       |agg AS (
       |  SELECT window_hours,
       |    COUNT(*) FILTER (WHERE grp = 'On') AS n_on,
       |    COUNT(*) FILTER (WHERE grp = 'Off') AS n_off,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE grp = 'On') AS DOUBLE) AS s_on,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE grp = 'Off') AS DOUBLE) AS s_off
       |  FROM tagged GROUP BY 1)
       |SELECT window_hours, n_on, n_off,
       |  ${rSql("s_on / n_on", 4)} AS on_mean,
       |  ${rSql("s_off / n_off", 4)} AS off_mean,
       |  ${rSql("s_on / n_on - s_off / n_off", 4)} AS delta
       |FROM agg ORDER BY window_hours""".stripMargin
  }

  /** Margin-of-error sweep with outlier-unit filtering — the
    * reference's Step 11 (deep_dive_analyses.ipynb,
    * std_error_for_diff_sb_intervals_func): for each switchback
    * interval size, aggregate the metric per assignment UNIT
    * (time window × zone), drop outlier units by the 1.5·IQR fences
    * over unit means, then report the per-treatment std-dev of unit
    * means scaled by √(windows-per-day) — how the notebooks compare
    * the noise floor of candidate interval sizes.
    *
    * Determinism: unit means are decimal-exact and r6-rounded before
    * the second-stage moments (again decimal-exact), so fences and
    * std devs are partition-invariant. Scale: stage 1 shuffles the
    * fact table once on (wh, window, zone); every later stage runs
    * over |units| rows (~|hours|·|zones| per sweep size). */
  def stderrSweep(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(28, 6); val d12 = DecimalType(30, 12)
    val units = Tables.events(spark, dir)
      .withColumn("window_hours", explode(array(lit(1), lit(2), lit(4), lit(8))))
      .withColumn("widx", floor(hourIdx / col("window_hours")))
      .withColumn("zone_id", zoneId)
      .withColumn("grp",
        when((col("widx") + col("zone_id")) % 2 === 0, "On").otherwise("Off"))
      .groupBy("window_hours", "widx", "zone_id", "grp")
      .agg(r6(sum(col("value").cast(d6)).cast(DoubleType) / count(lit(1))).as("um"))
    val fences = units.groupBy("window_hours")
      .agg(expr("percentile(um, 0.25)").as("q1"), expr("percentile(um, 0.75)").as("q3"))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
      .select("window_hours", "lo", "hi")
    units.join(broadcast(fences), Seq("window_hours"))
      .groupBy("window_hours", "grp")
      .agg(count(lit(1)).as("n_units"),
        sum(when(col("um") >= col("lo") && col("um") <= col("hi"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("um") >= col("lo") && col("um") <= col("hi"), col("um").cast(d6)))
          .cast(DoubleType).as("sm"),
        sum(when(col("um") >= col("lo") && col("um") <= col("hi"),
          (col("um") * col("um")).cast(d12))).cast(DoubleType).as("smm"))
      .select(col("window_hours"), col("grp"), col("n_units"), col("n_kept"),
        // nzW: a cell keeping exactly 1 unit after fencing must yield
        // NULL (both engines), not an ANSI divide error; pos: the
        // decimal-rounded second moment can sit ~1e-13 negative
        pos((col("smm") - col("sm") * col("sm") / col("n_kept")) /
          nzW(col("n_kept") - 1)).as("v_raw"))
      .select(col("window_hours"), col("grp"), col("n_units"), col("n_kept"),
        r6(sqrt(col("v_raw"))).as("unit_std"),
        // ÷ √(windows per day): the notebooks' x / np.sqrt(24 / value)
        r6(sqrt(col("v_raw")) / sqrt(lit(24.0) / col("window_hours"))).as("se_scaled"))
      .orderBy("window_hours", "grp")
  }

  private val stderrSweepOracle = {
    val widx = "CAST(floor((epoch_us(date_trunc('hour', ts)) // 3600000000) / wh) AS BIGINT)"
    s"""WITH sized AS (
       |  SELECT unnest([1, 2, 4, 8]) AS wh, * FROM events),
       |units AS (
       |  SELECT wh AS window_hours, $widx AS widx, user_id % 10 AS zone_id,
       |    CASE WHEN ($widx + (user_id % 10)) % 2 = 0 THEN 'On' ELSE 'Off' END AS grp,
       |    ${rSql("CAST(SUM(CAST(\"value\" AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)", 6)} AS um
       |  FROM sized GROUP BY 1, 2, 3, 4),
       |fences AS (
       |  SELECT window_hours,
    |    quantile_cont(um, 0.25) - (quantile_cont(um, 0.75) - quantile_cont(um, 0.25)) * 1.5 AS lo,
       |    quantile_cont(um, 0.75) + (quantile_cont(um, 0.75) - quantile_cont(um, 0.25)) * 1.5 AS hi
       |  FROM units GROUP BY 1),
       |agg AS (
       |  SELECT u.window_hours, u.grp, COUNT(*) AS n_units,
       |    COUNT(*) FILTER (WHERE um >= lo AND um <= hi) AS n_kept,
       |    CAST(SUM(CAST(um AS DECIMAL(28,6))) FILTER (WHERE um >= lo AND um <= hi) AS DOUBLE) AS sm,
       |    CAST(SUM(CAST(um * um AS DECIMAL(30,12))) FILTER (WHERE um >= lo AND um <= hi) AS DOUBLE) AS smm
       |  FROM units u JOIN fences f ON u.window_hours = f.window_hours
       |  GROUP BY 1, 2),
       |v AS (SELECT window_hours, grp, n_units, n_kept,
       |    ${posSql("((smm - sm * sm / n_kept) / NULLIF(n_kept - 1, 0))")} AS v_raw FROM agg)
       |SELECT window_hours, grp, n_units, n_kept,
       |  ${rSql("sqrt(v_raw)", 6)} AS unit_std,
       |  ${rSql("sqrt(v_raw) / sqrt(24.0 / window_hours)", 6)} AS se_scaled
       |FROM v ORDER BY window_hours, grp""".stripMargin
  }

  /** The counterpart method's INFERENCE step (counterpart_method
    * .ipynb): each adjacent On→Off window pair yields one delta, and
    * the method's readout is the paired t over those deltas — the
    * pairing controls for time-of-day, so the paired test is the
    * point of the whole construction.
    *
    * Determinism: per-pair deltas are scalar doubles from exact
    * decimal window sums; cross-pair moments round each delta (and
    * its square) to DECIMAL(30,12) per row before the exact decimal
    * sum (the ratioDelta/crse discipline). Inference uses the
    * portable t CDF and Cornish–Fisher quantile at df = n_pairs−1. */
  def counterpartTtest(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.StatFunctions.{pTwoSidedTSql, tInvCfSql}
    val d12 = DecimalType(30, 12)
    val pairs = counterpartPairs(spark, dir)
      .select(col("event_type"), (col("wmean") - col("next_wmean")).as("d"))
    val m = pairs.groupBy("event_type").agg(
      count(lit(1)).as("n_pairs"),
      sum(col("d").cast(d12)).cast(DoubleType).as("sd1"),
      sum((col("d") * col("d")).cast(d12)).cast(DoubleType).as("sd2"))
      .filter(col("n_pairs") > 1)
    val mean = col("sd1") / col("n_pairs")
    val sd = sqrt(pos((col("sd2") - col("sd1") * col("sd1") / col("n_pairs")) /
      (col("n_pairs") - 1)))
    val base = m.select(col("event_type"), col("n_pairs"),
      mean.as("mean_raw"),
      (sd / sqrt(col("n_pairs").cast(DoubleType))).as("se_raw"),
      (col("n_pairs") - lit(1.0)).as("dfc"))
      .withColumn("t_raw", col("mean_raw") / nzW(col("se_raw")))
      .withColumn("tcrit", expr(tInvCfSql("1.959963984540054", "dfc")))
    base.select(col("event_type"), col("n_pairs"),
      r6(col("mean_raw")).as("mean_delta"), r6(col("se_raw")).as("se"),
      r4(col("t_raw")).as("t_stat"),
      r6(expr(pTwoSidedTSql("t_raw", "dfc", spark = true))).as("p_t"),
      r6(col("mean_raw") - col("tcrit") * col("se_raw")).as("ci_lo"),
      r6(col("mean_raw") + col("tcrit") * col("se_raw")).as("ci_hi"))
      .orderBy("event_type")
  }

  private val counterpartTtestOracle = {
    import graft.functions.StatFunctions.{pTwoSidedTSql, tInvCfSql}
    s"""WITH per_window AS (
       |  SELECT event_type, user_id % 10 AS zone_id, date_trunc('hour', ts) AS window_start, $onOffSql AS on_off,
       |    CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS wmean
       |  FROM events GROUP BY 1, 2, 3, 4),
       |paired AS (
       |  SELECT event_type, on_off, wmean,
       |    LEAD(on_off) OVER (PARTITION BY event_type, zone_id ORDER BY window_start) AS next_on_off,
       |    LEAD(wmean) OVER (PARTITION BY event_type, zone_id ORDER BY window_start) AS next_wmean
       |  FROM per_window),
       |deltas AS (
       |  SELECT event_type, (wmean - next_wmean) AS d
       |  FROM paired WHERE on_off = 'On' AND next_on_off = 'Off'),
       |m AS (
       |  SELECT event_type, COUNT(*) AS n_pairs,
       |    CAST(SUM(CAST(d AS DECIMAL(30,12))) AS DOUBLE) AS sd1,
       |    CAST(SUM(CAST(d * d AS DECIMAL(30,12))) AS DOUBLE) AS sd2
       |  FROM deltas GROUP BY 1 HAVING COUNT(*) > 1),
       |base AS (
       |  SELECT event_type, n_pairs, (sd1 / n_pairs) AS mean_raw,
       |    (sqrt(${posSql("((sd2 - sd1 * sd1 / n_pairs) / (n_pairs - 1))")}) / sqrt(CAST(n_pairs AS DOUBLE))) AS se_raw,
       |    (n_pairs - 1.0) AS dfc
       |  FROM m),
       |tstats AS (
       |  SELECT *, mean_raw / NULLIF(se_raw, 0) AS t_raw,
       |    ${tInvCfSql("1.959963984540054", "dfc")} AS tcrit
       |  FROM base)
       |SELECT event_type, n_pairs,
       |  ${rSql("mean_raw", 6)} AS mean_delta, ${rSql("se_raw", 6)} AS se,
       |  ${rSql("t_raw", 4)} AS t_stat,
       |  ${rSql(pTwoSidedTSql("t_raw", "dfc", spark = false), 6)} AS p_t,
       |  ${rSql("mean_raw - tcrit * se_raw", 6)} AS ci_lo,
       |  ${rSql("mean_raw + tcrit * se_raw", 6)} AS ci_hi
       |FROM tstats ORDER BY event_type""".stripMargin
  }

  // --------------------------------------------- group-sequential testing

  /** Group-sequential monitoring with O'Brien–Fleming boundaries: the
    * classical peeking-control design (the frequentist sibling of the
    * streaming mSPRT monitor) — four weekly interim analyses, each
    * computing the cumulative two-sample z and comparing |z| against
    * the OBF critical curve b_k = c·√(K/k) (c = 2.024 for K = 4,
    * α = 0.05 two-sided — the published OBF constant), which spends
    * almost no α early and preserves the nominal level overall.
    *
    * Weeks bucket from the data-derived first event day (one-row
    * broadcast, the q_did midpoint pattern); cumulative moments are
    * DECIMAL window sums over the tiny |event_type|×4 weekly frame
    * (partitioned by event_type — never a raw-event window); the
    * reject decision compares r4-rounded z and boundary so both
    * engines decide identically at the grid.
    *
    * Scale: one map-side-combined weekly aggregation over the facts;
    * everything after operates on |types|×K rows. */
  def gst(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    val epochDay = "(unix_micros(date_trunc('day', ts)) div 86400000000)"
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value"), onOff.as("g"),
        expr(epochDay).as("day"))
    val d0 = ev.agg(min("day").as("d0"))
    val weekly = ev.crossJoin(broadcast(d0))
      .withColumn("week", expr("(day - d0) div 7") + 1L)
      .filter(col("week") <= 4)
      .groupBy("event_type", "week")
      .agg(
        sum(when(col("g") === "On", 1L).otherwise(0L)).as("wn1"),
        sum(when(col("g") === "On", col("value").cast(d))).as("ws1"),
        sum(when(col("g") === "On", (col("value") * col("value")).cast(d))).as("wss1"),
        sum(when(col("g") === "Off", 1L).otherwise(0L)).as("wn2"),
        sum(when(col("g") === "Off", col("value").cast(d))).as("ws2"),
        sum(when(col("g") === "Off", (col("value") * col("value")).cast(d))).as("wss2"),
      )
    val w = Window.partitionBy("event_type").orderBy("week")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def nz(c: Column): Column = when(c =!= 0, c)
    val cum = weekly.select(col("event_type"), col("week"),
      sum("wn1").over(w).as("n1"), sum("ws1").over(w).cast(DoubleType).as("s1"),
      sum("wss1").over(w).cast(DoubleType).as("ss1"),
      sum("wn2").over(w).as("n2"), sum("ws2").over(w).cast(DoubleType).as("s2"),
      sum("wss2").over(w).cast(DoubleType).as("ss2"))
    val v1 = (col("ss1") - col("s1") * col("s1") / nz(col("n1"))) /
      nz(col("n1") - 1) / nz(col("n1"))
    val v2 = (col("ss2") - col("s2") * col("s2") / nz(col("n2"))) /
      nz(col("n2") - 1) / nz(col("n2"))
    val z = (col("s1") / nz(col("n1")) - col("s2") / nz(col("n2"))) /
      nz(sqrt(pos(v1 + v2)))
    val boundary = lit(2.024) * sqrt(lit(4.0) / col("week"))
    cum.select(col("event_type"), col("week"),
        col("n1").as("n_cum_on"), col("n2").as("n_cum_off"),
        r4(z).as("z"), r4(boundary).as("obf_bound"))
      .withColumn("reject", abs(col("z")) > col("obf_bound"))
      .orderBy("event_type", "week")
  }

  private val gstOracle = {
    def nzS(e: String) = s"NULLIF($e, 0)"
    val v1 = s"((ss1 - s1 * s1 / ${nzS("n1")}) / ${nzS("n1 - 1")} / ${nzS("n1")})"
    val v2 = s"((ss2 - s2 * s2 / ${nzS("n2")}) / ${nzS("n2 - 1")} / ${nzS("n2")})"
    val z = s"((s1 / ${nzS("n1")} - s2 / ${nzS("n2")}) / NULLIF(sqrt(${posSql(s"($v1 + $v2)")}), 0))"
    val bound = "(2.024 * sqrt(4.0 / week))"
    s"""WITH ev AS (
       |  SELECT event_type, "value", $onOffSql AS g,
       |    (epoch_us(date_trunc('day', ts)) // 86400000000) AS day
       |  FROM events),
       |d0 AS (SELECT MIN(day) AS d0 FROM ev),
       |weekly AS (
       |  SELECT event_type, (day - d0) // 7 + 1 AS week,
       |    COUNT(*) FILTER (WHERE g = 'On') AS wn1,
       |    SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE g = 'On') AS ws1,
       |    SUM(CAST("value" * "value" AS DECIMAL(28,6))) FILTER (WHERE g = 'On') AS wss1,
       |    COUNT(*) FILTER (WHERE g = 'Off') AS wn2,
       |    SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE g = 'Off') AS ws2,
       |    SUM(CAST("value" * "value" AS DECIMAL(28,6))) FILTER (WHERE g = 'Off') AS wss2
       |  FROM ev CROSS JOIN d0
       |  WHERE (day - d0) // 7 + 1 <= 4
       |  GROUP BY 1, 2),
       |cum AS (
       |  SELECT event_type, week,
       |    CAST(SUM(wn1) OVER cw AS BIGINT) AS n1,
       |    CAST(SUM(ws1) OVER cw AS DOUBLE) AS s1,
       |    CAST(SUM(wss1) OVER cw AS DOUBLE) AS ss1,
       |    CAST(SUM(wn2) OVER cw AS BIGINT) AS n2,
       |    CAST(SUM(ws2) OVER cw AS DOUBLE) AS s2,
       |    CAST(SUM(wss2) OVER cw AS DOUBLE) AS ss2
       |  FROM weekly
       |  WINDOW cw AS (PARTITION BY event_type ORDER BY week
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT event_type, week, n1 AS n_cum_on, n2 AS n_cum_off,
       |  ${rSql(z, 4)} AS z, ${rSql(bound, 4)} AS obf_bound,
       |  (abs(${rSql(z, 4)}) > ${rSql(bound, 4)}) AS reject
       |FROM cum ORDER BY event_type, week""".stripMargin
  }

  // ------------------------------------------- quantile treatment effects

  /** Quantile treatment effects per event_type: On−Off differences at
    * the 25th/50th/75th percentiles of `value` — the distributional
    * readout an experimenter reaches for when the mean shift hides
    * where in the distribution the treatment acts (tail-heavy KPIs:
    * delivery times, basket values). Interpolating quantiles
    * (Spark `percentile` ≡ DuckDB `quantile_cont`, the q_quantiles-
    * proven pairing), r4-rounded before differencing so the QTE is a
    * fixed double op on grid values in both engines.
    *
    * Scale: one exact-percentile aggregation per event_type — at
    * 100 TB swap `percentile` for the mergeable q_qsketch/GK path;
    * the operator's contract (per-arm quantiles + diffs) is unchanged. */
  def qte(spark: SparkSession, dir: String): DataFrame = {
    def q(p: Double, arm: String): Column =
      r4(expr(s"percentile(CASE WHEN g = '$arm' THEN value END, $p)"))
    val base = Tables.events(spark, dir).withColumn("g", onOff)
      .groupBy("event_type")
      .agg(
        sum(when(col("g") === "On", 1L).otherwise(0L)).as("n_on"),
        sum(when(col("g") === "Off", 1L).otherwise(0L)).as("n_off"),
        q(0.25, "On").as("q25_on"), q(0.25, "Off").as("q25_off"),
        q(0.5, "On").as("q50_on"), q(0.5, "Off").as("q50_off"),
        q(0.75, "On").as("q75_on"), q(0.75, "Off").as("q75_off"),
      )
    base.select(col("event_type"), col("n_on"), col("n_off"),
        col("q25_on"), col("q25_off"), r4(col("q25_on") - col("q25_off")).as("qte25"),
        col("q50_on"), col("q50_off"), r4(col("q50_on") - col("q50_off")).as("qte50"),
        col("q75_on"), col("q75_off"), r4(col("q75_on") - col("q75_off")).as("qte75"))
      .orderBy("event_type")
  }

  private val qteOracle = {
    def q(p: Double, arm: String): String =
      rSql(s"quantile_cont(CASE WHEN $onOffSql = '$arm' THEN \"value\" END, $p)", 4)
    s"""WITH base AS (
       |  SELECT event_type,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'On') AS n_on,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'Off') AS n_off,
       |    ${q(0.25, "On")} AS q25_on, ${q(0.25, "Off")} AS q25_off,
       |    ${q(0.5, "On")} AS q50_on, ${q(0.5, "Off")} AS q50_off,
       |    ${q(0.75, "On")} AS q75_on, ${q(0.75, "Off")} AS q75_off
       |  FROM events GROUP BY 1)
       |SELECT event_type, n_on, n_off,
       |  q25_on, q25_off, ${rSql("(q25_on - q25_off)", 4)} AS qte25,
       |  q50_on, q50_off, ${rSql("(q50_on - q50_off)", 4)} AS qte50,
       |  q75_on, q75_off, ${rSql("(q75_on - q75_off)", 4)} AS qte75
       |FROM base ORDER BY event_type""".stripMargin
  }

  // --------------------------------------------------- Bayesian A/B read

  /** Bayesian A/B readout per event_type under the large-sample normal
    * approximation with a flat prior: the posterior of the mean lift
    * Δ = μ_On − μ_Off is N(d, se²) with d the observed difference and
    * se² = v₁/n₁ + v₂/n₂, so
    *   p_beats  = P(Δ > 0) = Φ(d/se)           (prob. treatment wins)
    *   loss_on  = E[max(−Δ, 0)] = se·φ(d/se) − d·Φ(−d/se)
    *   loss_off = E[max(Δ, 0)]  = se·φ(d/se) + d·Φ(d/se)
    * — the expected-loss decision rule (ship when loss_on < ε) that
    * product experimentation platforms publish beside the p-value.
    * φ/Φ are pure {exp,*,+} arithmetic (A&S erf — StatFunctions), so
    * both engines evaluate the identical formula text.
    *
    * Scale: one map-side-combined moment aggregation, |event_type|
    * result rows — the q_ttest_welch shape exactly. */
  def bayesAb(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    val moments = Tables.events(spark, dir)
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
    // NULLIF-guard every divisor (q_did discipline): a one-row or
    // constant-valued arm must be NULL identically in both engines,
    // never Spark-NULL-vs-DuckDB-inf
    def nzc(c: Column): Column = when(c =!= 0, c)
    val v1 = (col("ss1") - col("s1") * col("s1") / nzc(col("n1"))) / nzc(col("n1") - 1)
    val v2 = (col("ss2") - col("s2") * col("s2") / nzc(col("n2"))) / nzc(col("n2") - 1)
    val diff = col("s1") / nzc(col("n1")) - col("s2") / nzc(col("n2"))
    val se = sqrt(pos(v1 / col("n1") + v2 / col("n2")))
    val z = diff / nzc(se)
    val phi = exp(-col("z_raw") * col("z_raw") / 2.0) / math.sqrt(2.0 * math.Pi)
    moments.select(col("event_type"), col("n1").as("n_on"), col("n2").as("n_off"),
        diff.as("d_raw"), se.as("se_raw"), z.as("z_raw"))
      .select(col("event_type"), col("n_on"), col("n_off"),
        r4(col("d_raw")).as("diff"),
        r6(StatFunctions.normCdf(col("z_raw"))).as("p_beats"),
        r6(col("se_raw") * phi - col("d_raw") * StatFunctions.normCdf(-col("z_raw")))
          .as("exp_loss_on"),
        r6(col("se_raw") * phi + col("d_raw") * StatFunctions.normCdf(col("z_raw")))
          .as("exp_loss_off"))
      .orderBy("event_type")
  }

  private val bayesAbOracle = {
    import graft.functions.StatFunctions.normCdfSql
    val v1 = "((ss1 - s1 * s1 / NULLIF(n1, 0)) / NULLIF(n1 - 1, 0))"
    val v2 = "((ss2 - s2 * s2 / NULLIF(n2, 0)) / NULLIF(n2 - 1, 0))"
    val phi = s"(exp(-z_raw * z_raw / 2.0) / ${math.sqrt(2.0 * math.Pi)})"
    s"""WITH moments AS (
       |  SELECT event_type,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'On') AS n1,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'On') AS DOUBLE) AS s1,
       |    CAST(SUM(CAST("value" * "value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'On') AS DOUBLE) AS ss1,
       |    COUNT(*) FILTER (WHERE $onOffSql = 'Off') AS n2,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'Off') AS DOUBLE) AS s2,
       |    CAST(SUM(CAST("value" * "value" AS DECIMAL(28,6))) FILTER (WHERE $onOffSql = 'Off') AS DOUBLE) AS ss2
       |  FROM events GROUP BY 1),
       |stats AS (
       |  SELECT event_type, n1, n2,
       |    (s1 / NULLIF(n1, 0) - s2 / NULLIF(n2, 0)) AS d_raw,
       |    sqrt(${posSql(s"($v1 / n1 + $v2 / n2)")}) AS se_raw,
       |    ((s1 / NULLIF(n1, 0) - s2 / NULLIF(n2, 0))
       |      / NULLIF(sqrt(${posSql(s"($v1 / n1 + $v2 / n2)")}), 0)) AS z_raw
       |  FROM moments)
       |SELECT event_type, n1 AS n_on, n2 AS n_off,
       |  ${rSql("d_raw", 4)} AS diff,
       |  ${rSql(normCdfSql("z_raw"), 6)} AS p_beats,
       |  ${rSql(s"(se_raw * $phi - d_raw * ${normCdfSql("(-z_raw)")})", 6)} AS exp_loss_on,
       |  ${rSql(s"(se_raw * $phi + d_raw * ${normCdfSql("z_raw")})", 6)} AS exp_loss_off
       |FROM stats ORDER BY event_type""".stripMargin
  }

  // ------------------------------------ intraclass correlation / design effect

  /** Intraclass correlation + design effect of the switchback design:
    * the randomization unit is the (hour-window × zone) cluster, so the
    * effective sample size is n/deff, deff = 1 + (m̄ − 1)·ICC — the
    * number every power calculation over clustered assignment needs
    * (the reference's README window-size research is exactly a deff
    * minimization; q_crse corrects inference for the same clustering,
    * this measures how much the clustering costs).
    *
    * ICC via the one-way random-effects ANOVA estimator:
    * MSB/MSW from between/within sums of squares, cluster-size
    * correction m0 = (N − Σm²/N)/(G−1) for unequal clusters
    * (Donner & Koval 1980), ICC = (MSB−MSW)/(MSB+(m0−1)·MSW).
    *
    * Determinism: per-cluster moments are exact DECIMAL; the
    * between-cluster term s_g²/n_g is r6-rounded THEN decimal-summed
    * (the q_ngram_lm discipline), so accumulation order never matters.
    *
    * Scale: two map-side-combined aggregations (rows → clusters →
    * event_type); the cluster frame is |windows × zones| per type —
    * thousands of rows per 100 TB partition, nothing global. */
  def iccDesign(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    def nz(c: Column): Column = when(c =!= 0, c)
    val cl = Tables.events(spark, dir)
      .select(col("event_type"), col("value"),
        concat_ws("_", hourIdx, zoneId).as("cluster"))
      .groupBy("event_type", "cluster")
      .agg(count(lit(1)).as("m"),
        sum(col("value").cast(d)).cast(DoubleType).as("s"),
        sum((col("value") * col("value")).cast(d)).cast(DoubleType).as("ss"))
    val t = cl.groupBy("event_type")
      .agg(sum("m").as("n"), count(lit(1)).as("g"),
        sum(col("s").cast(d)).cast(DoubleType).as("s"),
        sum(col("ss").cast(d)).cast(DoubleType).as("ss"),
        sum(r6(col("s") * col("s") / col("m")).cast(d)).cast(DoubleType).as("sb"),
        sum(col("m") * col("m")).as("sm2"))
    val ssb = col("sb") - col("s") * col("s") / col("n")
    val ssw = col("ss") - col("sb")
    val msb = ssb / nz(col("g") - 1)
    val msw = ssw / nz(col("n") - col("g"))
    val m0 = (col("n") - col("sm2") / col("n")) / nz(col("g") - 1)
    val icc = (msb - msw) / nz(msb + (m0 - 1) * msw)
    val mbar = col("n") / col("g")
    t.select(col("event_type"), col("n"), col("g").as("g_clusters"),
        r4(mbar).as("m_bar"), r4(icc).as("icc"),
        r4(lit(1) + (mbar - 1) * icc).as("deff"),
        r4(col("n") / nz(lit(1) + (mbar - 1) * icc)).as("n_effective"))
      .orderBy("event_type")
  }

  private val iccDesignOracle = {
    def nzS(e: String) = s"NULLIF($e, 0)"
    val ssb = "(sb - s * s / n)"
    val ssw = "(ss - sb)"
    val msb = s"($ssb / ${nzS("g - 1")})"
    val msw = s"($ssw / ${nzS("n - g")})"
    val m0 = s"((n - sm2 / n) / ${nzS("g - 1")})"
    val icc = s"(($msb - $msw) / ${nzS(s"$msb + ($m0 - 1) * $msw")})"
    val mbar = "(n / g)"
    val deff = s"(1 + ($mbar - 1) * $icc)"
    s"""WITH cl AS (
       |  SELECT event_type,
       |    CONCAT((epoch_us(date_trunc('hour', ts)) // 3600000000), '_', (user_id % 10)) AS cluster,
       |    COUNT(*) AS m,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) AS DOUBLE) AS s,
       |    CAST(SUM(CAST("value" * "value" AS DECIMAL(28,6))) AS DOUBLE) AS ss
       |  FROM events GROUP BY 1, 2),
       |t AS (
       |  SELECT event_type, CAST(SUM(m) AS BIGINT) AS n, COUNT(*) AS g,
       |    CAST(SUM(CAST(s AS DECIMAL(28,6))) AS DOUBLE) AS s,
       |    CAST(SUM(CAST(ss AS DECIMAL(28,6))) AS DOUBLE) AS ss,
       |    CAST(SUM(CAST(${rSql("(s * s / m)", 6)} AS DECIMAL(28,6))) AS DOUBLE) AS sb,
       |    CAST(SUM(m * m) AS BIGINT) AS sm2
       |  FROM cl GROUP BY 1)
       |SELECT event_type, n, g AS g_clusters,
       |  ${rSql(mbar, 4)} AS m_bar, ${rSql(icc, 4)} AS icc,
       |  ${rSql(deff, 4)} AS deff,
       |  ${rSql(s"(n / ${nzS(deff)})", 4)} AS n_effective
       |FROM t ORDER BY event_type""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("q_sb_assign", sbAssign, Some(sbAssignOracle)),
    Op("q_icc_design", iccDesign, Some(iccDesignOracle)),
    Op("q_qte", qte, Some(qteOracle)),
    Op("q_bayes_ab", bayesAb, Some(bayesAbOracle)),
    Op("q_gst", gst, Some(gstOracle)),
    Op("q_stderr_sweep", stderrSweep, Some(stderrSweepOracle)),
    Op("q_propagation", propagation, Some(propagationOracle)),
    Op("q_window_sweep", windowSweep, Some(windowSweepOracle)),
    Op("q_sb_metrics", sbMetrics, Some(sbMetricsOracle), headline = true),
    Op("q_counterpart", counterpart, Some(counterpartOracle)),
    Op("q_counterpart_ttest", counterpartTtest, Some(counterpartTtestOracle)),
    Op("q_srm_chisq", srmChisq, Some(srmChisqOracle)),
  )
}
