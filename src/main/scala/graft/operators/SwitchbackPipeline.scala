package graft.operators

import graft.{Op, Tables}
import graft.functions.Compat._
import graft.functions.StatFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The reference's full DAG, end to end (dags/switchback_test_dag.py:
  * run_queries → run_analysis_script), re-expressed as composable
  * DataFrame stages:
  *
  *  1. [[testConfigs]]   — experiment config dim (switchback_test_configs_bq)
  *  2. [[extractOrders]] — orders joined to configs: zone/type/date
  *     filters, day-number + even/odd bookkeeping, On/Off scheme
  *     assignment, keep/drop flag
  *     (data_extraction_queries_automated_script.sql steps 6-7)
  *  3. [[cleanOrders]]   — keep_drop_flag = 'Keep' (step 8)
  *  4. [[augment]]       — revenue / gross-profit formulas (step 7.1)
  *  5. [[metricsAndPvals]] — per-test×group per-order means + totals +
  *     Mann-Whitney U p-values (…analysis_script.py step 5)
  *
  * Each stage is a public DataFrame→DataFrame function — the Airflow
  * task graph becomes ordinary composition, and any stage is reusable
  * on its own.
  *
  * Scale: configs are a broadcast dim; every per-event computation is a
  * scan-local expression; the only shuffles are the final per-test
  * aggregations (keyed on test × value for the rank table — see
  * [[Stats]] MWU notes).
  */
object SwitchbackPipeline {

  /** Experiment configurations — two concurrent switchback tests over
    * disjoint zone sets (the reference reads these from a BQ config
    * table refreshed hourly; here they are a literal dim). */
  def testConfigs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("test_sb_pricing", 0, 4, "click,view,purchase", "2024-01-05", "2024-01-25"),
      ("test_sb_dispatch", 5, 9, "purchase,signup,error", "2024-01-10", "2024-01-28"),
    ).toDF("test_name", "zone_lo", "zone_hi", "types", "test_start", "test_end")
  }

  private val configsSql =
    """(VALUES
      |  ('test_sb_pricing', 0, 4, 'click,view,purchase', '2024-01-05', '2024-01-25'),
      |  ('test_sb_dispatch', 5, 9, 'purchase,signup,error', '2024-01-10', '2024-01-28'))
      | AS cfg(test_name, zone_lo, zone_hi, types, test_start, test_end)""".stripMargin

  /** Step 6/7 of the reference extraction: tag each order with its
    * test, switchback window, On/Off scheme, day bookkeeping, and the
    * keep/drop validity flag. */
  def extractOrders(events: DataFrame, configs: DataFrame): DataFrame = {
    val zone = col("user_id") % 10
    val hourIdx = expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
    events
      .withColumn("zone_id", zone)
      .join(broadcast(configs),
        zone.between(col("zone_lo"), col("zone_hi")) &&
          array_contains(split(col("types"), ","), col("event_type")) &&
          col("ts").cast("date").between(
            col("test_start").cast("date"), col("test_end").cast("date")))
      .withColumn("day_num_in_test",
        datediff(col("ts").cast("date"), col("test_start").cast("date")) + 1)
      .withColumn("even_or_odd_day",
        when(col("day_num_in_test") % 2 === 0, "even").otherwise("odd"))
      .withColumn("dow", date_format(col("ts"), "EEEE"))
      .withColumn("on_or_off", when((hourIdx + col("zone_id")) % 2 === 0, "On").otherwise("Off"))
      // empty-string guard (the sbMetrics discipline): an unmatched
      // props row must become NULL k, not an ANSI cast error. Inline so
      // no helper column can leak through a star-select downstream.
      .withColumn("k", when(regexp_extract(col("props"), "\"k\": (\\d+)", 1) =!= "",
        regexp_extract(col("props"), "\"k\": (\\d+)", 1)).cast("int"))
      // the reference drops orders whose scheme doesn't match the test
      // setup (keep_drop_flag, automated_script.sql:295)
      .withColumn("keep_drop_flag", when(col("k") < 90, "Keep").otherwise("Drop"))
  }

  /** Step 8: keep only validly-assigned orders. */
  def cleanOrders(extracted: DataFrame): DataFrame =
    extracted.filter(col("keep_drop_flag") === "Keep")

  /** Step 7.1: revenue / gross-profit KPI formulas. */
  def augment(cleaned: DataFrame): DataFrame =
    cleaned
      .withColumn("revenue_local",
        col("value") * 0.8 + col("k") * 0.01)
      .withColumn("gross_profit_local",
        col("value") * 0.8 + col("k") * 0.01 - col("value") * 0.3)

  /** Analysis-script step 5: per-test × On/Off per-order means and
    * totals, plus the tie-corrected Mann-Whitney U p-value on `value`
    * — one row per test (the p_vals_switchback_tests upload). */
  def metricsAndPvals(augmented: DataFrame): DataFrame = {
    val d = DecimalType(28, 6)
    // ONE pass over the augmented events (r12, guide §2.4): the
    // (test, value) grouping the MWU rank table needs carries the
    // per-test metric sums too — per-group DECIMAL partial sums
    // re-aggregate per test, and decimal addition is associative, so
    // every total (and the oracle) is bit-identical to aggregating the
    // events directly. r13 (guide §2.4 window/aggregation key sharing):
    // the r12 shape persisted + eagerly count()ed this grouping so two
    // consumers (metrics, rank table) could share it — one extra
    // blocking job plus a cache write that the driver measured SLOWER
    // (0.79→1.26 s) at bench scale. There is no need for two consumers
    // at all: the rank window passes every group column through, so a
    // SINGLE groupBy(test_name) after the window computes the metric
    // totals AND the MWU sums together. The window's exchange is already
    // keyed on test_name, so the aggregation adds no exchange, and the
    // final metrics⋈pvals join disappears. The double sum r_on
    // accumulates over the identical window-sorted row order, decimal
    // and long sums are exact, so the output is bit-identical (oracle +
    // content hash verified).
    val counts = augmented.groupBy("test_name", "value")
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("on_or_off") === "On", 1L).otherwise(0L)).as("cnt_on"),
        sum(when(col("on_or_off") === "On", col("value").cast(d))).as("sv_on"),
        sum(when(col("on_or_off") === "Off", col("value").cast(d))).as("sv_off"),
        sum(when(col("on_or_off") === "On", col("revenue_local").cast(d))).as("srev_on"),
        sum(when(col("on_or_off") === "Off", col("revenue_local").cast(d))).as("srev_off"))
    val w = Window.partitionBy("test_name").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = counts
      .withColumn("cum_before", coalesce(sum("cnt").over(w), lit(0L)))
      .withColumn("avg_rank", col("cum_before") + (col("cnt") + 1) / 2.0)
    val agg = ranked.groupBy("test_name").agg(
      sum(col("cnt_on")).as("n_on"),
      (sum(col("cnt")) - sum(col("cnt_on"))).as("n_off"),
      sum(col("sv_on")).cast(DoubleType).as("s_on"),
      sum(col("sv_off")).cast(DoubleType).as("s_off"),
      sum(col("srev_on")).cast(DoubleType).as("rev_on"),
      sum(col("srev_off")).cast(DoubleType).as("rev_off"),
      sum(col("avg_rank") * col("cnt_on")).as("r_on"),
      sum("cnt").as("mn"),
      // DECIMAL(38,0) cnt^3 + double-promoted count products + guarded
      // sd: the Stats.mwu overflow/degenerate discipline
      sum(col("cnt").cast(DecimalType(38, 0)) * col("cnt") * col("cnt") - col("cnt"))
        .as("tie_t"))
    val n1d = col("n_on").cast(DoubleType)
    val n2d = (col("mn") - col("n_on")).cast(DoubleType)
    val nd = col("mn").cast(DoubleType)
    val u1 = col("r_on") - n1d * (n1d + 1) / 2.0
    val mu = n1d * n2d / 2.0
    val sd = sqrt(n1d * n2d / 12.0 *
      ((nd + 1) - col("tie_t").cast(DoubleType) / (nd * (nd - 1.0))))
    val z = (u1 - mu - signum(u1 - mu) * 0.5) / when(sd =!= 0, sd)
    agg.select(col("test_name"), col("n_on"), col("n_off"),
        r2(col("s_on") / col("n_on")).as("value_per_order_on"),
        r2(col("s_off") / col("n_off")).as("value_per_order_off"),
        r2(col("rev_on") / col("n_on")).as("revenue_per_order_on"),
        r2(col("rev_off") / col("n_off")).as("revenue_per_order_off"),
        u1.as("u_stat"), r4(z).as("z"),
        r6(StatFunctions.pTwoSidedNormal(z)).as("p_value"))
      .orderBy("test_name")
  }

  /** The whole DAG in one call. */
  def run(spark: SparkSession, dir: String): DataFrame =
    metricsAndPvals(augment(cleanOrders(
      extractOrders(Tables.events(spark, dir), testConfigs(spark)))))

  // -------------------------------------------------------------------
  // Parameterized reruns — the reference's BQ-scripting DECLARE/SET
  // pattern (sql_queries/..._deep_dives.sql:3-12): the SAME pipeline
  // text is re-bound to different dates/zones/thresholds/KPI rates per
  // run. Here the binding is a case class; BOTH the Spark plan and the
  // DuckDB oracle are generated from the same params value, so a rerun
  // is `runWith(spark, dir, newParams)` — no copy-edited SQL.
  // -------------------------------------------------------------------

  /** One switchback test's full parameter set (the DECLARE block). */
  final case class SwitchbackParams(
      testName: String, zoneLo: Int, zoneHi: Int, types: Seq[String],
      testStart: String, testEnd: String,
      keepThreshold: Int = 90, revenueRate: Double = 0.8, unitFee: Double = 0.01)

  /** The rerun exercised by q_sb_pipeline_params: different zones,
    * dates, keep thresholds, and KPI rates than [[testConfigs]]. */
  val rerunParams: Seq[SwitchbackParams] = Seq(
    SwitchbackParams("test_sb_fee", 2, 7, Seq("click", "purchase"),
      "2024-01-08", "2024-01-22", keepThreshold = 80, revenueRate = 0.75, unitFee = 0.02),
    SwitchbackParams("test_sb_promo", 0, 9, Seq("view", "signup"),
      "2024-01-03", "2024-01-27", keepThreshold = 95, revenueRate = 0.9, unitFee = 0.005),
  )

  /** Params → config dim (broadcast side), carrying the per-test
    * threshold and KPI rates as columns. */
  def configsFrom(spark: SparkSession, params: Seq[SwitchbackParams]): DataFrame = {
    import spark.implicits._
    params.map(p => (p.testName, p.zoneLo, p.zoneHi, p.types.mkString(","),
        p.testStart, p.testEnd, p.keepThreshold, p.revenueRate, p.unitFee))
      .toDF("test_name", "zone_lo", "zone_hi", "types", "test_start",
        "test_end", "keep_thresh", "rev_rate", "unit_fee")
  }

  /** [[extractOrders]] + [[augment]] with every constant drawn from the
    * joined config row instead of hardcoded literals. */
  def runWith(spark: SparkSession, dir: String, params: Seq[SwitchbackParams]): DataFrame = {
    val extracted = extractOrders(Tables.events(spark, dir), configsFrom(spark, params))
      // per-test keep threshold overrides extractOrders' default flag
      .withColumn("keep_drop_flag",
        when(col("k") < col("keep_thresh"), "Keep").otherwise("Drop"))
    val augmented = cleanOrders(extracted)
      .withColumn("revenue_local",
        col("value") * col("rev_rate") + col("k") * col("unit_fee"))
    metricsAndPvals(augmented)
  }

  /** The oracle for a parameter set — generated from the SAME value the
    * Spark plan is built from (single source of truth). */
  def oracleFor(params: Seq[SwitchbackParams]): String = {
    val values = params.map { p =>
      s"('${p.testName}', ${p.zoneLo}, ${p.zoneHi}, '${p.types.mkString(",")}', " +
        s"'${p.testStart}', '${p.testEnd}', ${p.keepThreshold}, " +
        s"CAST(${p.revenueRate} AS DOUBLE), CAST(${p.unitFee} AS DOUBLE))"
    }.mkString(",\n  ")
    val cfgSql =
      s"""(VALUES
         |  $values)
         | AS cfg(test_name, zone_lo, zone_hi, types, test_start, test_end, keep_thresh, rev_rate, unit_fee)""".stripMargin
    val z = "((u1 - mu) - sign(u1 - mu) * 0.5) / sd"
    s"""WITH extracted AS (
       |  SELECT e.*, user_id % 10 AS zone_id, cfg.test_name, cfg.keep_thresh, cfg.rev_rate, cfg.unit_fee,
       |    CASE WHEN ((epoch_us(date_trunc('hour', ts)) // 3600000000) + (user_id % 10)) % 2 = 0
       |         THEN 'On' ELSE 'Off' END AS on_or_off,
       |    CAST(NULLIF(regexp_extract(props, '"k": (\\d+)', 1), '') AS INT) AS k
       |  FROM events e
       |  JOIN $cfgSql
       |    ON user_id % 10 BETWEEN cfg.zone_lo AND cfg.zone_hi
       |   AND list_contains(string_split(cfg.types, ','), e.event_type)
       |   AND CAST(e.ts AS DATE) BETWEEN CAST(cfg.test_start AS DATE) AND CAST(cfg.test_end AS DATE)),
       |cleaned AS (SELECT * FROM extracted WHERE k < keep_thresh),
       |augmented AS (
       |  SELECT *, "value" * rev_rate + k * unit_fee AS revenue_local FROM cleaned),
       |metrics AS (
       |  SELECT test_name,
       |    COUNT(*) FILTER (WHERE on_or_off = 'On') AS n_on,
       |    COUNT(*) FILTER (WHERE on_or_off = 'Off') AS n_off,
       |    ${rSql("CAST(SUM(CAST(\"value\" AS DECIMAL(28,6))) FILTER (WHERE on_or_off = 'On') AS DOUBLE) / COUNT(*) FILTER (WHERE on_or_off = 'On')", 2)} AS value_per_order_on,
       |    ${rSql("CAST(SUM(CAST(\"value\" AS DECIMAL(28,6))) FILTER (WHERE on_or_off = 'Off') AS DOUBLE) / COUNT(*) FILTER (WHERE on_or_off = 'Off')", 2)} AS value_per_order_off,
       |    ${rSql("CAST(SUM(CAST(revenue_local AS DECIMAL(28,6))) FILTER (WHERE on_or_off = 'On') AS DOUBLE) / COUNT(*) FILTER (WHERE on_or_off = 'On')", 2)} AS revenue_per_order_on,
       |    ${rSql("CAST(SUM(CAST(revenue_local AS DECIMAL(28,6))) FILTER (WHERE on_or_off = 'Off') AS DOUBLE) / COUNT(*) FILTER (WHERE on_or_off = 'Off')", 2)} AS revenue_per_order_off
       |  FROM augmented GROUP BY 1),
       |counts AS (
       |  SELECT test_name, "value" AS v, COUNT(*) AS cnt,
       |    SUM(CASE WHEN on_or_off = 'On' THEN 1 ELSE 0 END) AS cnt_on
       |  FROM augmented GROUP BY 1, 2),
       |ranked AS (
       |  SELECT test_name, cnt, cnt_on,
       |    COALESCE(SUM(cnt) OVER (PARTITION BY test_name ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (cnt + 1) / 2.0 AS avg_rank
       |  FROM counts),
       |agg AS (
       |  SELECT test_name,
       |    SUM(avg_rank * cnt_on) AS r_on,
       |    CAST(SUM(cnt_on) AS BIGINT) AS n1,
       |    CAST(SUM(cnt) AS BIGINT) AS n,
       |    SUM(CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt) AS tie_t
       |  FROM ranked GROUP BY 1),
       |stats AS (
       |  SELECT test_name,
       |    (r_on - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1) / 2.0) AS u1,
       |    (CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 2.0) AS mu,
       |    NULLIF(sqrt(CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 12.0 *
       |      ((CAST(n AS DOUBLE) + 1) - CAST(tie_t AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))), 0) AS sd
       |  FROM agg)
       |SELECT m.test_name, m.n_on, m.n_off,
       |  m.value_per_order_on, m.value_per_order_off,
       |  m.revenue_per_order_on, m.revenue_per_order_off,
       |  u1 AS u_stat, ${rSql(z, 4)} AS z,
       |  ${rSql(StatFunctions.pTwoSidedNormalSql(z), 6)} AS p_value
       |FROM metrics m JOIN stats s ON m.test_name = s.test_name
       |ORDER BY m.test_name""".stripMargin
  }

  private val pipelineOracle = {
    val z = "((u1 - mu) - sign(u1 - mu) * 0.5) / sd"
    s"""WITH extracted AS (
       |  SELECT e.*, user_id % 10 AS zone_id, cfg.test_name,
       |    CASE WHEN ((epoch_us(date_trunc('hour', ts)) // 3600000000) + (user_id % 10)) % 2 = 0
       |         THEN 'On' ELSE 'Off' END AS on_or_off,
       |    CAST(NULLIF(regexp_extract(props, '"k": (\\d+)', 1), '') AS INT) AS k
       |  FROM events e
       |  JOIN $configsSql
       |    ON user_id % 10 BETWEEN cfg.zone_lo AND cfg.zone_hi
       |   AND list_contains(string_split(cfg.types, ','), e.event_type)
       |   AND CAST(e.ts AS DATE) BETWEEN CAST(cfg.test_start AS DATE) AND CAST(cfg.test_end AS DATE)),
       |cleaned AS (SELECT * FROM extracted WHERE k < 90),
       |augmented AS (
       |  SELECT *, "value" * 0.8 + k * 0.01 AS revenue_local FROM cleaned),
       |metrics AS (
       |  SELECT test_name,
       |    COUNT(*) FILTER (WHERE on_or_off = 'On') AS n_on,
       |    COUNT(*) FILTER (WHERE on_or_off = 'Off') AS n_off,
       |    ${rSql("CAST(SUM(CAST(\"value\" AS DECIMAL(28,6))) FILTER (WHERE on_or_off = 'On') AS DOUBLE) / COUNT(*) FILTER (WHERE on_or_off = 'On')", 2)} AS value_per_order_on,
       |    ${rSql("CAST(SUM(CAST(\"value\" AS DECIMAL(28,6))) FILTER (WHERE on_or_off = 'Off') AS DOUBLE) / COUNT(*) FILTER (WHERE on_or_off = 'Off')", 2)} AS value_per_order_off,
       |    ${rSql("CAST(SUM(CAST(revenue_local AS DECIMAL(28,6))) FILTER (WHERE on_or_off = 'On') AS DOUBLE) / COUNT(*) FILTER (WHERE on_or_off = 'On')", 2)} AS revenue_per_order_on,
       |    ${rSql("CAST(SUM(CAST(revenue_local AS DECIMAL(28,6))) FILTER (WHERE on_or_off = 'Off') AS DOUBLE) / COUNT(*) FILTER (WHERE on_or_off = 'Off')", 2)} AS revenue_per_order_off
       |  FROM augmented GROUP BY 1),
       |counts AS (
       |  SELECT test_name, "value" AS v, COUNT(*) AS cnt,
       |    SUM(CASE WHEN on_or_off = 'On' THEN 1 ELSE 0 END) AS cnt_on
       |  FROM augmented GROUP BY 1, 2),
       |ranked AS (
       |  SELECT test_name, cnt, cnt_on,
       |    COALESCE(SUM(cnt) OVER (PARTITION BY test_name ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (cnt + 1) / 2.0 AS avg_rank
       |  FROM counts),
       |agg AS (
       |  SELECT test_name,
       |    SUM(avg_rank * cnt_on) AS r_on,
       |    CAST(SUM(cnt_on) AS BIGINT) AS n1,
       |    CAST(SUM(cnt) AS BIGINT) AS n,
       |    SUM(CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt) AS tie_t
       |  FROM ranked GROUP BY 1),
       |stats AS (
       |  SELECT test_name,
       |    (r_on - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1) / 2.0) AS u1,
       |    (CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 2.0) AS mu,
       |    NULLIF(sqrt(CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 12.0 *
       |      ((CAST(n AS DOUBLE) + 1) - CAST(tie_t AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))), 0) AS sd
       |  FROM agg)
       |SELECT m.test_name, m.n_on, m.n_off,
       |  m.value_per_order_on, m.value_per_order_off,
       |  m.revenue_per_order_on, m.revenue_per_order_off,
       |  u1 AS u_stat, ${rSql(z, 4)} AS z,
       |  ${rSql(StatFunctions.pTwoSidedNormalSql(z), 6)} AS p_value
       |FROM metrics m JOIN stats s ON m.test_name = s.test_name
       |ORDER BY m.test_name""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("q_sb_pipeline", run, Some(pipelineOracle), headline = true),
    Op("q_sb_pipeline_params", (s, dir) => runWith(s, dir, rerunParams),
      Some(oracleFor(rerunParams))),
  )
}
