package graft.operators

import graft.{Op, Tables}
import graft.functions.Compat._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Event-time operators (SURVEY.md §2 block B, part 3): EWM smoothing
  * (notebooks use pandas .ewm for propagation-effect analysis),
  * sessionization, as-of joins, tumbling windows (batch twin of the
  * streaming path in graft.streaming).
  *
  * Scale: everything is Window.partitionBy(user) — parallelism scales
  * with #users; no global sorts. The as-of join is the union-then-
  * last_value formulation: one shuffle on user_id, no range-join blowup.
  */
object TimeSeries {

  /** Integer epoch-day of the event — THE day/dow convention every
    * daily-series operator shares (seasonality, decompose, PSI, …):
    * dow = (day + 4) % 7 with 0 = Sunday. One definition per engine so
    * the weekday buckets of companion operators can never diverge. */
  private[operators] val epochDay =
    "(unix_micros(date_trunc('day', ts)) div 86400000000)"
  private[operators] val epochDaySql =
    "(epoch_us(date_trunc('day', ts)) // 86400000000)"

  /** Exponentially-weighted mean (pandas ewm(alpha=0.2, adjust=True))
    * over each user's latest 20 events. The truncation keeps the weights
    * exactly computable in both engines (tail weight 0.8^20 ≈ 1e-2 of
    * the oldest retained term); the untruncated streaming path is
    * mapGroupsWithState in graft.streaming. */
  def ewm(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val d = DecimalType(28, 14)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .withColumn("wt", pow(lit(0.8), col("rn") - 1))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_used"),
        (sum((col("wt") * col("value")).cast(d)).cast(DoubleType) /
          sum(col("wt").cast(d)).cast(DoubleType)).as("ewm_raw"),
      )
      .select(col("user_id"), col("n_used"), r4(col("ewm_raw")).as("ewm_value"))
      .orderBy("user_id")
  }

  private val ewmOracle =
    """WITH latest AS (
      |  SELECT user_id, "value",
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events),
      |weighted AS (
      |  SELECT user_id, pow(0.8, rn - 1) AS wt, "value"
      |  FROM latest WHERE rn <= 20)
      |SELECT user_id, COUNT(*) AS n_used,
      |  (sign(CAST(SUM(CAST(wt * "value" AS DECIMAL(28,14))) AS DOUBLE) /
      |        CAST(SUM(CAST(wt AS DECIMAL(28,14))) AS DOUBLE)) * floor(abs(CAST(SUM(CAST(wt * "value" AS DECIMAL(28,14))) AS DOUBLE) /
      |        CAST(SUM(CAST(wt AS DECIMAL(28,14))) AS DOUBLE)) * 1e4 + 0.5) / 1e4) AS ewm_value
      |FROM weighted GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Gap-based sessionization (30-min inactivity gap): lag + cumulative
    * new-session flags, then per-user session stats. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum("new_session").as("n_sessions"))
      .withColumn("events_per_session",
        r4(col("n_events").cast(DoubleType) / col("n_sessions")))
      .orderBy("user_id")
  }

  private val sessionizeOracle =
    """WITH flagged AS (
      |  SELECT user_id,
      |    CASE WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800 * 1000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events)
      |SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(new_session) AS BIGINT) AS n_sessions,
      |  (sign(CAST(COUNT(*) AS DOUBLE) / SUM(new_session)) * floor(abs(CAST(COUNT(*) AS DOUBLE) / SUM(new_session)) * 1e4 + 0.5) / 1e4) AS events_per_session
      |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin

  /** As-of join: each purchase matched to the user's latest click at or
    * before it. Implemented as union + last_value-over-ordered-stream —
    * a single shuffle on user_id (contrast with an exploding range
    * join); DuckDB oracle uses a correlated max subquery. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
    // clicks sort before purchases at the same timestamp: "<=" semantics
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), when(col("event_type") === "click", 0).otherwise(1))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("last_click_us",
        last(when(col("event_type") === "click", col("us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("last_click_us"),
        (col("us") - col("last_click_us")).as("gap_us"))
      .orderBy("event_id")
  }

  private val asofJoinOracle =
    """SELECT e.event_id, e.user_id,
      |  (SELECT MAX(epoch_us(c.ts)) FROM events c
      |   WHERE c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts) AS last_click_us,
      |  epoch_us(e.ts) - (SELECT MAX(epoch_us(c.ts)) FROM events c
      |   WHERE c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts) AS gap_us
      |FROM events e WHERE e.event_type = 'purchase' ORDER BY e.event_id""".stripMargin

  /** Tumbling 1-hour window aggregation — batch twin of the structured
    * streaming pipeline (graft.streaming.EventStream). */
  def windowTumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("window_start", "event_type")

  private val windowTumblingOracle =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** "Last 7 days" daily KPI tile — the canonical time-bounded
    * dashboard query, routed through [[graft.Tables.eventsRange]] so
    * the ts bound reaches the parquet scan as a pushed filter (both
    * unit hypotheses OR'd against the raw int64 column; plan-audited
    * in Round7Spec). The window is pinned to the fixture's final week
    * so the oracle can embed the same literal bounds. At 100 TB this
    * is the difference between reading a week and reading the table. */
  def windowRecent(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsRange(spark, dir,
        1706054400000000L, 1706659200000000L) // [2024-01-24, 2024-01-31) UTC
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
      .orderBy("day", "event_type")

  private val windowRecentOracle =
    """SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-24 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-31 00:00:00'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Week-over-week growth: weekly revenue with lag + percent change
    * (the dashboard trend tile). */
  def growth(spark: SparkSession, dir: String): DataFrame = {
    // GLOBAL (unpartitioned) window by design: it runs over the per-WEEK
    // aggregate — |weeks in the observation window| rows at ANY data
    // scale — never over raw events, so the single-partition sort Spark
    // warns about holds a handful of rows.
    val w = Window.orderBy("week")
    Tables.events(spark, dir)
      .groupBy(date_trunc("week", col("ts")).as("week"))
      .agg(sumMoney(col("value")).as("revenue"))
      .withColumn("prev", lag("revenue", 1).over(w))
      .withColumn("pct_change",
        r4((col("revenue") - col("prev")) / col("prev") * 100))
      .select("week", "revenue", "pct_change")
      .orderBy("week")
  }

  private val growthOracle =
    s"""WITH weekly AS (
       |  SELECT date_trunc('week', ts) AS week,
       |    CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       |  FROM events GROUP BY 1)
       |SELECT week, revenue,
       |  ${rSql("(revenue - LAG(revenue) OVER (ORDER BY week)) / LAG(revenue) OVER (ORDER BY week) * 100", 4)} AS pct_change
       |FROM weekly ORDER BY week""".stripMargin

  /** IQR outlier detection per group (notebooks use scipy.stats.iqr):
    * bounds = [q1 − 1.5·IQR, q3 + 1.5·IQR], count the excursions. */
  def iqrOutliers(spark: SparkSession, dir: String): DataFrame = {
    // q1/q3 r6-PINNED before the fence arithmetic (the propTest
    // quantile-cutoff discipline): engine percentile interpolation can
    // differ by 1 ulp, and an unrounded hard fence would flip the
    // integer outlier counts across engines; lo/hi derived from pinned
    // inputs are pure IEEE, identical everywhere
    val q = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(r6(expr("percentile(value, 0.25)")).as("q1"),
        r6(expr("percentile(value, 0.75)")).as("q3"))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
    Tables.events(spark, dir).join(broadcast(q), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("lo") || col("value") > col("hi"), 1L)
          .otherwise(0L)).as("n_outliers"),
        r4(first("lo")).as("lo"), r4(first("hi")).as("hi"))
      .orderBy("event_type")
  }

  private val iqrOutliersOracle =
    s"""WITH q AS (
       |  SELECT event_type, ${rSql("quantile_cont(\"value\", 0.25)", 6)} AS q1,
       |    ${rSql("quantile_cont(\"value\", 0.75)", 6)} AS q3
       |  FROM events GROUP BY 1),
       |b AS (SELECT event_type, q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM q)
       |SELECT e.event_type, COUNT(*) AS n,
       |  CAST(SUM(CASE WHEN e."value" < b.lo OR e."value" > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       |  ${rSql("MIN(b.lo)", 4)} AS lo, ${rSql("MIN(b.hi)", 4)} AS hi
       |FROM events e JOIN b ON e.event_type = b.event_type
       |GROUP BY 1 ORDER BY e.event_type""".stripMargin

  /** The promo/maintenance windows joined in [[rangeJoin]] — literal
    * interval dim generated once, shared by plan and oracle. */
  private val promoWindows: Seq[(Int, String, String)] = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    Seq.tabulate(12) { i =>
      (i, base.plusHours(i * 50L).format(fmt), base.plusHours(i * 50L + 8).format(fmt))
    }
  }

  /** Interval (range) join: events falling inside promo windows,
    * `ts >= start AND ts < end` — through the library's bucketized
    * equi-join formulation (functions/Joins.bucketedRangeJoin; see its
    * doc for why Spark's native nested-loop plan dies at scale). */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val promos = promoWindows.toDF("promo_id", "start_s", "end_s")
      .select(col("promo_id"), col("start_s").cast("timestamp").as("start_ts"),
        col("end_s").cast("timestamp").as("end_ts"))
    graft.functions.Joins
      .bucketedRangeJoin(Tables.events(spark, dir), promos,
        col("ts"), col("start_ts"), col("end_ts"))
      .groupBy("promo_id")
      .agg(count(lit(1)).as("n_events"), sumMoney(col("value")).as("sum_value"))
      .orderBy("promo_id")
  }

  private val rangeJoinOracle = {
    val values = promoWindows.map { case (i, s, e) =>
      s"($i, TIMESTAMP '$s', TIMESTAMP '$e')"
    }.mkString(",\n  ")
    // the oracle states the SEMANTICS directly as a non-equi join; the
    // Spark side's bucketization must be invisible in the result
    s"""SELECT promo_id, COUNT(*) AS n_events,
       |  CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
       |FROM events e JOIN (VALUES
       |  $values) AS p(promo_id, start_ts, end_ts)
       |  ON e.ts >= p.start_ts AND e.ts < p.end_ts
       |GROUP BY 1 ORDER BY promo_id""".stripMargin
  }

  /** CUSUM change-point detection per event_type: cumulative sum of
    * daily-mean deviations from the series mean; the day of the maximum
    * |S| is the most likely level-shift point (the classical offline
    * CUSUM statistic behind trend-break detection dashboards).
    *
    * Determinism: daily means and the series mean are decimal-exact and
    * r6-rounded; the running sum accumulates DECIMAL deviations inside
    * an ordered window, so S is bit-identical across engines and
    * partitionings. Scale: everything after the first aggregation runs
    * over |event_type|·|days| rows. */
  def cusum(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(r6(sum(col("value").cast(d)).cast(DoubleType) / count(lit(1))).as("x"))
    val mu = daily.groupBy("event_type")
      .agg((sum(col("x").cast(d)).cast(DoubleType) / count(lit(1))).as("mu"),
        count(lit(1)).as("n_days"))
    val wCum = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily.join(mu, Seq("event_type"))
      .withColumn("s", sum((col("x") - col("mu")).cast(d)).over(wCum).cast(DoubleType))
      .withColumn("abs_s", r4(abs(col("s"))))
    val wRank = Window.partitionBy("event_type")
      .orderBy(col("abs_s").desc, col("day"))
    cum.withColumn("rn", row_number().over(wRank))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("change_day"),
        col("abs_s").as("max_cusum"), col("n_days"))
      .orderBy("event_type")
  }

  private val cusumOracle = {
    val xExpr = rSql("CAST(SUM(CAST(\"value\" AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)", 6)
    s"""WITH daily AS (
       |  SELECT event_type, date_trunc('day', ts) AS day, $xExpr AS x
       |  FROM events GROUP BY 1, 2),
       |mu AS (
       |  SELECT event_type,
       |    CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS mu,
       |    COUNT(*) AS n_days
       |  FROM daily GROUP BY 1),
       |cum AS (
       |  SELECT d.event_type, d.day, mu.n_days,
       |    CAST(SUM(CAST(d.x - mu.mu AS DECIMAL(28,6))) OVER (
       |      PARTITION BY d.event_type ORDER BY d.day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS s
       |  FROM daily d JOIN mu USING (event_type)),
       |ranked AS (
       |  SELECT *, ${rSql("abs(s)", 4)} AS abs_s,
       |    ROW_NUMBER() OVER (PARTITION BY event_type
       |      ORDER BY ${rSql("abs(s)", 4)} DESC, day) AS rn
       |  FROM cum)
       |SELECT event_type, day AS change_day, abs_s AS max_cusum, n_days
       |FROM ranked WHERE rn = 1 ORDER BY event_type""".stripMargin
  }

  /** Sample autocorrelation of the daily KPI series at lags 1–3 per
    * event_type (statsmodels acf convention: full-series mean and
    * denominator) — the carryover/seasonality diagnostic behind "is a
    * 1h switchback window long enough?" (interference shows up as
    * positive short-lag autocorrelation in the interval series).
    *
    * Determinism: daily means are r6-rounded (engine-identical), the
    * full-series mean is a decimal-exact mean of those, and every
    * product term (x_t−x̄)(x_{t−k}−x̄) is rounded to 6 decimals BEFORE
    * the decimal sum — so numerator and denominator never depend on FP
    * accumulation order. The series is |days| per event_type: the three
    * lag branches run over a dimension-sized frame, one shuffle each.
    */
  def acf(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(r6(sum(col("value").cast(d)).cast(DoubleType) / count(lit(1))).as("x"))
    val mu = daily.groupBy("event_type")
      .agg((sum(col("x").cast(d)).cast(DoubleType) / count(lit(1))).as("mu"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val base = daily.join(mu, Seq("event_type"))
      .withColumn("dev", col("x") - col("mu"))
    val branches = (1 to 3).map { k =>
      base.withColumn("dev_k", lag(col("dev"), k).over(w))
        .groupBy("event_type")
        .agg(
          count(col("dev_k")).as("n_pairs"),
          sum(r6(col("dev") * col("dev_k")).cast(d)).cast(DoubleType).as("num"),
          sum(r6(col("dev") * col("dev")).cast(d)).cast(DoubleType).as("den"))
        .select(col("event_type"), lit(k.toLong).as("lag"), col("n_pairs"),
          r4(col("num") / col("den")).as("acf"))
    }
    branches.reduce(_ unionAll _).orderBy("event_type", "lag")
  }

  private val acfOracle = {
    val xExpr = rSql("CAST(SUM(CAST(\"value\" AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)", 6)
    val branch = (k: Int) =>
      s"""SELECT event_type, CAST($k AS BIGINT) AS lag,
         |  COUNT(dev_k$k) AS n_pairs,
         |  ${rSql(s"(CAST(SUM(CAST(${rSql(s"(dev * dev_k$k)", 6)} AS DECIMAL(28,6))) AS DOUBLE) / CAST(SUM(CAST(${rSql("(dev * dev)", 6)} AS DECIMAL(28,6))) AS DOUBLE))", 4)} AS acf
         |FROM lagged GROUP BY event_type""".stripMargin
    s"""WITH daily AS (
       |  SELECT event_type, date_trunc('day', ts) AS day, $xExpr AS x
       |  FROM events GROUP BY 1, 2),
       |mu AS (
       |  SELECT event_type,
       |    CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS mu
       |  FROM daily GROUP BY 1),
       |devs AS (
       |  SELECT d.event_type, d.day, d.x - mu.mu AS dev
       |  FROM daily d JOIN mu USING (event_type)),
       |lagged AS (
       |  SELECT event_type, day, dev,
       |    LAG(dev, 1) OVER (PARTITION BY event_type ORDER BY day) AS dev_k1,
       |    LAG(dev, 2) OVER (PARTITION BY event_type ORDER BY day) AS dev_k2,
       |    LAG(dev, 3) OVER (PARTITION BY event_type ORDER BY day) AS dev_k3
       |  FROM devs)
       |${branch(1)} UNION ALL ${branch(2)} UNION ALL ${branch(3)}
       |ORDER BY event_type, lag""".stripMargin
  }

  /** Per-user trailing-1h rolling metrics through a RANGE window frame
    * (time-based, not row-based: the frame is "all my events in the
    * last hour", however many rows that is) — the per-entity rate/
    * velocity feature (fraud counters, rate limits, engagement
    * velocity). RANGE frames include order-key peers identically in
    * Spark and DuckDB; the key is exact integer microseconds
    * (unix_micros ↔ epoch_us — the source data is µs-grained), the
    * rolling sum decimal-exact.
    *
    * Scale: partitioned by user — shuffles once on user_id, each
    * partition an independent ordered pass; no global sort. */
  def windowRange(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(28, 6)
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-3600000000L, 0L)
    Tables.events(spark, dir)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", sum(col("value").cast(dec)).over(w).cast(DoubleType))
      .select(col("event_id"), col("user_id"), col("n_1h"),
        r4(col("sum_1h")).as("sum_1h"))
      .orderBy("event_id")
  }

  private val windowRangeOracle =
    s"""SELECT event_id, user_id,
       |  COUNT(*) OVER w AS n_1h,
       |  ${rSql("CAST(SUM(CAST(\"value\" AS DECIMAL(28,6))) OVER w AS DOUBLE)", 4)} AS sum_1h
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
       |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin

  /** SCD type-2 history construction: each observation of a per-user
    * measure becomes a validity interval [valid_from, valid_to), the
    * open current row carrying NULL valid_to — the lead()-based
    * dimension-history build every warehouse runs on entity snapshots.
    * Ordering ties on ts break by event_id so the intervals are
    * deterministic. Window partitioned by user: one shuffle, no global
    * sort. */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .filter(col("user_id") < 5)
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("ts").as("valid_from"),
        col("valid_to"), col("value"))
      .orderBy("user_id", "valid_from", "event_id")
  }

  private val scd2Oracle =
    """SELECT user_id, event_id, ts AS valid_from,
      |  LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |  "value"
      |FROM events WHERE user_id < 5
      |ORDER BY user_id, valid_from, event_id""".stripMargin

  /** Cohort retention matrix: users cohort by their first-activity
    * week; each later active week increments (cohort, offset) — the
    * canonical product-analytics triangle. Two aggregations (first
    * week per user, distinct user-weeks) joined on user: both shuffle
    * on user_id, the matrix itself is |weeks|² — dimension-sized. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val weeks = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    val cohorts = weeks.groupBy("user_id").agg(min("week").as("cohort_week"))
    weeks.join(cohorts, Seq("user_id"))
      .select(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  private val retentionOracle =
    """WITH weeks AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      |  FROM events),
      |cohorts AS (SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY 1)
      |SELECT cohort_week,
      |  CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_offset,
      |  COUNT(*) AS n_users
      |FROM weeks JOIN cohorts USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  /** First-touch funnel per day: click → view → purchase, each step
    * counted only when its FIRST event follows the previous step's
    * first event (strictly increasing first-touch chain — the
    * deterministic funnel definition that needs no per-row sequence
    * scan). One aggregation pivots the three first-touch timestamps
    * per (user, day); a second counts step survivors per day. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val firsts = Tables.events(spark, dir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
    val s1 = col("t_click").isNotNull
    val s2 = s1 && col("t_view").isNotNull && col("t_view") > col("t_click")
    val s3 = s2 && col("t_purchase").isNotNull && col("t_purchase") > col("t_view")
    firsts.groupBy("day")
      .agg(
        sum(when(s1, 1L).otherwise(0L)).as("n_click"),
        sum(when(s2, 1L).otherwise(0L)).as("n_view_after"),
        sum(when(s3, 1L).otherwise(0L)).as("n_purchase_after"))
      .filter(col("n_click") > 0)
      .select(col("day"), col("n_click"), col("n_view_after"), col("n_purchase_after"),
        r4(col("n_purchase_after").cast(DoubleType) / col("n_click")).as("conversion"))
      .orderBy("day")
  }

  private val funnelOracle =
    s"""WITH firsts AS (
       |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
       |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
       |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
       |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
       |  FROM events GROUP BY 1, 2),
       |flags AS (
       |  SELECT day,
       |    (t_click IS NOT NULL) AS s1,
       |    (t_click IS NOT NULL AND t_view IS NOT NULL AND t_view > t_click) AS s2,
       |    (t_click IS NOT NULL AND t_view IS NOT NULL AND t_view > t_click
       |      AND t_purchase IS NOT NULL AND t_purchase > t_view) AS s3
       |  FROM firsts)
       |SELECT day,
       |  CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       |  CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_view_after,
       |  CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_after,
       |  ${rSql("(CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS DOUBLE) / SUM(CASE WHEN s1 THEN 1 ELSE 0 END))", 4)} AS conversion
       |FROM flags GROUP BY 1
       |HAVING SUM(CASE WHEN s1 THEN 1 ELSE 0 END) > 0
       |ORDER BY day""".stripMargin

  /** Day-of-week seasonal decomposition of the daily KPI per
    * event_type — the weekday-effect profile a switchback analyst
    * checks before choosing window lengths (weekday confounding is the
    * reason the reference randomizes over day×hour windows at all).
    * index = dow_mean / overall_mean of the daily value sum; >1 means
    * that weekday runs hot. dow is pure integer arithmetic
    * ((epoch_day + 4) % 7 — epoch day 0, a Thursday, maps to 4, so
    * 0 = Sunday, 1 = Monday, …, 6 = Saturday), so both engines bucket
    * identically; daily sums are decimal-exact and divided in a fixed
    * order.
    *
    * Scale: one shuffle to |event_type × day| daily rows, then an
    * aggregation over ≤7·|event_type| rows — the overall mean rides
    * along via a window over the tiny dow frame, no second fact pass.
    */
  def seasonality(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(epochDay).as("day"), col("value"))
      .groupBy("event_type", "day")
      .agg(sum(col("value").cast(d)).as("day_sum"))
      .withColumn("dow", pmod(col("day") + 4, lit(7)))
    val byDow = daily.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_days"),
        sum("day_sum").as("dow_sum"))
    val w = Window.partitionBy("event_type")
    val dowMean = col("dow_sum").cast(DoubleType) / col("n_days")
    val overallMean = sum("dow_sum").over(w).cast(DoubleType) /
      sum("n_days").over(w)
    byDow.select(col("event_type"), col("dow"), col("n_days"),
        r6(dowMean).as("dow_mean"),
        r6(dowMean / overallMean).as("seasonal_index"))
      .orderBy("event_type", "dow")
  }

  private val seasonalityOracle =
    s"""WITH daily AS (
       |  SELECT event_type, $epochDaySql AS day,
       |    SUM(CAST("value" AS DECIMAL(28,6))) AS day_sum
       |  FROM events GROUP BY 1, 2),
       |bydow AS (
       |  SELECT event_type, (day + 4) % 7 AS dow, COUNT(*) AS n_days,
       |    SUM(day_sum) AS dow_sum
       |  FROM daily GROUP BY 1, 2)
       |SELECT event_type, dow, n_days,
       |  ${rSql("(CAST(dow_sum AS DOUBLE) / n_days)", 6)} AS dow_mean,
       |  ${rSql(
          "((CAST(dow_sum AS DOUBLE) / n_days) / (CAST(SUM(dow_sum) OVER (PARTITION BY event_type) AS DOUBLE) / SUM(n_days) OVER (PARTITION BY event_type)))",
          6)} AS seasonal_index
       |FROM bydow ORDER BY event_type, dow""".stripMargin

  /** Mann-Kendall trend test over the daily KPI per event_type — the
    * nonparametric monotone-trend check an experimentation platform
    * runs on a guardrail metric before attributing movement to a
    * treatment (drift and treatment effects are confounded in a
    * switchback if the KPI trends). S = Σ_{i<j} sign(xⱼ − xᵢ) over
    * daily value sums; tie-corrected normal approximation
    * Var = [n(n−1)(2n+5) − Σₜ t(t−1)(2t+5)]/18, z = (S ∓ 1)/√Var
    * (continuity correction toward 0).
    *
    * Scale + determinism: ONE fact pass aggregates to |event_type ×
    * day| decimal-exact daily sums; the O(days²) pairwise sign join
    * and the tie rollup run on that tiny frame (days, not events —
    * at 100 TB the day count is still ~10³). sign() compares exact
    * DECIMALs and everything stays integer until the final /18 and
    * √, so both engines agree bit-for-bit. */
  def mannKendall(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(date_trunc('day', ts)) div 86400000000").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg(sum(col("value").cast(d)).as("v"))
    val a = daily.select(col("event_type"), col("day").as("di"), col("v").as("vi"))
    val b = daily.select(col("event_type"), col("day").as("dj"), col("v").as("vj"))
    val s = a.join(b, Seq("event_type")).filter(col("di") < col("dj"))
      .groupBy("event_type")
      .agg(sum(signum(col("vj") - col("vi")).cast("long")).as("s_stat"))
    val ties = daily.groupBy("event_type", "v").agg(count(lit(1)).as("t"))
      .groupBy("event_type")
      .agg(sum(col("t")).as("n"),
        sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tie_term"))
    s.join(ties, "event_type")
      .withColumn("var_s",
        (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("tie_term"))
          .cast(DoubleType) / 18.0)
      .withColumn("z", when(col("s_stat") === 0, lit(0.0)).otherwise(
        r4((col("s_stat") - signum(col("s_stat"))).cast(DoubleType) / sqrt(col("var_s")))))
      .select(col("event_type"), col("n").cast("long").as("n_days"),
        col("s_stat"), r6(col("var_s")).as("var_s"), col("z"),
        (abs(col("z")) > lit(1.96)).as("trend_sig"))
      .orderBy("event_type")
  }

  private val mannKendallOracle: String =
    s"""WITH daily AS (
       |  SELECT event_type,
       |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day,
       |    SUM(CAST("value" AS DECIMAL(28,6))) AS v
       |  FROM events GROUP BY 1, 2),
       |s AS (
       |  SELECT a.event_type,
       |    CAST(SUM(CAST(sign(b.v - a.v) AS BIGINT)) AS BIGINT) AS s_stat
       |  FROM daily a JOIN daily b
       |    ON a.event_type = b.event_type AND a.day < b.day
       |  GROUP BY 1),
       |ties AS (
       |  SELECT event_type, CAST(SUM(t) AS BIGINT) AS n,
       |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
       |  FROM (SELECT event_type, v, COUNT(*) AS t FROM daily GROUP BY 1, 2)
       |  GROUP BY 1),
       |fin AS (
       |  SELECT s.event_type, n, s_stat, tie_term,
       |    CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18.0 AS var_s
       |  FROM s JOIN ties ON s.event_type = ties.event_type)
       |SELECT event_type, n AS n_days, s_stat,
       |  ${rSql("var_s", 6)} AS var_s,
       |  CASE WHEN s_stat = 0 THEN 0.0
       |    ELSE ${rSql("(CAST(s_stat - sign(s_stat) AS DOUBLE) / sqrt(var_s))", 4)} END AS z,
       |  abs(CASE WHEN s_stat = 0 THEN 0.0
       |    ELSE ${rSql("(CAST(s_stat - sign(s_stat) AS DOUBLE) / sqrt(var_s))", 4)} END) > 1.96 AS trend_sig
       |FROM fin ORDER BY event_type""".stripMargin

  /** Kaplan–Meier survival curve: time from a user's FIRST event to
    * their first 'purchase' (event), censored at their last observed
    * event otherwise — the duration-KPI readout (time-to-conversion /
    * time-to-delivery) that a mean hides when censoring is informative.
    * Units split into two arms by user parity (the user-level A/B
    * analog of the switchback assignment), S(t) = Π_{t'≤t} (1 − d/n)
    * per arm at each event time.
    *
    * Determinism: the product runs in log space on the q_ngram_lm
    * discipline — each ln(1−d/n) term r6-rounded THEN DECIMAL-summed
    * (order-invariant), exp + r4 at readout; a d=n terminal row (the
    * whole risk set dies) is emitted as an exact 0.0 in both engines
    * (Spark ln(0) is NULL, DuckDB's is -inf — the CASE keeps the
    * engines agreeing).
    *
    * Scale: one groupBy(user) pass over the fact (the only full
    * shuffle), then all KM arithmetic happens on the |arms|×|distinct
    * durations| frame — windows there scan dozens of rows, not the
    * corpus. */
  def survivalKm(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(28, 6)
    val perUser = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("t0"),
        min(when(col("event_type") === "purchase", to_date(col("ts")))).as("tp"),
        max(to_date(col("ts"))).as("tmax"))
    val units = perUser.select(
      (col("user_id") % 2).as("grp"),
      when(col("tp").isNotNull, datediff(col("tp"), col("t0")))
        .otherwise(datediff(col("tmax"), col("t0"))).cast("long").as("dur"),
      when(col("tp").isNotNull, 1L).otherwise(0L).as("is_ev"))
    val byDur = units.groupBy("grp", "dur")
      .agg(sum(col("is_ev")).as("d"), count(lit(1)).as("c"))
    val wTot = Window.partitionBy("grp")
    val wPrev = Window.partitionBy("grp").orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byDur
      .withColumn("n_risk",
        sum(col("c")).over(wTot) - coalesce(sum(col("c")).over(wPrev), lit(0L)))
      .filter(col("d") > 0)
      .withColumn("lnterm", when(col("d") === col("n_risk"), lit(0.0))
        .otherwise(r6(log(lit(1.0) - col("d") / col("n_risk")))))
    val wKm = Window.partitionBy("grp").orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, 0)
    risk
      .withColumn("cum", sum(col("lnterm").cast(dec)).over(wKm).cast(DoubleType))
      .select(col("grp"), col("dur").as("t"), col("n_risk"), col("d").as("d_events"),
        when(col("d") === col("n_risk"), lit(0.0)).otherwise(r4(exp(col("cum")))).as("s_km"))
      .orderBy("grp", "t")
  }

  private val survivalKmOracle: String =
    s"""WITH per_user AS (
       |  SELECT user_id, MIN(CAST(ts AS DATE)) AS t0,
       |    MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END) AS tp,
       |    MAX(CAST(ts AS DATE)) AS tmax
       |  FROM events GROUP BY user_id),
       |units AS (
       |  SELECT user_id % 2 AS grp,
       |    CAST(CASE WHEN tp IS NOT NULL THEN date_diff('day', t0, tp)
       |         ELSE date_diff('day', t0, tmax) END AS BIGINT) AS dur,
       |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS is_ev
       |  FROM per_user),
       |by_dur AS (
       |  SELECT grp, dur, CAST(SUM(is_ev) AS BIGINT) AS d, COUNT(*) AS c
       |  FROM units GROUP BY grp, dur),
       |risk AS (
       |  SELECT grp, dur, d,
       |    CAST(SUM(c) OVER (PARTITION BY grp)
       |      - COALESCE(SUM(c) OVER (PARTITION BY grp ORDER BY dur
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
       |  FROM by_dur),
       |evr AS (
       |  SELECT grp, dur, d, n_risk,
       |    CASE WHEN d = n_risk THEN 0.0
       |      ELSE ${rSql("ln(1.0 - d / n_risk)", 6)} END AS lnterm
       |  FROM risk WHERE d > 0),
       |km AS (
       |  SELECT grp, dur, d, n_risk,
       |    CAST(SUM(CAST(lnterm AS DECIMAL(28,6))) OVER (PARTITION BY grp ORDER BY dur
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum
       |  FROM evr)
       |SELECT grp, dur AS t, n_risk, d AS d_events,
       |  CASE WHEN d = n_risk THEN 0.0 ELSE ${rSql("exp(cum)", 4)} END AS s_km
       |FROM km ORDER BY grp, t""".stripMargin

  /** Population stability index — the drift tripwire between a
    * reference period (first half of the observation window, split at
    * the q_did data-derived midpoint) and the current period: bin the
    * reference's value distribution per event_type into quintiles, then
    * PSI = Σ_bins (q−p)·ln(q/p) of current-vs-reference bin shares
    * (add-half smoothed). PSI ≥ 0.2 is the conventional "investigate"
    * threshold — the metric a 100 TB feature pipeline computes per
    * column per day to catch upstream shifts before they poison
    * training.
    *
    * Determinism: quintile cuts come from the interpolating exact
    * percentile (the q_quantiles-proven quantile_cont pairing),
    * r6-rounded BEFORE the strict > comparisons so both engines bin
    * identically; each PSI term is r6-rounded then DECIMAL-summed.
    *
    * Scale: one aggregation for cuts (swap in the mergeable
    * q_qsketch aggregate at real scale), cuts broadcast back for a
    * scan-local bin assignment, one groupBy for counts; all PSI
    * arithmetic on the |types|×5 frame. */
  def psi(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(28, 6)
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value"), expr(epochDay).as("day"))
    val mid = ev.agg(((min("day") + max("day") + 1) / 2).cast("long").as("mid_day"))
    val tagged = ev.crossJoin(broadcast(mid))
      .withColumn("period", when(col("day") < col("mid_day"), "ref").otherwise("cur"))
    val cuts = tagged.filter(col("period") === "ref")
      .groupBy("event_type")
      .agg(expr("transform(percentile(value, array(0.2, 0.4, 0.6, 0.8)), " +
        "c -> sign(c) * floor(abs(c) * 1e6 + 0.5) / 1e6)").as("cuts"))
    val counts = tagged.join(broadcast(cuts), "event_type")
      .withColumn("bin",
        expr("aggregate(cuts, 0, (acc, c) -> acc + (CASE WHEN value > c THEN 1 ELSE 0 END))"))
      .groupBy("event_type", "period", "bin").agg(count(lit(1)).as("c"))
    val grid = cuts.select(col("event_type"), explode(expr("sequence(0, 4)")).as("bin"))
    val both = grid
      .join(counts.filter(col("period") === "ref")
        .select(col("event_type"), col("bin"), col("c").as("c_ref")), Seq("event_type", "bin"), "left")
      .join(counts.filter(col("period") === "cur")
        .select(col("event_type"), col("bin"), col("c").as("c_cur")), Seq("event_type", "bin"), "left")
      .select(col("event_type"), col("bin"),
        coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"))
    val tot = both.groupBy("event_type")
      .agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"))
    both.join(tot, "event_type")
      .withColumn("p", expr("(c_ref + 0.5) / (n_ref + 2.5)"))
      .withColumn("q", expr("(c_cur + 0.5) / (n_cur + 2.5)"))
      .withColumn("term", r6((col("q") - col("p")) * log(col("q") / col("p"))))
      .groupBy("event_type")
      .agg(max("n_ref").as("n_ref"), max("n_cur").as("n_cur"),
        r4(sum(col("term").cast(dec)).cast(DoubleType)).as("psi"))
      .withColumn("drift", col("psi") >= 0.2)
      .orderBy("event_type")
  }

  private val psiOracle: String = {
    val cut6 = rSql("c", 6)
    s"""WITH ev AS (
       |  SELECT event_type, "value",
       |    (epoch_us(date_trunc('day', ts)) // 86400000000) AS day
       |  FROM events),
       |mid AS (SELECT CAST((MIN(day) + MAX(day) + 1) // 2 AS BIGINT) AS mid_day FROM ev),
       |tagged AS (
       |  SELECT event_type, "value",
       |    CASE WHEN day < mid_day THEN 'ref' ELSE 'cur' END AS period
       |  FROM ev CROSS JOIN mid),
       |cuts AS (
       |  SELECT event_type,
       |    list_transform(quantile_cont("value", [0.2, 0.4, 0.6, 0.8]), c -> $cut6) AS cuts
       |  FROM tagged WHERE period = 'ref' GROUP BY event_type),
       |binned AS (
       |  SELECT t.event_type, t.period,
       |    list_sum(list_transform(cx.cuts,
       |      bc -> CASE WHEN t."value" > bc THEN 1 ELSE 0 END)) AS bin
       |  FROM tagged t JOIN cuts cx ON t.event_type = cx.event_type),
       |counts AS (
       |  SELECT event_type, period, bin, COUNT(*) AS c
       |  FROM binned GROUP BY 1, 2, 3),
       |grid AS (
       |  SELECT cuts.event_type, g.bin
       |  FROM cuts CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS bin) g),
       |cells AS (
       |  SELECT grid.event_type, grid.bin,
       |    COALESCE(r.c, 0) AS c_ref, COALESCE(cu.c, 0) AS c_cur
       |  FROM grid
       |  LEFT JOIN counts r ON r.event_type = grid.event_type AND r.bin = grid.bin AND r.period = 'ref'
       |  LEFT JOIN counts cu ON cu.event_type = grid.event_type AND cu.bin = grid.bin AND cu.period = 'cur'),
       |tot AS (
       |  SELECT event_type, CAST(SUM(c_ref) AS BIGINT) AS n_ref,
       |    CAST(SUM(c_cur) AS BIGINT) AS n_cur
       |  FROM cells GROUP BY event_type),
       |terms AS (
       |  SELECT cells.event_type, tot.n_ref, tot.n_cur,
       |    ${rSql("(((c_cur + 0.5) / (n_cur + 2.5) - (c_ref + 0.5) / (n_ref + 2.5)) * ln(((c_cur + 0.5) / (n_cur + 2.5)) / ((c_ref + 0.5) / (n_ref + 2.5))))", 6)} AS term
       |  FROM cells JOIN tot ON cells.event_type = tot.event_type)
       |SELECT event_type, MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur,
       |  ${rSql("(CAST(SUM(CAST(term AS DECIMAL(28,6))) AS DOUBLE))", 4)} AS psi,
       |  ${rSql("(CAST(SUM(CAST(term AS DECIMAL(28,6))) AS DOUBLE))", 4)} >= 0.2 AS drift
       |FROM terms GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  // -------------------------------------------------- MAD anomaly detection

  /** Robust anomaly detection on the daily KPI series: per event_type,
    * the modified z-score rz = 0.6745·(x − median)/MAD (Iglewicz &
    * Hoaglin 1993) flags days whose mean breaks from the series —
    * median/MAD stay put when the anomaly itself would drag a
    * mean/stddev threshold (the masking failure of plain z-scores).
    * Flag at |rz| > 2.5, computed on the r4-rounded score so both
    * engines flag identically at the boundary.
    *
    * Scale: the fact table is touched by ONE aggregation; medians and
    * deviations run on the |types × days| daily frame (exact
    * interpolating percentile, the q_quantiles pairing). */
  def madAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    def nz(c: Column): Column = when(c =!= 0, c)
    // daily feeds med, dev AND mad — persist the tiny |types×days|
    // frame so the events aggregation runs once (static planning does
    // not reuse the identical exchanges; the q_spearman discipline)
    val daily = graft.CacheScope.track(Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(r6(sum(col("value").cast(d)).cast(DoubleType) / count(lit(1))).as("x"))
      .persist())
    // med/MAD r6-pinned BEFORE absdev/rz (the q_prop_test/q_cmh levene
    // discipline): a 1-ulp interpolation gap between Spark percentile
    // and DuckDB quantile_cont must not flip is_anomaly at the boundary
    val med = daily.groupBy("event_type").agg(r6(expr("percentile(x, 0.5)")).as("med"))
    val dev = daily.join(med, Seq("event_type"))
      .withColumn("absdev", abs(col("x") - col("med")))
    val mad = dev.groupBy("event_type").agg(r6(expr("percentile(absdev, 0.5)")).as("mad"))
    dev.join(mad, Seq("event_type"))
      .withColumn("rz", r4(lit(0.6745) * (col("x") - col("med")) / nz(col("mad"))))
      .select(col("event_type"), col("day"), col("x").as("daily_mean"),
        r4(col("med")).as("med"), r4(col("mad")).as("mad_v"),
        col("rz"), (abs(col("rz")) > 2.5).as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  private val madAnomalyOracle = {
    val xExpr = rSql("CAST(SUM(CAST(\"value\" AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)", 6)
    val rz = rSql("(0.6745 * (x - med) / NULLIF(mad, 0))", 4)
    s"""WITH daily AS (
       |  SELECT event_type, date_trunc('day', ts) AS day, $xExpr AS x
       |  FROM events GROUP BY 1, 2),
       |med AS (
       |  SELECT event_type, ${rSql("quantile_cont(x, 0.5)", 6)} AS med FROM daily GROUP BY 1),
       |dev AS (
       |  SELECT d.event_type, d.day, d.x, m.med, abs(d.x - m.med) AS absdev
       |  FROM daily d JOIN med m USING (event_type)),
       |mad AS (
       |  SELECT event_type, ${rSql("quantile_cont(absdev, 0.5)", 6)} AS mad FROM dev GROUP BY 1)
       |SELECT d.event_type, d.day, d.x AS daily_mean,
       |  ${rSql("med", 4)} AS med, ${rSql("mad", 4)} AS mad_v,
       |  $rz AS rz, (abs($rz) > 2.5) AS is_anomaly
       |FROM dev d JOIN mad USING (event_type)
       |ORDER BY event_type, day""".stripMargin
  }

  // ------------------------------------------- additive seasonal decompose

  /** Additive seasonal decomposition of the daily KPI series per
    * event_type (statsmodels seasonal_decompose, period=7): trend =
    * centered 7-day moving average (full windows only), seasonal =
    * per-day-of-week mean of the detrended series, residual = x −
    * trend − seasonal — the notebooks' "is the movement weekday
    * pattern or real trend?" decomposition as one operator, feeding
    * window-length choices the same way q_seasonality's index does.
    *
    * Determinism: daily means are r6; the trend's 7-day sum runs in
    * DECIMAL over those r6 values; seasonal means are r6-then-DECIMAL
    * sums of the (identical-both-engines) detrended doubles; dow uses
    * the integer epoch-day formula (0 = Sunday, the q_seasonality
    * convention).
    *
    * Scale: one fact aggregation; every window/join after runs on the
    * |types × days| daily frame. */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(epochDay).as("day"), col("value"))
      .groupBy("event_type", "day")
      .agg(r6(sum(col("value").cast(d)).cast(DoubleType) / count(lit(1))).as("x"))
      .withColumn("dow", pmod(col("day") + 4, lit(7)))
    // RANGE over the integer day, not ROWS: a calendar gap must void
    // the centered 7-day window, not silently stretch it across 8+ days
    val w7 = Window.partitionBy("event_type").orderBy("day").rangeBetween(-3, 3)
    // withTrend feeds the seasonal rollup AND the final join — persist
    // the multi-branch frame so the sort+window runs once (the
    // madAnomaly/spearman discipline, one level up from daily)
    val withTrend = graft.CacheScope.track(daily
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("trend",
        when(col("n7") === 7, sum(col("x").cast(d)).over(w7).cast(DoubleType) / 7))
      .drop("n7")
      .persist())
    // per-dow means of the detrended series, then CENTERED by the mean
    // of the dow means (statsmodels: period_averages -= mean) so the
    // seasonal component sums to ~0 and carries no level
    val wType = Window.partitionBy("event_type")
    val seasonal = withTrend.filter(col("trend").isNotNull)
      .withColumn("det", col("x") - col("trend"))
      .groupBy("event_type", "dow")
      .agg((sum(r6(col("det")).cast(d)).cast(DoubleType) / count(lit(1))).as("s0"))
      .withColumn("s", col("s0") -
        sum(r6(col("s0")).cast(d)).over(wType).cast(DoubleType) /
          count(lit(1)).over(wType))
    withTrend.join(seasonal.select("event_type", "dow", "s"),
        Seq("event_type", "dow"), "left")
      .select(col("event_type"), col("day"), col("dow"), col("x").as("daily_mean"),
        r4(col("trend")).as("trend"), r4(col("s")).as("seasonal"),
        r4(col("x") - col("trend") - col("s")).as("residual"))
      .orderBy("event_type", "day")
  }

  private val seasonalDecomposeOracle = {
    val xExpr = rSql("CAST(SUM(CAST(\"value\" AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)", 6)
    s"""WITH daily AS (
       |  SELECT event_type,
       |    $epochDaySql AS day,
       |    $xExpr AS x
       |  FROM events GROUP BY 1, 2),
       |dailyd AS (
       |  SELECT event_type, day, x, (day + 4) % 7 AS dow FROM daily),
       |wt AS (
       |  SELECT event_type, day, dow, x,
       |    CASE WHEN COUNT(*) OVER w = 7
       |      THEN CAST(SUM(CAST(x AS DECIMAL(28,6))) OVER w AS DOUBLE) / 7 END AS trend
       |  FROM dailyd
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day
       |    RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       |seasonal0 AS (
       |  SELECT event_type, dow,
       |    CAST(SUM(CAST(${rSql("(x - trend)", 6)} AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS s0
       |  FROM wt WHERE trend IS NOT NULL GROUP BY 1, 2),
       |seasonal AS (
       |  SELECT event_type, dow,
       |    s0 - CAST(SUM(CAST(${rSql("s0", 6)} AS DECIMAL(28,6)))
       |      OVER (PARTITION BY event_type) AS DOUBLE) /
       |      COUNT(*) OVER (PARTITION BY event_type) AS s
       |  FROM seasonal0)
       |SELECT wt.event_type, day, wt.dow, x AS daily_mean,
       |  ${rSql("trend", 4)} AS trend, ${rSql("s", 4)} AS seasonal,
       |  ${rSql("(x - trend - s)", 4)} AS residual
       |FROM wt LEFT JOIN seasonal
       |  ON wt.event_type = seasonal.event_type AND wt.dow = seasonal.dow
       |ORDER BY wt.event_type, day""".stripMargin
  }

  // ------------------------------------------------------- cohort LTV curves

  /** Cohort lifetime-value curves — the revenue companion of
    * q_retention: users cohort by first-activity week, each
    * (cohort, week-offset) cell carries that week's active users and
    * revenue, and the running DECIMAL cumulative revenue yields the
    * LTV-per-user curve product teams read payback periods from.
    *
    * Scale: one distinct-reduction + one aggregation over the fact
    * table; the cumulative window runs over the |cohorts × offsets|
    * cell frame (never raw events), exactly like q_retention. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("value"),
        date_trunc("week", col("ts")).cast("date").as("week"))
    // cohorts feeds the cell join AND the sizes rollup — persist the
    // |users|-row frame so the fact table is scanned twice total
    // (cohort build + cells), the q_retention budget
    val cohorts = graft.CacheScope.track(
      ev.groupBy("user_id").agg(min("week").as("cohort_week")).persist())
    val cells = ev.join(cohorts, Seq("user_id"))
      .select(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_offset"),
        col("user_id"), col("value"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_active"),
        sum(col("value").cast(d)).as("rev_d"))
    val sizes = cohorts.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    val w = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.withColumn("cum_d", sum("rev_d").over(w))
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        r2(col("rev_d").cast(DoubleType)).as("revenue"),
        r2(col("cum_d").cast(DoubleType)).as("cum_revenue"),
        r4(col("cum_d").cast(DoubleType) / col("cohort_size")).as("ltv_per_user"))
      .orderBy("cohort_week", "week_offset")
  }

  private val cohortLtvOracle =
    s"""WITH ev AS (
       |  SELECT user_id, "value", CAST(date_trunc('week', ts) AS DATE) AS week
       |  FROM events),
       |cohorts AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY 1),
       |cells AS (
       |  SELECT cohort_week,
       |    CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_offset,
       |    COUNT(DISTINCT user_id) AS n_active,
       |    SUM(CAST("value" AS DECIMAL(28,6))) AS rev_d
       |  FROM ev JOIN cohorts USING (user_id)
       |  GROUP BY 1, 2),
       |sizes AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM cohorts GROUP BY 1),
       |cum AS (
       |  SELECT c.*, SUM(rev_d) OVER (PARTITION BY cohort_week ORDER BY week_offset
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_d
       |  FROM cells c)
       |SELECT cohort_week, week_offset, n_active, cohort_size,
       |  ${rSql("CAST(rev_d AS DOUBLE)", 2)} AS revenue,
       |  ${rSql("CAST(cum_d AS DOUBLE)", 2)} AS cum_revenue,
       |  ${rSql("(CAST(cum_d AS DOUBLE) / cohort_size)", 4)} AS ltv_per_user
       |FROM cum JOIN sizes USING (cohort_week)
       |ORDER BY cohort_week, week_offset""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q_acf", acf, Some(acfOracle)),
    Op("q_mad_anomaly", madAnomaly, Some(madAnomalyOracle)),
    Op("q_seasonal_decompose", seasonalDecompose, Some(seasonalDecomposeOracle)),
    Op("q_cohort_ltv", cohortLtv, Some(cohortLtvOracle)),
    Op("q_survival", survivalKm, Some(survivalKmOracle)),
    Op("q_psi", psi, Some(psiOracle)),
    Op("q_mann_kendall", mannKendall, Some(mannKendallOracle)),
    Op("q_seasonality", seasonality, Some(seasonalityOracle)),
    Op("q_window_range", windowRange, Some(windowRangeOracle)),
    Op("q_scd2", scd2, Some(scd2Oracle)),
    Op("q_retention", retention, Some(retentionOracle)),
    Op("q_funnel", funnel, Some(funnelOracle)),
    Op("q_growth", growth, Some(growthOracle)),
    Op("q_cusum", cusum, Some(cusumOracle)),
    Op("q_iqr_outliers", iqrOutliers, Some(iqrOutliersOracle)),
    Op("q_ewm", ewm, Some(ewmOracle)),
    Op("q_sessionize", sessionize, Some(sessionizeOracle), headline = true),
    Op("q_asof_join", asofJoin, Some(asofJoinOracle), headline = true),
    Op("q_range_join", rangeJoin, Some(rangeJoinOracle)),
    Op("q_window_tumbling", windowTumbling, Some(windowTumblingOracle)),
    Op("q_window_recent", windowRecent, Some(windowRecentOracle)),
  )
}
