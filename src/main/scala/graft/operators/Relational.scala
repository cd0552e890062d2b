package graft.operators

import graft.{Op, Tables}
import graft.functions.Compat._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Relational / ETL core — the reference's BigQuery SQL surface
  * re-expressed as declarative Spark plans (SURVEY.md §2 block A).
  *
  * Shapes mirrored from the reference
  * (sql_queries/data_extraction_queries_automated_script.sql):
  *  - multi-way star joins + IN-subquery semi-joins (lines 296-354)
  *  - NOT-IN zone exclusion (py_scripts/automated_..._script.py:108-109)
  *  - DENSE_RANK TG naming (line 36), ARRAY_AGG→string (line 61)
  *  - UNNEST/split explode (py script step 3.4), REGEXP extraction
  *    (py script step 3.2), CASE normalization (lines 68-90)
  *  - date_diff/even-odd/dow switchback fields (lines 205-208)
  *
  * Scale notes: dimension sides are explicitly broadcast; fact-side
  * aggregations are partial (map-side combine) by construction; every
  * filter is expressed on scan columns so it pushes into the parquet
  * reader.
  */
object Relational {

  /** TPC-H-Q1-shaped multi-aggregate groupBy (the reference's per-group
    * KPI aggregation, py script step 5). Money sums run through exact
    * decimals — see [[graft.functions.Compat]]. */
  def aggGroupBy(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumMoney(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        // DuckDB's high-scale decimal→double cast is 1 ulp off the
        // correctly-rounded value, so scale-10 sums get r4'd both sides.
        // Precisions sized so the product is decimal(10+7+1=18, 8) —
        // Spark's compact-long multiply fast path — instead of the
        // (28,10) BigDecimal path (r12, guide §1.2 per-task work). The
        // money columns are exact 2-dp values (≤ 105k) and the rate is
        // exact at 6 dp, so every product is the identical exact value
        // and the sum (and the oracle) are bit-unchanged.
        r4(sum(col("l_extendedprice").cast(DecimalType(10, 2)) *
          (lit(1) - col("l_discount")).cast(DecimalType(7, 6)))
          .cast(DoubleType)).as("sum_disc_price"),
        (sum(col("l_quantity").cast(DecimalType(18, 4))).cast(DoubleType) /
          count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"),
      )
      .orderBy("l_returnflag", "l_linestatus")

  private val aggGroupByOracle =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  (sign(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(9,6))) AS DOUBLE)) * floor(abs(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(9,6))) AS DOUBLE)) * 1e4 + 0.5) / 1e4) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** 4-way star join (orders⋈customer⋈nation⋈region) + revenue rollup —
    * the reference's dims-onto-orders join (automated_script.sql:296-333).
    * nation/region are broadcast; orders⋈customer shuffles on custkey. */
  def joinStar(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "c_mktsegment")
      .agg(
        count(lit(1)).as("num_orders"),
        sumMoney(col("o_totalprice")).as("revenue"),
        avgMoney(col("o_totalprice")).as("avg_order_value"),
      )
      .orderBy("r_name", "c_mktsegment")

  private val joinStarOracle =
    """SELECT r_name, c_mktsegment,
      |  COUNT(*) AS num_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_order_value
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, c_mktsegment
      |ORDER BY r_name, c_mktsegment""".stripMargin

  /** IN-(SELECT …) semi-join filter — the reference filters orders to
    * configured tests this way (automated_script.sql:337-352). */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val rich = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 5000).select("c_custkey")
    Tables.orders(spark, dir)
      .join(rich, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("num_orders"),
        sumMoney(col("o_totalprice")).as("revenue"))
      .orderBy("o_orderpriority")
  }

  private val semiJoinOracle =
    """SELECT o_orderpriority, COUNT(*) AS num_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** NOT-IN exclusion (anti join) — the reference's excluded-zone filter
    * (py script lines 108-109). Customers with no orders, per segment. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("num_customers"),
        avgMoney(col("c_acctbal")).as("avg_acctbal"))
      .orderBy("c_mktsegment")

  private val antiJoinOracle =
    """SELECT c_mktsegment, COUNT(*) AS num_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_acctbal
      |FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** SELECT DISTINCT projection (used throughout the reference, e.g.
    * automated_script.sql:8,98,116). */
  def distinctProj(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderstatus", "o_orderpriority").distinct()
      .orderBy("o_orderstatus", "o_orderpriority")

  private val distinctProjOracle =
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  /** DENSE_RANK target-group naming — CONCAT('TG', DENSE_RANK() OVER
    * (PARTITION BY … ORDER BY …)) (automated_script.sql:36). Top-5
    * account balances per nation, labelled TG<rank>. */
  def denseRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, dir)
      .withColumn("rk", dense_rank().over(w))
      .filter(col("rk") <= 5)
      .select(col("c_nationkey"), col("c_custkey"),
        r2(col("c_acctbal")).as("c_acctbal"),
        concat(lit("TG"), col("rk")).as("tg_name"))
      .orderBy("c_nationkey", "tg_name", "c_custkey")
  }

  private val denseRankOracle =
    """SELECT c_nationkey, c_custkey, (sign(c_acctbal) * floor(abs(c_acctbal) * 1e2 + 0.5) / 1e2) AS c_acctbal,
      |  'TG' || rk AS tg_name
      |FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rk
      |  FROM customer)
      |WHERE rk <= 5
      |ORDER BY c_nationkey, tg_name, c_custkey""".stripMargin

  /** Ordered ARRAY_AGG → delimited string per group
    * (automated_script.sql:61,140,395). Distinct segments per nation. */
  def stringAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(concat_ws(", ", array_sort(collect_set(col("c_mktsegment"))))
        .as("segments"))
      .orderBy("n_name")

  private val stringAggOracle =
    """SELECT n_name,
      |  string_agg(DISTINCT c_mktsegment, ', ' ORDER BY c_mktsegment) AS segments
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Ordered ARRAY_AGG with DUPLICATES and NULLs preserved — the
    * reference's `ARRAY_AGG(... RESPECT NULLS ORDER BY ...)` then
    * ARRAY_TO_STRING with a null placeholder (aa_tests sql:61,140).
    * [[stringAgg]] is the DISTINCT variant; this one keeps every row.
    *
    * Spark has no ordered collect: collect_list order is
    * partition-dependent, so the deterministic pattern is
    * collect_list(struct(sortKeys..., value)) → array_sort → project.
    * Input is slice-bounded (acctbal > 9000) so the per-group array is
    * small; at full scale rank-limit per group first. */
  def stringAggDup(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 9000)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        count(lit(1)).as("n_vals"),
        concat_ws(", ", transform(
          array_sort(collect_list(struct(
            (-col("c_acctbal")).as("k1"),
            col("c_custkey").as("k2"),
            // RESPECT NULLS: synthesize nulls via NULLIF, then the
            // ARRAY_TO_STRING null placeholder
            coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("NULL")).as("v")))),
          x => x.getField("v"))).as("segments"))
      .orderBy("n_name")

  private val stringAggDupOracle =
    """SELECT n_name, COUNT(*) AS n_vals,
      |  string_agg(COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'NULL'), ', '
      |             ORDER BY c_acctbal DESC, c_custkey) AS segments
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > 9000
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** split + explode (CROSS JOIN UNNEST / py script step 3.4 list
    * splitting): word frequencies of part names. */
  def explodeSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))

  private val explodeSplitOracle =
    """SELECT word, COUNT(*) AS freq
      |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
      |GROUP BY word ORDER BY freq DESC, word""".stripMargin

  /** Regex capture-group extraction — the reference pulls scheme ids out
    * of '{…}' (py script step 3.2). Extracts k from props JSON, buckets
    * it, aggregates. */
  def regexpExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // no-match regexp_extract returns '' and CAST('' AS INT) THROWS
      // under ANSI (both engines error, in fact) — the empty-string
      // guard buckets an unmatched row as NULL instead of killing the
      // query on one malformed props row
      .select(when(regexp_extract(col("props"), "\"k\": (\\d+)", 1) =!= "",
        regexp_extract(col("props"), "\"k\": (\\d+)", 1))
        .cast("int").as("k"), col("value"))
      .withColumn("k_bucket", floor(col("k") / 10) * 10)
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
      .orderBy("k_bucket")

  private val regexpExtractOracle =
    """SELECT CAST(FLOOR(CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS INT) / 10) AS BIGINT) * 10 AS k_bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin

  /** CASE-based category normalization (automated_script.sql:68-90
    * parent-vertical cleanup). */
  def caseNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .withColumn("type_class",
        when(lower(col("p_type")).isin("economy", "standard"), "basic")
          .when(lower(col("p_type")).isin("small", "medium"), "compact")
          .otherwise("premium"))
      .groupBy("type_class")
      .agg(count(lit(1)).as("n_parts"),
        avgMoney(col("p_retailprice")).as("avg_price"))
      .orderBy("type_class")

  private val caseNormOracle =
    """SELECT CASE
      |    WHEN lower(p_type) IN ('economy','standard') THEN 'basic'
      |    WHEN lower(p_type) IN ('small','medium') THEN 'compact'
      |    ELSE 'premium' END AS type_class,
      |  COUNT(*) AS n_parts,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price
      |FROM part GROUP BY 1 ORDER BY type_class""".stripMargin

  /** Switchback date bookkeeping: day number in test, even/odd day, dow
    * name (automated_script.sql:205-208). */
  def dateLogic(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("day_num_in_test",
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")) + 1)
      .withColumn("even_or_odd_day",
        when(col("day_num_in_test") % 2 === 0, "even").otherwise("odd"))
      .withColumn("dow", date_format(col("o_orderdate"), "EEEE"))
      .groupBy("dow", "even_or_odd_day")
      .agg(count(lit(1)).as("num_orders"),
        sumMoney(col("o_totalprice")).as("revenue"))
      .orderBy("dow", "even_or_odd_day")

  private val dateLogicOracle =
    """SELECT dayname(o_orderdate) AS dow,
      |  CASE WHEN (date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) + 1) % 2 = 0
      |       THEN 'even' ELSE 'odd' END AS even_or_odd_day,
      |  COUNT(*) AS num_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM orders GROUP BY 1, 2 ORDER BY dow, even_or_odd_day""".stripMargin

  /** Conditional aggregation (CASE inside agg — the reference's
    * keep/drop and On/Off splits): per-priority order mix. */
  def conditionalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        r4(sum(when(col("o_totalprice") > 1000,
          col("o_totalprice").cast(DecimalType(18, 4)))
          .otherwise(lit(0).cast(DecimalType(18, 4))))
          .cast(DoubleType)).as("big_revenue"),
      )
      .orderBy("o_orderpriority")

  // DuckDB SUM(int) is HUGEINT → CAST AS BIGINT to match Spark's long;
  // big_revenue r4-rounded both sides (decimal→double cast is 1-ulp
  // divergent between engines at high scale — see q_agg_groupby).
  private val conditionalAggOracle = {
    val bigRev = "CAST(SUM(CASE WHEN o_totalprice > 1000 THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)"
    s"""SELECT o_orderpriority, COUNT(*) AS n,
       |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       |  ${rSql(bigRev, 4)} AS big_revenue
       |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  }

  /** COALESCE/NULLIF fallback chain — the reference's actual-DF-paid
    * logic (automated_script.sql:266-274). */
  def coalesceFallback(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("effective_rate",
        coalesce(nullif(col("l_discount"), lit(0.0)),
          nullif(col("l_tax"), lit(0.0)), lit(0.01)))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        // compact-decimal product — see aggGroupBy's sum_disc_price note
        r4(sum((col("l_extendedprice").cast(DecimalType(10, 2)) *
          col("effective_rate").cast(DecimalType(7, 6))))
          .cast(DoubleType)).as("fee_total"),
      )
      .orderBy("l_returnflag")

  private val coalesceFallbackOracle =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  (sign(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |           CAST(COALESCE(NULLIF(l_discount, 0.0), NULLIF(l_tax, 0.0), 0.01) AS DECIMAL(9,6))) AS DOUBLE)) * floor(abs(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |           CAST(COALESCE(NULLIF(l_discount, 0.0), NULLIF(l_tax, 0.0), 0.01) AS DECIMAL(9,6))) AS DOUBLE)) * 1e4 + 0.5) / 1e4) AS fee_total
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** row_number top-N per group (reference uses ranked TG selection). */
  def topNPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("rn"), col("c_custkey"),
        r2(col("c_acctbal")).as("c_acctbal"))
      .orderBy("c_mktsegment", "rn")
  }

  private val topNPerGroupOracle =
    """SELECT c_mktsegment, rn, c_custkey, (sign(c_acctbal) * floor(abs(c_acctbal) * 1e2 + 0.5) / 1e2) AS c_acctbal
      |FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer)
      |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin

  /** Cumulative sum per key ordered by time (running KPI totals).
    * Decimal accumulation keeps the window sum association-order
    * independent — identical on any partitioning. */
  def runningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("running_value",
        sum(col("value").cast(DecimalType(18, 4))).over(w).cast(DoubleType))
      .select("event_id", "user_id", "running_value")
      .orderBy("event_id")
  }

  private val runningSumOracle =
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST("value" AS DECIMAL(18,4))) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events ORDER BY event_id""".stripMargin

  /** Pivot to wide format (the analysis script's per-order/total metric
    * tables are On/Off-pivoted): order counts per dow × status. */
  def pivotWide(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("dow", date_format(col("o_orderdate"), "EEEE"))
      .groupBy("dow")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy("dow")

  private val pivotWideOracle =
    """SELECT dayname(o_orderdate) AS dow,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
      |FROM orders GROUP BY 1 ORDER BY dow""".stripMargin

  /** Schema-on-read JSON extraction (the reference's BQ JSON columns):
    * from_json with an explicit schema, not regexp scraping. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).cast("long").as("sum_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  private val jsonExtractOracle =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(props->>'k' AS INT)) AS max_k
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** String normalization battery (trim/case/substr/replace/lpad —
    * the reference's cleanup expressions). */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        upper(substring(col("p_name"), 1, 3)).as("prefix"),
        length(regexp_replace(col("p_name"), "[aeiou]", "")).as("consonants"),
        lpad(col("p_brand"), 10, "#").as("brand_padded"))
      .groupBy("prefix")
      .agg(count(lit(1)).as("n"),
        sum("consonants").cast("long").as("total_consonants"),
        min("brand_padded").as("first_brand"))
      .orderBy("prefix")

  private val stringFuncsOracle =
    """SELECT upper(substr(p_name, 1, 3)) AS prefix, COUNT(*) AS n,
      |  CAST(SUM(length(regexp_replace(p_name, '[aeiou]', '', 'g'))) AS BIGINT) AS total_consonants,
      |  MIN(lpad(p_brand, 10, '#')) AS first_brand
      |FROM part GROUP BY 1 ORDER BY prefix""".stripMargin

  /** Sliding 1h-window/30min-slide aggregation — every event lands in
    * two windows (streaming sliding-window semantics, run as batch). */
  def windowSliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("n"), col("sum_value"))
      .orderBy("window_start")

  private val windowSlidingOracle =
    """WITH exploded AS (
      |  SELECT unnest([
      |      ts - INTERVAL (CAST(epoch_us(ts) % 1800000000 AS BIGINT)) MICROSECONDS,
      |      ts - INTERVAL (CAST(epoch_us(ts) % 1800000000 AS BIGINT)) MICROSECONDS - INTERVAL 30 MINUTES
      |    ]) AS window_start, "value"
      |  FROM events)
      |SELECT window_start, COUNT(*) AS n,
      |  CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM exploded GROUP BY 1 ORDER BY window_start""".stripMargin

  /** Skewed join through [[graft.functions.Skew.saltedJoin]]: 3 hot
    * keys carry the whole fact table; salting spreads each over 8
    * tasks. The oracle is the UNSALTED join — proving salting is
    * invisible in results. */
  def skewJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val facts = Tables.events(spark, dir)
      .withColumn("hot_key", (col("user_id") % 3).cast("int"))
    val dim = Seq((0, "alpha"), (1, "beta"), (2, "gamma"))
      .toDF("hot_key", "segment")
    graft.functions.Skew.saltedJoin(facts, dim, "hot_key", 8)
      .groupBy("segment")
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
      .orderBy("segment")
  }

  private val skewJoinOracle =
    """SELECT segment, COUNT(*) AS n,
      |  CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events
      |JOIN (VALUES (0, 'alpha'), (1, 'beta'), (2, 'gamma')) AS dim(hot_key, segment)
      |  ON CAST(user_id % 3 AS INT) = dim.hot_key
      |GROUP BY 1 ORDER BY segment""".stripMargin

  /** Single-pass column profiling (null/distinct/min/max per column) —
    * the data-quality sweep every ingest pipeline runs first. */
  def profile(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val stats = o.agg(
      count(lit(1)).as("n"),
      countDistinct(col("o_custkey")).as("d_custkey"),
      sum(col("o_custkey").isNull.cast("long")).as("null_custkey"),
      min(col("o_custkey")).cast("double").as("min_custkey"),
      max(col("o_custkey")).cast("double").as("max_custkey"),
      countDistinct(col("o_totalprice")).as("d_totalprice"),
      sum(col("o_totalprice").isNull.cast("long")).as("null_totalprice"),
      r4(min(col("o_totalprice"))).as("min_totalprice"),
      r4(max(col("o_totalprice"))).as("max_totalprice"),
      countDistinct(col("o_orderstatus")).as("d_status"),
      sum(col("o_orderstatus").isNull.cast("long")).as("null_status"),
    )
    // long format: one row per profiled column
    stats.selectExpr(
      """stack(3,
        |  'o_custkey', n, d_custkey, null_custkey, min_custkey, max_custkey,
        |  'o_totalprice', n, d_totalprice, null_totalprice, min_totalprice, max_totalprice,
        |  'o_orderstatus', n, d_status, null_status, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        |) AS (column_name, n, n_distinct, n_null, min_val, max_val)""".stripMargin)
      .orderBy("column_name")
  }

  private val profileOracle =
    """SELECT * FROM (
      |  SELECT 'o_custkey' AS column_name, COUNT(*) AS n,
      |    COUNT(DISTINCT o_custkey) AS n_distinct,
      |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |    CAST(MIN(o_custkey) AS DOUBLE) AS min_val, CAST(MAX(o_custkey) AS DOUBLE) AS max_val
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_totalprice', COUNT(*), COUNT(DISTINCT o_totalprice),
      |    CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    (sign(MIN(o_totalprice)) * floor(abs(MIN(o_totalprice)) * 1e4 + 0.5) / 1e4),
      |    (sign(MAX(o_totalprice)) * floor(abs(MAX(o_totalprice)) * 1e4 + 0.5) / 1e4)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_orderstatus', COUNT(*), COUNT(DISTINCT o_orderstatus),
      |    CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
      |  FROM orders)
      |ORDER BY column_name""".stripMargin

  /** Latest-record-per-key dedup (SCD-style upsert collapse): keep each
    * user's most recent event. */
  def latestByKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("latest_event_id"),
        col("event_type").as("latest_type"),
        unix_micros(col("ts")).as("latest_us"))
      .orderBy("user_id")
  }

  private val latestByKeyOracle =
    """SELECT user_id, event_id AS latest_event_id, event_type AS latest_type,
      |  epoch_us(ts) AS latest_us
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** ROLLUP subtotals (the Tableau-dashboard feed shape: per-group,
    * per-supergroup, and grand-total rows in one pass). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("revenue"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("revenue"))
      .orderBy("status", "priority")

  private val rollupAggOracle =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** CUBE over (status, priority) with explicit grouping flags — the
    * every-marginal companion to [[rollupAgg]]'s hierarchy (dashboard
    * feeds slice both ways). `grouping()` flags disambiguate a real
    * NULL group from a subtotal row, which COALESCE labels alone
    * cannot. One pass; Spark expands grouping sets map-side, so the
    * shuffle carries 4× the group cardinality, not 4× the data. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("revenue"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_priority"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("g_status"), col("g_priority"), col("n"), col("revenue"))
      .orderBy("g_status", "g_priority", "status", "priority")

  private val cubeAggOracle =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_priority, status, priority""".stripMargin

  /** Explicit GROUPING SETS — the general form ROLLUP/CUBE specialize:
    * exactly the marginals a dashboard needs ((status,priority),
    * (priority), ()) and nothing else, via Spark 4's native
    * Dataset.groupingSets. Same one-pass map-side expansion as
    * rollup/cube: the shuffle carries |sets|× the group cardinality,
    * not |sets|× the data. grouping() flags disambiguate subtotal rows
    * from real NULL groups. */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("revenue"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_priority"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("g_status"), col("g_priority"), col("n"), col("revenue"))
      .orderBy("g_status", "g_priority", "status", "priority")

  private val groupingSetsOracle =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
      |ORDER BY g_status, g_priority, status, priority""".stripMargin

  /** UNPIVOT (melt) — the wide→long inverse of [[pivotMetrics]], via
    * Spark's native Dataset.unpivot (Catalyst Expand, one pass, no
    * per-metric scans): a per-group metrics row becomes (group, metric,
    * value) tall rows, the shape BI feeds and metric stores ingest.
    * The oracle states the same melt as a stacked UNION ALL — a
    * different formulation proving unpivot is implementation-invisible. */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).cast(DoubleType).as("n_events"),
        sumMoney(col("value")).as("sum_value"),
        r4(max("value")).as("max_value"))
    wide.unpivot(
        Array(col("event_type")),
        Array(col("n_events"), col("sum_value"), col("max_value")),
        "metric", "value")
      .orderBy("event_type", "metric")
  }

  private val unpivotOracle =
    """WITH wide AS (
      |  SELECT event_type,
      |    CAST(COUNT(*) AS DOUBLE) AS n_events,
      |    CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
      |    (sign(MAX("value")) * floor(abs(MAX("value")) * 1e4 + 0.5) / 1e4) AS max_value
      |  FROM events GROUP BY 1)
      |SELECT event_type, metric, "value" FROM (
      |  SELECT event_type, 'n_events' AS metric, n_events AS "value" FROM wide
      |  UNION ALL
      |  SELECT event_type, 'sum_value', sum_value FROM wide
      |  UNION ALL
      |  SELECT event_type, 'max_value', max_value FROM wide)
      |ORDER BY event_type, metric""".stripMargin

  /** Semi-join through the bloom-filter reduction
    * ([[graft.functions.Bloom.bloomSemiJoin]]): orders of high-balance
    * customers, but the fact side is pre-filtered SCAN-LOCALLY by a
    * bloom filter over the dim keys before anything shuffles — at
    * 100 TB the shuffle carries matches (+fpp·misses) instead of the
    * whole table. The exact second phase makes the bloom invisible in
    * results, so the oracle is the plain semi-join. */
  def bloomSemi(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(spark, dir).filter(col("c_acctbal") > 9000)
    graft.functions.Bloom
      .bloomSemiJoin(Tables.orders(spark, dir), dim,
        "o_custkey", "c_custkey", expectedKeys = 100000L)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sumMoney(col("o_totalprice")).as("revenue"))
      .orderBy("o_orderpriority")
  }

  private val bloomSemiOracle =
    """SELECT o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
      |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  /** Distributed MERGE (CDC apply): one full-outer join of the base
    * table with a changeset carrying insert/update/delete ops, CASE
    * logic resolving each key — the upsert primitive behind nightly
    * dimension refreshes (Delta/Iceberg MERGE INTO expressed as a
    * plain Spark plan). One shuffle on the key (bucketed layouts make
    * it zero — see Sources.writeBucketed); the changeset here derives
    * deterministically from the base so both engines bind identical
    * ops: %25 keys delete, else %10 update (+100.00, status 'U'),
    * %50 keys also insert a sibling (key + max(o_orderkey) + 1, status
    * 'N' — offset derived from the DATA, not a constant, so synthetic
    * keys can never collide with real ones at any scale factor).
    * Oracle states the same semantics as anti-join + UNION ALL — a
    * different formulation proving the merge is implementation-
    * invisible. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val merged = applyMerge(base, ordersChangeset(Tables.orders(spark, dir)),
      "o_orderkey")
    merged.groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("revenue"))
      .orderBy("status")
  }

  /** The deterministic CDC changeset over orders both merge operators
    * (q_merge_upsert, q_merge_snapshot) and both engines bind: %25 keys
    * delete, else %10 update (+100.00, status 'U'), %50 keys also
    * insert a sibling above every real key. Full-row images in the
    * base's own column names — the [[applyMerge]] contract. */
  private[operators] def ordersChangeset(src: DataFrame): DataFrame = {
    val dels = src.filter(col("o_orderkey") % 25 === 0)
      .select(col("o_orderkey"), lit("D").as("op"),
        lit(null).cast("string").as("o_orderstatus"),
        lit(null).cast("double").as("o_totalprice"))
    val upds = src.filter(col("o_orderkey") % 25 =!= 0 && col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), lit("U").as("op"),
        lit("U").as("o_orderstatus"), (col("o_totalprice") + 100.0).as("o_totalprice"))
    // one-row max-key frame, broadcast: inserts land strictly above
    // every existing key. Offset is max+1, NOT max — keys start at 0,
    // and key 0 + max would collide with the real max-key row.
    val maxKey = src.agg((max("o_orderkey") + 1L).as("key_offset"))
    val ins = src.filter(col("o_orderkey") % 50 === 0)
      .crossJoin(broadcast(maxKey))
      .select((col("o_orderkey") + col("key_offset")).as("o_orderkey"),
        lit("I").as("op"),
        lit("N").as("o_orderstatus"), col("o_totalprice").as("o_totalprice"))
    dels.unionAll(upds).unionAll(ins)
  }

  /** The row-level MERGE kernel: resolve a full-row-image changeset
    * against `base` — one full-outer join on `key`, CASE logic per row.
    * `changes` carries `key`, an `op` column ('D' delete; 'U'/'I'
    * upsert — with full row images the two are the same resolution:
    * matched → replace, unmatched → insert; 'D' on an unmatched key is
    * a no-op), and every non-key base column as the new image. Both
    * sides must be unique on `key` (the standard MERGE precondition —
    * a duplicate would multiply through the join). One shuffle on the
    * key; bucketed or key-clustered layouts make the base side
    * co-located, and [[Maintenance.snapshotMerge]] bounds the base side
    * to manifest-pruned files only. */
  def applyMerge(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val nonKey = base.columns.toIndexedSeq.filterNot(_ == key)
    require(changes.columns.contains("op"),
      "changeset must carry an 'op' column (D/U/I)")
    nonKey.foreach(c => require(changes.columns.contains(c),
      s"changeset must carry a full row image; missing column '$c'"))
    val ch = changes.select(
      col(key) +: col("op") +: nonKey.map(c => col(c).as(s"__new_$c")): _*)
    base.join(ch, Seq(key), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col(key) +: nonKey.map(c =>
        when(col("op").isNotNull, col(s"__new_$c")).otherwise(col(c)).as(c)): _*)
  }

  private[operators] val mergeUpsertOracle =
    """WITH dels AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 25 = 0),
      |upds AS (
      |  SELECT o_orderkey, 'U' AS status, o_totalprice + 100.0 AS price
      |  FROM orders WHERE o_orderkey % 25 <> 0 AND o_orderkey % 10 = 0),
      |ins AS (
      |  SELECT o_orderkey + (SELECT MAX(o_orderkey) + 1 FROM orders) AS o_orderkey,
      |    'N' AS status, o_totalprice AS price
      |  FROM orders WHERE o_orderkey % 50 = 0),
      |untouched AS (
      |  SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS price
      |  FROM orders
      |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM dels)
      |    AND o_orderkey NOT IN (SELECT o_orderkey FROM upds)),
      |merged AS (
      |  SELECT * FROM untouched
      |  UNION ALL SELECT * FROM upds
      |  UNION ALL SELECT * FROM ins)
      |SELECT status, COUNT(*) AS n,
      |  CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM merged GROUP BY 1 ORDER BY status""".stripMargin

  /** Set operations: INTERSECT/EXCEPT on key sets (the reference's
    * vendor-set comparisons between test configurations).
    *
    * Single-pass formulation: one scan of orders, one shuffle on
    * custkey deriving has-early/has-late flags, then a tiny partial agg
    * on the flag combination — INTERSECT and both EXCEPT directions
    * fall out of one job instead of three driver-side count() actions
    * (six scans). At 100 TB that is the difference between one pass
    * over the table and six. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cut = lit("1998-01-01").cast("timestamp")
    val counts = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(
        max(when(col("o_orderdate") < cut, 1).otherwise(0)).as("has_early"),
        max(when(col("o_orderdate") >= cut, 1).otherwise(0)).as("has_late"))
      .select(
        when(col("has_early") === 1 && col("has_late") === 1, "both_periods")
          .when(col("has_early") === 1, "early_only")
          .otherwise("late_only").as("segment"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_customers"))
    // the oracle's three-way UNION always emits all segments (count 0
    // when empty); complete the group-by result the same way
    Seq("both_periods", "early_only", "late_only").toDF("segment")
      .join(counts, Seq("segment"), "left")
      .na.fill(0L, Seq("n_customers"))
      .orderBy("segment")
  }

  private val setOpsOracle =
    """WITH early AS (SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
      |late AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
      |SELECT * FROM (
      |  SELECT 'both_periods' AS segment, COUNT(*) AS n_customers FROM (SELECT * FROM early INTERSECT SELECT * FROM late)
      |  UNION ALL
      |  SELECT 'early_only', COUNT(*) FROM (SELECT * FROM early EXCEPT SELECT * FROM late)
      |  UNION ALL
      |  SELECT 'late_only', COUNT(*) FROM (SELECT * FROM late EXCEPT SELECT * FROM early))
      |ORDER BY segment""".stripMargin

  /** Top-3 per segment through the NATIVE TopKPerGroup plan
    * (graft.plans.TopKPlan — custom LogicalPlan + Strategy + Exec with
    * bounded heaps and pre-shuffle partial pruning), same semantics as
    * [[topNPerGroup]]'s window formulation. */
  def topNNative(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.customer(spark, dir)
      .select("c_mktsegment", "c_custkey", "c_acctbal")
    graft.plans.TopK.topKPerGroup(src,
        Seq("c_mktsegment"), "c_acctbal", "c_custkey", 3)
      .select(col("c_mktsegment"), col("c_custkey"),
        r2(col("c_acctbal")).as("c_acctbal"))
      .orderBy(col("c_mktsegment"), col("c_acctbal").desc, col("c_custkey"))
  }

  private val topNNativeOracle =
    """SELECT c_mktsegment, c_custkey, (sign(c_acctbal) * floor(abs(c_acctbal) * 1e2 + 0.5) / 1e2) AS c_acctbal
      |FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer)
      |WHERE rn <= 3 ORDER BY c_mktsegment, c_acctbal DESC, c_custkey""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q_topn_native", topNNative, Some(topNNativeOracle)),
    Op("q_rollup", rollupAgg, Some(rollupAggOracle)),
    Op("q_cube", cubeAgg, Some(cubeAggOracle)),
    Op("q_grouping_sets", groupingSetsAgg, Some(groupingSetsOracle)),
    Op("q_unpivot", unpivotMetrics, Some(unpivotOracle)),
    Op("q_bloom_semi", bloomSemi, Some(bloomSemiOracle)),
    Op("q_merge_upsert", mergeUpsert, Some(mergeUpsertOracle)),
    Op("q_set_ops", setOps, Some(setOpsOracle)),
    Op("q_skew_join", skewJoin, Some(skewJoinOracle)),
    Op("q_profile", profile, Some(profileOracle)),
    Op("q_latest_by_key", latestByKey, Some(latestByKeyOracle)),
    Op("q_json_extract", jsonExtract, Some(jsonExtractOracle)),
    Op("q_string_funcs", stringFuncs, Some(stringFuncsOracle)),
    Op("q_window_sliding", windowSliding, Some(windowSlidingOracle)),
    Op("q_agg_groupby", aggGroupBy, Some(aggGroupByOracle), headline = true),
    Op("q_join_star", joinStar, Some(joinStarOracle), headline = true),
    Op("q_semi_join", semiJoin, Some(semiJoinOracle)),
    Op("q_anti_join", antiJoin, Some(antiJoinOracle)),
    Op("q_distinct", distinctProj, Some(distinctProjOracle)),
    Op("q_dense_rank", denseRank, Some(denseRankOracle)),
    Op("q_string_agg", stringAgg, Some(stringAggOracle)),
    Op("q_string_agg_dup", stringAggDup, Some(stringAggDupOracle)),
    Op("q_explode_split", explodeSplit, Some(explodeSplitOracle)),
    Op("q_regexp_extract", regexpExtract, Some(regexpExtractOracle)),
    Op("q_case_norm", caseNorm, Some(caseNormOracle)),
    Op("q_date_logic", dateLogic, Some(dateLogicOracle)),
    Op("q_conditional_agg", conditionalAgg, Some(conditionalAggOracle)),
    Op("q_coalesce_fallback", coalesceFallback, Some(coalesceFallbackOracle)),
    Op("q_topn_per_group", topNPerGroup, Some(topNPerGroupOracle)),
    Op("q_running_sum", runningSum, Some(runningSumOracle)),
    Op("q_pivot", pivotWide, Some(pivotWideOracle)),
  )
}
