package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Op
import graft.functions.Compat.{r4, r6, rSql}

/** Driver-visible batch replays of the Structured Streaming monitors
  * (SURVEY.md §2 block D) — each entry replays the recorded events table
  * through [[Replay.replayViaFiles]] (a real FileStreamSource: engine-
  * side ts-ordered chunk layout, file listing, offset tracking,
  * exactly-once file accounting — NO driver-side collect of the input at
  * any size) and exposes the finalized append-mode output as an ordinary
  * query, so the correctness gate hash-checks the streaming path against
  * a DuckDB oracle computing the same finalized windows in batch. This
  * is the reference's daily monitoring loop (switchback_analysis.ipynb
  * re-read per day) run end-to-end through real watermark/state
  * machinery. The driver-fed MemoryStream twin ([[Replay.replay]]) stays
  * as the spec-side harness; StreamingSpec pins the two paths equal.
  *
  * Frozen monitor references (the psiMonitor contract: a batch run over
  * a reference period defines "normal"; the stream patrols it) are
  * fixed constants here so the oracle SQL can embed the identical
  * values — in production they come from the batch operators.
  */
object StreamingOps {

  // frozen references, embedded in both engines
  private val PsiCuts = Seq(15.0, 30.0, 60.0, 120.0)
  private val PsiRef = Seq(0.25, 0.20, 0.25, 0.21, 0.09)
  private val MadRefMed = 49.0
  private val MadRefMad = 1.5
  private val ConvThreshold = 35.0
  private val CusumRefMean = 50.0
  private val CusumH = 5.0
  private val DpSeed = 7L

  private val onOffSql =
    "((epoch_us(date_trunc('hour', ts)) // 3600000000) + (user_id % 10)) % 2 = 0"

  // ------------------------------------------------------------ tumbling

  private def streamTumbling(spark: SparkSession, dir: String): DataFrame =
    Replay.replayViaFiles(spark, dir)(ds => EventStream.tumblingCounts(ds.toDF()))
      .orderBy("window_start", "event_type")

  private val streamTumblingOracle =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------ sb rollup

  private def streamSbRollup(spark: SparkSession, dir: String): DataFrame =
    Replay.replayViaFiles(spark, dir)(ds => EventStream.sbMetricsStream(ds.toDF()))
      .orderBy("window_start", "event_type", "on_off")

  private val streamSbRollupOracle = {
    val vpo = rSql("(CAST(SUM(CAST(\"value\" AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*))", 2)
    s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
       |  CASE WHEN $onOffSql THEN 'On' ELSE 'Off' END AS on_off,
       |  COUNT(*) AS n, $vpo AS value_per_order
       |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  // ------------------------------------------------------------ SRM guard

  private def streamSrm(spark: SparkSession, dir: String): DataFrame =
    Replay.replayViaFiles(spark, dir)(ds => EventStream.srmGuard(ds.toDF()))
      .orderBy("window_start", "event_type")

  private val streamSrmOracle =
    s"""WITH c AS (
       |  SELECT date_trunc('hour', ts) AS window_start, event_type,
       |    COUNT(*) AS n,
       |    CAST(SUM(CASE WHEN $onOffSql THEN 1 ELSE 0 END) AS BIGINT) AS n_on
       |  FROM events GROUP BY 1, 2)
       |SELECT window_start, event_type, n, n_on, n - n_on AS n_off,
       |  ((n_on - n / 2.0) * (n_on - n / 2.0) / (n / 2.0) +
       |   ((n - n_on) - n / 2.0) * ((n - n_on) - n / 2.0) / (n / 2.0)) AS chisq
       |FROM c ORDER BY window_start, event_type""".stripMargin

  // ------------------------------------------------------------ PSI drift

  private def streamPsi(spark: SparkSession, dir: String): DataFrame =
    Replay.replayViaFiles(spark, dir)(ds =>
      EventStream.psiMonitor(ds.toDF(), PsiCuts, PsiRef))
      .orderBy("window_start", "event_type")

  private val streamPsiOracle = {
    val bin = PsiCuts.map(c => s"CASE WHEN value > $c THEN 1 ELSE 0 END").mkString(" + ")
    val nb = PsiCuts.size + 1
    val counts = (0 until nb)
      .map(b => s"CAST(SUM(CASE WHEN bin = $b THEN 1 ELSE 0 END) AS BIGINT) AS c$b")
      .mkString(",\n    ")
    // identical fold order to the Spark side's terms.reduce(_ + _)
    val terms = (0 until nb).map { b =>
      val q = s"((c$b + 0.5) / (n + ${nb * 0.5}))"
      rSql(s"(($q - ${PsiRef(b)}) * ln($q / ${PsiRef(b)}))", 6)
    }.mkString(" + ")
    s"""WITH b AS (
       |  SELECT date_trunc('day', ts) AS window_start, event_type,
       |    ($bin) AS bin
       |  FROM events),
       |c AS (
       |  SELECT window_start, event_type, COUNT(*) AS n,
       |    $counts
       |  FROM b GROUP BY 1, 2),
       |t AS (
       |  SELECT window_start, event_type, n, ${rSql(s"($terms)", 4)} AS psi
       |  FROM c)
       |SELECT window_start, event_type, n, psi, psi >= 0.2 AS drift
       |FROM t ORDER BY window_start, event_type""".stripMargin
  }

  // ------------------------------------------------------------ MAD guard

  private def streamMad(spark: SparkSession, dir: String): DataFrame =
    Replay.replayViaFiles(spark, dir)(ds =>
      EventStream.madMonitor(ds.toDF(), MadRefMed, MadRefMad))
      .orderBy("day", "event_type")

  private val streamMadOracle = {
    val mean = rSql("(CAST(SUM(CAST(\"value\" AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))", 6)
    val rz = rSql(s"(0.6745 * (daily_mean - $MadRefMed) / $MadRefMad)", 4)
    s"""WITH d AS (
       |  SELECT date_trunc('day', ts) AS day, event_type,
       |    COUNT(*) AS n, $mean AS daily_mean
       |  FROM events GROUP BY 1, 2)
       |SELECT day, event_type, n, daily_mean, $rz AS rz,
       |  abs($rz) > 2.5 AS is_anomaly
       |FROM d ORDER BY day, event_type""".stripMargin
  }

  // ------------------------------------------------ conversion-rate guard

  private def streamConv(spark: SparkSession, dir: String): DataFrame =
    Replay.replayViaFiles(spark, dir)(ds =>
      EventStream.convGuard(ds.toDF(), ConvThreshold))
      .orderBy("window_start", "event_type")

  private val streamConvOracle = {
    val z = """((x1 * 1.0 / n1) - (x2 * 1.0 / n2)) /
      |    NULLIF(sqrt(((x1 + x2) * 1.0 / (n1 + n2)) * (1 - (x1 + x2) * 1.0 / (n1 + n2))
      |      * (1.0 / n1 + 1.0 / n2)), 0)""".stripMargin
    s"""WITH g AS (
       |  SELECT date_trunc('hour', ts) AS window_start, event_type,
       |    CASE WHEN $onOffSql THEN 'On' ELSE 'Off' END AS grp,
       |    CASE WHEN value > $ConvThreshold THEN 1 ELSE 0 END AS conv
       |  FROM events),
       |c AS (
       |  SELECT window_start, event_type,
       |    CAST(SUM(CASE WHEN grp = 'On' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(SUM(CASE WHEN grp = 'On' THEN conv ELSE 0 END) AS BIGINT) AS x1,
       |    CAST(SUM(CASE WHEN grp = 'Off' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |    CAST(SUM(CASE WHEN grp = 'Off' THEN conv ELSE 0 END) AS BIGINT) AS x2
       |  FROM g GROUP BY 1, 2),
       |t AS (
       |  SELECT window_start, event_type, n1, x1, n2, x2,
       |    CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
       |      ELSE ${rSql(s"($z)", 4)} END AS z
       |  FROM c)
       |SELECT window_start, event_type, n1, x1, n2, x2, z,
       |  abs(z) > 3.0 AS alarm
       |FROM t ORDER BY window_start, event_type""".stripMargin
  }

  // ------------------------------------------------------------ CUSUM

  private def streamCusum(spark: SparkSession, dir: String): DataFrame = {
    Replay.replayViaFiles(spark, dir)(ds =>
      EventStream.cusumMonitor(ds, CusumRefMean, CusumH).toDF()
        .select(col("event_type"), col("day"), col("n"),
          r6(col("daily_mean")).as("daily_mean"),
          r4(col("cusum")).as("cusum"), col("alarm")))
      .orderBy("event_type", "day")
  }

  private val streamCusumOracle = {
    // Math.round(v*1e6) == floor(v*1e6 + 0.5) == DuckDB round() for the
    // strictly positive values in this table
    val meanRaw = "(CAST(SUM(CAST(round(value * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*))"
    // cum replays the monitor's STRICT LEFT FOLD (cum += mean − ref per
    // day, the fingerprint list_reduce discipline) — a windowed SUM's
    // association is engine-internal (segment trees), and a 1-ulp
    // divergence at an r4 boundary or near |cum| = h would flip the
    // pinned value / the alarm; the fold is bit-identical by IEEE
    s"""WITH d AS (
       |  SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n,
       |    $meanRaw AS mean_raw
       |  FROM events GROUP BY 1, 2),
       |c AS (
       |  SELECT event_type, day, n, mean_raw,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(mean_raw) OVER (PARTITION BY event_type ORDER BY day
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |      (acc, x) -> acc + (x - $CusumRefMean)) AS cum
       |  FROM d)
       |SELECT event_type, day, n, ${rSql("mean_raw", 6)} AS daily_mean,
       |  ${rSql("cum", 4)} AS cusum, abs(cum) > $CusumH AS alarm
       |FROM c ORDER BY event_type, day""".stripMargin
  }

  // ------------------------------------------------------------ sessions

  private def streamSessionize(spark: SparkSession, dir: String): DataFrame =
    Replay.replayViaFiles(spark, dir)(ds =>
      EventStream.sessionize(ds).toDF()
        // epoch-µs longs: exact cross-engine compare; sum_value is a raw
        // sequential float fold (unordered SQL SUM can differ 1 ulp), so
        // the driver projection carries the exact session identity only
        .select(col("user_id"),
          unix_micros(col("session_start")).as("session_start_us"),
          unix_micros(col("session_end")).as("session_end_us"),
          col("n_events")))
      .orderBy("user_id", "session_start_us")

  private val streamSessionizeOracle =
    // epoch_ms * 1000: the monitor's state keys sessions on
    // Timestamp.getTime (ms-floored), so the oracle must bucket on the
    // same ms grid, not raw µs
    // every window orders on the SAME total (ms, event_id) key: with
    // ms-tied rows, ordering the lag pass by raw ts but the prefix-sum
    // by bare ms would let a session-opening brk row slot after a
    // non-break row nondeterministically, splitting the session
    // differently than the monitor (same-ms events always share its
    // session, so the ms-grid order is semantically free)
    """WITH o AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
      |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS pms
      |  FROM events),
      |m AS (
      |  SELECT user_id, event_id, ms,
      |    CASE WHEN pms IS NULL OR ms - pms > 1800000 THEN 1 ELSE 0 END AS brk
      |  FROM o),
      |s AS (
      |  SELECT user_id, ms,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM m)
      |SELECT user_id, MIN(ms) * 1000 AS session_start_us,
      |  MAX(ms) * 1000 AS session_end_us, COUNT(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  // ------------------------------------------------------------ dedup

  private def streamDedup(spark: SparkSession, dir: String): DataFrame =
    // dupFeed: every micro-batch is delivered twice (at-least-once
    // simulation); the watermark-bounded state drops the re-deliveries
    Replay.replayViaFiles(spark, dir, dupFeed = true)(ds =>
      EventStream.dedupStream(ds.toDF())
        .filter(col("event_id") >= 0)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value")))
      .orderBy("event_id")

  private val streamDedupOracle =
    """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, "value"
      |FROM events ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------ stream-stream join

  /** Stream-STREAM interval join replayed through the file source: the
    * finalized left-outer output (matches emitted on arrival,
    * unmatched views null-extended as the watermark closes their
    * horizon) must equal the BATCH left join row-for-row — the
    * determinism claim of watermarked stream-stream joins, checked
    * against DuckDB's plain join. The sentinel's self-match and its
    * never-finalized view row are dropped with the `view_id >= 0`
    * guard. */
  private def streamJoin(spark: SparkSession, dir: String): DataFrame =
    Replay.replayViaFiles(spark, dir)(ds =>
      EventStream.intervalJoinStream(ds.toDF())
        .filter(col("view_id") >= 0)
        .select(col("user_id"), col("view_id"),
          unix_micros(col("view_ts")).as("view_ts_us"),
          col("purchase_id"), col("p_value")))
      .orderBy("view_id", "purchase_id")

  private val streamJoinOracle =
    """SELECT v.user_id, v.event_id AS view_id, epoch_us(v.ts) AS view_ts_us,
      |  p.event_id AS purchase_id, p."value" AS p_value
      |FROM (SELECT * FROM events WHERE event_type = 'view') v
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON v.user_id = p.user_id
      |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
      |ORDER BY view_id, purchase_id""".stripMargin

  // ------------------------------------------------------------ attribution

  private def streamAttribution(spark: SparkSession, dir: String): DataFrame =
    Replay.replayViaFiles(spark, dir)(ds =>
      EventStream.clickAttribution(ds.toDF())
        .select(col("purchase_id"), col("click_id"), col("user_id"),
          unix_micros(col("purchase_ts")).as("purchase_ts_us"),
          unix_micros(col("click_ts")).as("click_ts_us"), col("value")))
      .orderBy("purchase_id", "click_id")

  private val streamAttributionOracle =
    """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
      |  p.user_id, epoch_us(p.ts) AS purchase_ts_us,
      |  epoch_us(c.ts) AS click_ts_us, p."value"
      |FROM events p JOIN events c
      |  ON p.event_type = 'purchase' AND c.event_type = 'click'
      |  AND c.user_id = p.user_id
      |  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
      |ORDER BY purchase_id, click_id""".stripMargin

  // ------------------------------------------------------ heavy hitters

  private def streamHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    Replay.replayViaFiles(spark, dir)(ds => EventStream.windowedHeavyHitters(ds.toDF()))
      .orderBy("window_start", "rank")

  // exact at this cardinality (5 event types << the sketch's 1024
  // capacity), so the plain count/row_number oracle applies — the same
  // contract the batch q_heavy_hitters verifies
  private val streamHeavyHittersOracle =
    """SELECT window_start, rank, event_type, cnt FROM (
      |  SELECT date_trunc('hour', ts) AS window_start, event_type,
      |    COUNT(*) AS cnt,
      |    ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
      |      ORDER BY COUNT(*) DESC, event_type) AS rank
      |  FROM events GROUP BY 1, 2)
      |WHERE rank <= 3 ORDER BY window_start, rank""".stripMargin

  // ------------------------------------------------------------ reservoir

  private def streamReservoir(spark: SparkSession, dir: String): DataFrame =
    Replay.replayViaFiles(spark, dir)(ds => EventStream.sampleReservoir(ds.toDF()))
      .orderBy("window_start", "event_type", "rk")

  private val streamReservoirOracle = {
    // identical LCG text to EventStream.sampleReservoir (salt 77), ekey
    // r6-rounded before ranking per the weightedSample discipline
    val c77 = 12345L + 77L * 1013904223L
    val u = s"((((((event_id % 2147483648) * 1103515245 + $c77) % 2147483648)" +
      s" * 1103515245 + 12345) % 2147483648) + 1.0) / 2147483649.0"
    val ekey = rSql(s"""(-ln($u) / (greatest("value", 0.0) + 1.0))""", 6)
    s"""WITH keyed AS (
       |  SELECT date_trunc('hour', ts) AS window_start, event_type,
       |    event_id, $ekey AS ekey
       |  FROM events),
       |ranked AS (
       |  SELECT window_start, event_type, event_id, ekey,
       |    ROW_NUMBER() OVER (PARTITION BY window_start, event_type
       |      ORDER BY ekey, event_id) AS rk
       |  FROM keyed)
       |SELECT window_start, event_type, rk, event_id, ekey
       |FROM ranked WHERE rk <= 3
       |ORDER BY window_start, event_type, rk""".stripMargin
  }

  // ------------------------------------------------------------ DP release

  private def streamDp(spark: SparkSession, dir: String): DataFrame =
    Replay.replayViaFiles(spark, dir)(ds =>
      EventStream.dpReleaseStream(ds.toDF(), DpSeed))
      .orderBy("day", "event_type")

  private val streamDpOracle = {
    // the same fully-parenthesized full-day-index key as the monitor
    val gk = "((CAST(length(event_type) AS BIGINT) * 256 + ascii(substring(event_type, 1, 1)))" +
      " * 2097152 + (epoch_us(day) // 86400000000))"
    def lap(salt: Long, scale: String): String = {
      val sFold = java.lang.Math.floorMod(DpSeed, 2147483648L)
      val add = java.lang.Math.floorMod(
        12345L + salt * 1013904223L + sFold * 69069L, 2147483648L)
      val st = s"(((($gk % 2147483648) * 1103515245 + $add) % 2147483648)" +
        " * 1103515245 + 12345) % 2147483648"
      val u = s"((($st) + 1.0) / 2147483649.0)"
      s"(-$scale * sign($u - 0.5) * ln(1.0 - 2.0 * abs($u - 0.5)))"
    }
    s"""WITH d AS (
       |  SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS true_n,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) AS DOUBLE) AS true_sum
       |  FROM events GROUP BY 1, 2)
       |SELECT day, event_type,
       |  ${rSql(s"(true_n + ${lap(1L, "1.0")})", 4)} AS dp_n,
       |  ${rSql(s"(true_sum + ${lap(2L, "200.0")})", 4)} AS dp_sum
       |FROM d ORDER BY day, event_type""".stripMargin
  }

  // -------------------------------------------------- mSPRT / GST peeks

  /** mSPRT replay — the cumulative (n, Σvalue-micro) moments the monitor
    * accumulates are exact longs, and delta is pure IEEE arithmetic on
    * them, so THOSE columns are oracle-checked against a batch cumulative
    * window. The float-state readout columns (log_lambda/p_seq/p_avp —
    * squared-sum accumulation, ~1e-9 spec tolerance) stay self-certified:
    * cert_ok folds p_seq ∈ (0,1] and the running-min law p_avp ≤ p_seq
    * into a boolean the oracle pins to TRUE, then the float columns are
    * projected away. */
  private def streamMsprt(spark: SparkSession, dir: String): DataFrame =
    Replay.replayViaFiles(spark, dir)(ds => EventStream.msprtMonitor(ds).toDF())
      .withColumn("cert_ok",
        col("p_seq") > 0.0 && col("p_seq") <= 1.0 && col("p_avp") <= col("p_seq"))
      .select("event_type", "day", "n1", "n2", "s1_micro", "s2_micro",
        "delta", "cert_ok")
      .orderBy("event_type", "day")

  private val streamMsprtOracle = {
    // Math.round(v*1e6) == DuckDB round() for the strictly positive
    // values in this table (the streamCusumOracle note)
    val vMicro = "CAST(round(\"value\" * 1e6) AS BIGINT)"
    // delta replays the monitor bit-for-bit: micro-long / 1e6, then / n —
    // IEEE basic ops only, identical in both engines
    val delta = "((CAST(cs1 AS DOUBLE) / 1e6) / CAST(cn1 AS DOUBLE)" +
      " - (CAST(cs2 AS DOUBLE) / 1e6) / CAST(cn2 AS DOUBLE))"
    s"""WITH d AS (
       |  SELECT event_type, date_trunc('day', ts) AS day,
       |    CAST(SUM(CASE WHEN $onOffSql THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(SUM(CASE WHEN $onOffSql THEN $vMicro ELSE 0 END) AS BIGINT) AS s1,
       |    CAST(SUM(CASE WHEN $onOffSql THEN 0 ELSE 1 END) AS BIGINT) AS n2,
       |    CAST(SUM(CASE WHEN $onOffSql THEN 0 ELSE $vMicro END) AS BIGINT) AS s2
       |  FROM events GROUP BY 1, 2),
       |c AS (
       |  SELECT event_type, day,
       |    CAST(SUM(n1) OVER w AS BIGINT) AS cn1, CAST(SUM(s1) OVER w AS BIGINT) AS cs1,
       |    CAST(SUM(n2) OVER w AS BIGINT) AS cn2, CAST(SUM(s2) OVER w AS BIGINT) AS cs2
       |  FROM d
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT event_type, day, cn1 AS n1, cn2 AS n2, cs1 AS s1_micro,
       |  cs2 AS s2_micro, $delta AS delta, TRUE AS cert_ok
       |FROM c WHERE cn1 > 1 AND cn2 > 1
       |ORDER BY event_type, day""".stripMargin
  }

  /** GST replay — cumulative weekly moments oracle-checked exactly (the
    * streamMsprt discipline: micro-long sums + counts + interim index k
    * are integer-exact; weeks are epoch-aligned 7-day buckets, k counts
    * from the first nonempty week per type). The float z stays
    * self-certified: cert_ok re-derives the O'Brien–Fleming boundary and
    * the reject decision, then z/bound/reject are projected away. */
  private def streamGst(spark: SparkSession, dir: String): DataFrame =
    Replay.replayViaFiles(spark, dir)(ds => EventStream.gstMonitor(ds).toDF())
      .withColumn("cert_ok",
        abs(col("obf_bound") - lit(2.024) * sqrt(lit(4.0) / col("k"))) < 1e-12 &&
          (col("reject") === (abs(col("z")) > col("obf_bound"))))
      .select("event_type", "week_start", "k", "n1", "n2",
        "s1_micro", "s2_micro", "cert_ok")
      .orderBy("event_type", "week_start")

  private val streamGstOracle = {
    val vMicro = "CAST(round(\"value\" * 1e6) AS BIGINT)"
    val weekUs = 7L * 86400000000L
    s"""WITH wkd AS (
       |  SELECT event_type,
       |    make_timestamp((epoch_us(ts) // $weekUs) * $weekUs) AS week_start,
       |    CAST(SUM(CASE WHEN $onOffSql THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(SUM(CASE WHEN $onOffSql THEN $vMicro ELSE 0 END) AS BIGINT) AS s1,
       |    CAST(SUM(CASE WHEN $onOffSql THEN 0 ELSE 1 END) AS BIGINT) AS n2,
       |    CAST(SUM(CASE WHEN $onOffSql THEN 0 ELSE $vMicro END) AS BIGINT) AS s2
       |  FROM events GROUP BY 1, 2),
       |c AS (
       |  SELECT event_type, week_start,
       |    CAST((epoch_us(week_start) - epoch_us(MIN(week_start) OVER p)) // $weekUs AS BIGINT)
       |      + 1 AS k,
       |    CAST(SUM(n1) OVER w AS BIGINT) AS cn1, CAST(SUM(s1) OVER w AS BIGINT) AS cs1,
       |    CAST(SUM(n2) OVER w AS BIGINT) AS cn2, CAST(SUM(s2) OVER w AS BIGINT) AS cs2
       |  FROM wkd
       |  WINDOW p AS (PARTITION BY event_type),
       |    w AS (PARTITION BY event_type ORDER BY week_start
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT event_type, week_start, k, cn1 AS n1, cn2 AS n2,
       |  cs1 AS s1_micro, cs2 AS s2_micro, TRUE AS cert_ok
       |FROM c WHERE k <= 4 AND cn1 > 1 AND cn2 > 1
       |ORDER BY event_type, week_start""".stripMargin
  }

  /** Windowed quantile-sketch replay — rows-only (DDSketch interior
    * state is not SQL); certified against the batch per-window true
    * min/max envelope widened by the sketch's α = 1% relative-error
    * guarantee (bucket midpoints may overshoot the extremes by up to
    * ~2α relative), plus the p50 ≤ p95 order law. */
  private def streamQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val streamed = Replay.replayViaFiles(spark, dir)(ds =>
      EventStream.windowedQuantiles(ds.toDF()))
    val bounds = graft.Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour")).agg(
        min("value").as("lo"), max("value").as("hi"))
      .select(col("window.start").as("window_start"), col("lo"), col("hi"))
    streamed.join(bounds, Seq("window_start"))
      .withColumn("within_bound",
        col("p50") <= col("p95") &&
          col("p50") >= col("lo") * 0.98 && col("p95") <= col("hi") * 1.02)
      .orderBy("window_start")
  }

  // ------------------------------------------------- lakehouse sink

  /** The tumbling KPI monitor landing in a VERSIONED snapshot table
    * ([[EventStream.snapshotSink]]): same file-source replay, but the
    * terminal is the lakehouse sink — every micro-batch commits one
    * snapshot version with its batch id recorded for replay-skip, and
    * the registered result is read back THROUGH the snapshot reader
    * (manifest-planned file list), so the driver gate hash-checks the
    * entire stream → version-commit → snapshot-read path against the
    * batch oracle. Shares q_stream_tumbling's oracle by construction. */
  private def streamSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val (input, stage, _) = Replay.stageFeed(spark, dir)
    // cleanup registered BEFORE the query starts: a failed stream (or a
    // zero-version readSnapshot) must not leak the staged feed + table
    // + checkpoint in tmp (the compactFiles discipline)
    graft.CacheScope.defer(() => graft.sources.Sources.deleteRecursively(stage))
    // the sink table and checkpoint live in a SIBLING dir, never inside
    // the feed dir the FileStreamSource watches: nesting them there only
    // works while the source's listing ignores subdirectories, and any
    // listing change (recursiveFileLookup, altered semantics) would feed
    // the sink's own output back into the source as input
    val sinkDir = new java.io.File(stage.getParentFile, stage.getName + "-sink")
    graft.CacheScope.defer(() => graft.sources.Sources.deleteRecursively(sinkDir))
    val tbl = new java.io.File(sinkDir, "table").getAbsolutePath
    val cp = new java.io.File(sinkDir, "cp").getAbsolutePath
    val q = EventStream.snapshotSink(
      EventStream.tumblingCounts(input.toDF()), tbl, cp)
    try q.processAllAvailable() finally q.stop()
    val out = graft.operators.Maintenance.readSnapshot(spark, tbl)
      .orderBy("window_start", "event_type")
    val rows = out.collect()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  // ------------------------------------------- lakehouse STREAM SOURCE

  /** Tail a versioned snapshot table as a stream —
    * [[graft.sources.SnapshotStreamSource]] end-to-end: three quarters
    * of events land as versions BEFORE the stream starts (the
    * backfill), the fourth is appended WHILE it runs (the tail), with
    * `maxVersionsPerTrigger = 1` so every version arrives in its own
    * micro-batch through the checkpointed offset machinery. The
    * complete-mode aggregate over the tailed rows must equal the
    * full-table aggregate — a dropped version, a double-read file, or
    * a leaked carried file all hash-fail against the raw-table oracle.
    * Round10bSpec pins the mechanics this gate can't see: per-version
    * batch boundaries, restart exactly-once from the checkpoint, and
    * the non-append-commit refusal. */
  private def snapshotStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Maintenance
    val stage = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_snapstream_${java.util.UUID.randomUUID().toString.take(8)}")
    graft.CacheScope.defer(() => graft.sources.Sources.deleteRecursively(stage))
    val p = new java.io.File(stage, "table").getAbsolutePath
    val ev = graft.Tables.events(spark, dir)
    def quarter(r: Int) = ev.filter(col("event_id") % 4 === r)
    Maintenance.snapshotWrite(quarter(0), p, nFiles = 2,
      statsCols = Seq("event_id"), clusterBy = Some("event_id"))
    Maintenance.snapshotAppend(quarter(1), p, nFiles = 2,
      statsCols = Seq("event_id"), clusterBy = Some("event_id"))
    Maintenance.snapshotAppend(quarter(2), p, nFiles = 2,
      statsCols = Seq("event_id"), clusterBy = Some("event_id"))
    val name = s"graft_snapstream_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = spark.readStream.format("graft.sources.SnapshotSource")
      .option("maxVersionsPerTrigger", 1L).load(p)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).as("sum_dec"))
      .writeStream.format("memory").queryName(name)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .option("checkpointLocation",
        new java.io.File(stage, "cp").getAbsolutePath)
      .start()
    try {
      q.processAllAvailable() // backfill: v1..v3, one batch each
      Maintenance.snapshotAppend(quarter(3), p, nFiles = 2,
        statsCols = Seq("event_id"), clusterBy = Some("event_id")): Unit
      q.processAllAvailable() // tail: the live append arrives
    } finally q.stop()
    val out = spark.table(name)
      .select(col("event_type"), col("n"),
        col("sum_dec").cast("double").as("sum_value"))
      .orderBy("event_type")
    val rows = out.collect()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  private val snapshotStreamOracle =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The whole incremental pipeline in one query — snapshot STREAM
    * source → signed-free IVM fold → versioned REPLACE sink, i.e.
    * "keep a materialized dashboard exact over a growing table at
    * O(delta) per refresh, exactly once, with the view's own commit
    * history": each micro-batch (one table version, paced) folds its
    * ivmState into the view read from the view table's head and
    * commits the successor state as one REPLACE version keyed by the
    * batch id ([[graft.operators.Maintenance.snapshotSinkReplace]] —
    * a restart that re-delivers a handled batch leaves the view
    * untouched, so the maintenance is exactly-once end to end). The
    * final view must hash-equal the full-table aggregate; Round10bSpec
    * pins one-version-per-batch view history and the restart path. */
  private def streamIvm(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Maintenance
    val stage = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_sivm_${java.util.UUID.randomUUID().toString.take(8)}")
    graft.CacheScope.defer(() => graft.sources.Sources.deleteRecursively(stage))
    val tbl = new java.io.File(stage, "table").getAbsolutePath
    val viewP = new java.io.File(stage, "view").getAbsolutePath
    val ev = graft.Tables.events(spark, dir)
    def quarter(r: Int) = ev.filter(col("event_id") % 4 === r)
    Maintenance.snapshotWrite(quarter(0), tbl, nFiles = 2,
      statsCols = Seq("event_id"), clusterBy = Some("event_id"))
    Maintenance.snapshotAppend(quarter(1), tbl, nFiles = 2,
      statsCols = Seq("event_id"), clusterBy = Some("event_id"))
    Maintenance.snapshotAppend(quarter(2), tbl, nFiles = 2,
      statsCols = Seq("event_id"), clusterBy = Some("event_id"))
    val keys = Seq("event_type")
    val q = spark.readStream.format("graft.sources.SnapshotSource")
      .option("maxVersionsPerTrigger", 1L).load(tbl)
      .writeStream
      .option("checkpointLocation", new java.io.File(stage, "cp").getAbsolutePath)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val delta = Maintenance.ivmState(batch.toDF(), keys, "value")
        val next =
          if (Maintenance.snapshotVersions(spark, viewP).isEmpty) delta
          else Maintenance.ivmMerge(
            Maintenance.readSnapshot(spark, viewP), delta, keys)
        Maintenance.snapshotSinkReplace(next, viewP, id)
      }
      .start()
    try {
      q.processAllAvailable() // backfill: the view folds v1..v3
      Maintenance.snapshotAppend(quarter(3), tbl, nFiles = 2,
        statsCols = Seq("event_id"), clusterBy = Some("event_id")): Unit
      q.processAllAvailable() // tail: the live append folds in
    } finally q.stop()
    val out = Maintenance.readSnapshot(spark, viewP)
      .select(col("event_type"), col("n"),
        col("sum_dec").cast("double").as("sum_value"))
      .orderBy("event_type")
    val rows = out.collect()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  def ops: Seq[Op] = Seq(
    Op("q_stream_tumbling", streamTumbling, Some(streamTumblingOracle)),
    Op("q_snapshot_stream", snapshotStream, Some(snapshotStreamOracle)),
    Op("q_stream_ivm", streamIvm, Some(snapshotStreamOracle)),
    Op("q_stream_snapshot", streamSnapshot, Some(streamTumblingOracle)),
    Op("q_stream_sb_rollup", streamSbRollup, Some(streamSbRollupOracle)),
    Op("q_stream_srm", streamSrm, Some(streamSrmOracle)),
    Op("q_stream_psi", streamPsi, Some(streamPsiOracle)),
    Op("q_stream_mad", streamMad, Some(streamMadOracle)),
    Op("q_stream_conv", streamConv, Some(streamConvOracle)),
    Op("q_stream_cusum", streamCusum, Some(streamCusumOracle)),
    Op("q_stream_sessionize", streamSessionize, Some(streamSessionizeOracle)),
    Op("q_stream_heavy_hitters", streamHeavyHitters, Some(streamHeavyHittersOracle)),
    Op("q_stream_reservoir", streamReservoir, Some(streamReservoirOracle)),
    Op("q_stream_dedup", streamDedup, Some(streamDedupOracle)),
    Op("q_stream_join", streamJoin, Some(streamJoinOracle)),
    Op("q_stream_attribution", streamAttribution, Some(streamAttributionOracle)),
    Op("q_stream_dp", streamDp, Some(streamDpOracle)),
    Op("q_stream_msprt", streamMsprt, Some(streamMsprtOracle)),
    Op("q_stream_gst", streamGst, Some(streamGstOracle)),
    Op("q_stream_quantiles", streamQuantiles, None),
  )
}
