package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the stream (mirrors the batch `events` table). */
final case class Event(event_id: Long, ts: java.sql.Timestamp,
    user_id: Long, event_type: String, value: Double)

/** Emitted when a session closes (watermark-driven). */
final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

private final case class SessionState(startUs: Long, lastUs: Long,
    n: Long, sum: Double)

/** One experiment day's On/Off moments, accumulating in state until the
  * watermark passes the day boundary. Value sums are micro-scaled longs
  * (exact, order-invariant); squared sums are doubles. */
private final case class DayMoments(dayUs: Long,
    n1: Long, s1Micro: Long, ss1: Double,
    n2: Long, s2Micro: Long, ss2: Double)

private final case class MsprtState(open: List[DayMoments],
    cumN1: Long, cumS1Micro: Long, cumSs1: Double,
    cumN2: Long, cumS2Micro: Long, cumSs2: Double,
    minP: Double, lastFinalUs: Long)

/** Daily anytime-valid readout emitted when a day finalizes.
  * s1_micro/s2_micro are the cumulative micro-scaled value sums — exact
  * longs, so they (and delta, pure IEEE arithmetic on them) are
  * oracle-checkable even though the float-state columns are not. */
final case class MsprtReadout(event_type: String, day: java.sql.Timestamp,
    n1: Long, n2: Long, s1_micro: Long, s2_micro: Long,
    delta: Double, log_lambda: Double, p_seq: Double, p_avp: Double)

private final case class GstState(open: List[DayMoments],
    cumN1: Long, cumS1Micro: Long, cumSs1: Double,
    cumN2: Long, cumS2Micro: Long, cumSs2: Double,
    firstWeekUs: Long, lastFinalUs: Long)

/** Weekly group-sequential readout emitted when a week finalizes.
  * s1_micro/s2_micro: exact cumulative micro-scaled sums (the
  * MsprtReadout discipline) — the oracle-checkable slice of the state. */
final case class GstReadout(event_type: String, week_start: java.sql.Timestamp,
    k: Long, n1: Long, n2: Long, s1_micro: Long, s2_micro: Long,
    z: Double, obf_bound: Double, reject: Boolean)

/** One day's single-arm count + exact micro-scaled sum — the minimal
  * state a mean-based monitor needs (CUSUM has no On/Off split). */
private final case class DaySum(dayUs: Long, n: Long, sMicro: Long)

private final case class CusumState(open: List[DaySum],
    cum: Double, lastFinalUs: Long)

/** Daily CUSUM readout emitted when a day finalizes. */
final case class CusumReadout(event_type: String, day: java.sql.Timestamp,
    n: Long, daily_mean: Double, cusum: Double, alarm: Boolean)

/** Structured Streaming twins of the batch operators (SURVEY.md §2
  * block D): the same switchback aggregations the reference computes
  * daily, expressed incrementally.
  *
  * Scale: state is keyed by (window×type) or user — partitioned across
  * executors by the shuffle on the grouping key; watermarks bound state
  * size; output is append-mode so sinks see only finalized windows.
  */
object EventStream {

  /** EXACTLY-ONCE parquet sink for an append-mode finalized frame —
    * the production landing side of every monitor here (the memory
    * sink in specs/replays is the test adapter).
    *
    * foreachBatch is at-least-once: after a crash the last
    * un-committed micro-batch re-executes. Each batch therefore lands
    * as ONE self-contained directory keyed by its batchId
    * (`.../batch=<id>/`) written with mode Overwrite — a replayed
    * batch overwrites only its own directory, so restart duplicates
    * are structurally impossible and readers see the union of
    * committed batches as an ordinary partitioned parquet dataset.
    * Append-mode inputs emit each finalized window exactly once
    * across batches, so no deduplication across directories is ever
    * needed.
    *
    * At scale this is the standard idempotent-landing pattern; the
    * checkpoint directory carries source offsets, so a restarted
    * query resumes, re-runs at most one batch, and lands it on top of
    * itself.
    *
    * DETERMINISM PRECONDITION: exactly-once rests on a replayed batch
    * recomputing the SAME rows (true for the append-mode watermark-
    * finalized aggregations here — a batch's content is a pure function
    * of its source offsets — but not for transforms reading wall-clock
    * time or unseeded randomness).
    *
    * Empty micro-batches are skipped: a directory holding no parquet
    * footers would otherwise break schema inference on the readers'
    * `spark.read.parquet(path)` when EVERY batch is empty. */
  def exactlyOnceParquetSink(finalized: DataFrame, path: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    finalized.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // persist: isEmpty + write would otherwise run the batch plan twice
        batch.persist()
        try if (!batch.isEmpty) batch.write.mode("overwrite").parquet(s"$path/batch=$id")
        finally batch.unpersist(blocking = false): Unit
      }
      .start()

  /** Stream into a VERSIONED snapshot table (the lakehouse sink): each
    * non-empty finalized micro-batch commits one snapshot append
    * version via [[graft.operators.Maintenance.snapshotSinkBatch]],
    * which records the batch id in the manifest and skips re-delivered
    * ids — exactly-once across restarts on top of foreachBatch's
    * at-least-once contract. Compared to [[exactlyOnceParquetSink]]'s
    * one-directory-per-batch layout, readers here get atomic version
    * visibility, time travel over the ingest history, and
    * vacuum/compaction as maintenance — the sink a long-running
    * monitoring deployment actually wants under its dashboards. */
  def snapshotSink(finalized: DataFrame, path: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    finalized.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.operators.Maintenance.snapshotSinkBatch(batch, path, id)
      }
      .start()

  /** Tumbling 1-hour per-event_type KPI aggregation with a 2-hour
    * watermark — the streaming twin of TimeSeries.windowTumbling. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // DECIMAL sum (Compat discipline): float accumulation order varies
      // with the micro-batch chop, exact decimal state does not
      .agg(count(lit(1)).as("n"),
        graft.functions.Compat.sumMoney(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Switchback On/Off live rollup (streaming twin of
    * Switchback.sbMetrics). */
  def sbMetricsStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .withColumn("on_off",
        when((expr("unix_micros(date_trunc('hour', ts)) div 3600000000") +
          col("user_id") % 10) % 2 === 0, "On").otherwise("Off"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"), col("on_off"))
      // exact-decimal mean, r2-rounded — the batch sbMetrics discipline,
      // and chop-invariant where a float avg() would not be
      .agg(count(lit(1)).as("n"),
        graft.functions.Compat.r2(
          graft.functions.Compat.avgMoney(col("value"))).as("value_per_order"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("on_off"), col("n"), col("value_per_order"))

  /** Streaming windowed quantiles through the custom mergeable
    * quantile sketch (functions.QuantileSketchAgg): p50/p95 per
    * tumbling window. The sketch's count-addition merge is exactly what
    * incremental aggregation state needs — each micro-batch's partial
    * buffers fold into state commutatively, so the emitted quantiles
    * equal a batch run over the same rows regardless of how the stream
    * was chopped into batches. */
  def windowedQuantiles(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"),
        graft.functions.QuantileSketch
          .quantileSketch(col("value"), Seq(0.5, 0.95)).as("qs"))
      .select(col("window.start").as("window_start"), col("n"),
        col("qs").getItem(0).as("p50"), col("qs").getItem(1).as("p95"))

  /** Live per-window heavy hitters through the mergeable SpaceSaving
    * aggregate ([[graft.functions.TopKAgg]]) — the streaming twin of
    * the batch q_heavy_hitters ("what's trending this hour"). The
    * aggregate's state is its serialized counter buffer, merged
    * incrementally exactly like the batch map-side combine; with
    * capacity ≥ |distinct items| the result is exact and therefore
    * batch-chop-invariant (the spec's claim), and at real cardinality
    * it degrades to the usual ε-bounded approximation at fixed state
    * size — which is what makes it safe for unbounded streams. */
  def windowedHeavyHitters(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.TopKAgg.topkItems(col("event_type"), 3).as("top"))
      .select(col("window.start").as("window_start"), posexplode(col("top")))
      .select(col("window_start"), (col("pos") + 1).as("rank"),
        col("col.item").as("event_type"), col("col.cnt").as("cnt"))

  /** Stream-stream interval join: each purchase joins the same user's
    * clicks from the preceding hour. Both sides carry watermarks so the
    * join state is bounded — Spark buffers only an hour of clicks per
    * user (the canonical attribution join, incremental). */
  def clickAttribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** Streaming differentially-private release (streaming twin of
    * Approx.dpAggregate, the continual-observation pattern): per
    * finalized tumbling day × event_type, emit count+sum with
    * Laplace(sens/ε) noise. The draw is keyed on (group, window start
    * day, run seed) through the portable LCG, so the noise for a
    * window is a pure function of its key — emitted values are
    * independent of how the stream was chopped into micro-batches
    * (chop-invariance spec) and each window's release is computed
    * exactly once (append mode: a window is published only after its
    * watermark finalizes it).
    *
    * PRIVACY CONTRACT (same as Approx.dpAggregate): the mechanism is
    * real but the noise is only as secret as `seed` — the fixed
    * default exists for reproducible tests; an actual release supplies
    * a seed kept secret from consumers (ideally a cryptographic RNG). */
  def dpReleaseStream(events: DataFrame, seed: Long = 0L): DataFrame = {
    // FULL day index, fully parenthesized: a % 64 day fold re-drew the
    // IDENTICAL noise every 64 days, so the difference of two releases
    // 64 days apart cancelled the noise exactly - a real privacy leak
    // beyond the documented seed-secrecy caveat. 2^21 day multiplier
    // keeps (type, day) keys collision-free for ~5.7k years.
    val gk = "((CAST(length(event_type) AS BIGINT) * 256 + ascii(substring(event_type, 1, 1)))" +
      " * 2097152 + (unix_micros(window.start) div 86400000000))"
    def lap(salt: Long, scale: String): String = {
      // fold the seed into [0, 2^31) first — unreduced seeds can push
      // the LCG state negative (ln of a negative -> NULL releases) or
      // overflow seed*69069 so two distinct seeds collide (see
      // Approx.lapSql, same discipline)
      val sFold = java.lang.Math.floorMod(seed, 2147483648L)
      val add = java.lang.Math.floorMod(
        12345L + salt * 1013904223L + sFold * 69069L, 2147483648L)
      val st = s"((((($gk % 2147483648) * 1103515245 + $add) % 2147483648)" +
        " * 1103515245 + 12345) % 2147483648)"
      val u = s"(($st + 1.0) / 2147483649.0)"
      s"(-$scale * sign($u - 0.5) * ln(1.0 - 2.0 * abs($u - 0.5)))"
    }
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("true_n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .cast("double").as("true_sum"))
      .select(col("window.start").as("day"), col("event_type"),
        graft.functions.Compat.r4(col("true_n") + expr(lap(1L, "1.0"))).as("dp_n"),
        graft.functions.Compat.r4(col("true_sum") + expr(lap(2L, "200.0"))).as("dp_sum"))
  }

  /** Streaming weighted reservoir sample — the streaming twin of the
    * batch sampling block (Approx.weightedSample / stratifiedSample):
    * per finalized window × event_type (the stratum), keep the k
    * events with the smallest Efraimidis–Spirakis key
    * e = −ln(u)/(value+1), u from the SAME portable LCG recipe
    * (salt 77) the batch operator draws from, keyed on event_id.
    *
    * The selection runs through the mergeable bottom-k aggregate
    * ([[graft.functions.BottomKAgg]]): state per group is k pairs, the
    * merge is order-invariant under the strict (ekey, event_id) order,
    * so emitted samples are independent of the micro-batch chop — and
    * equal a batch replay of the same law over the finalized window
    * (the spec's claim). Weight value+1 keeps the key finite for
    * zero-valued events.
    *
    * Determinism: ekey is rounded to the 1e-6 grid BEFORE selection —
    * the same discipline as the batch Approx.weightedSample (JVM and
    * libm `ln` can differ by 1 ulp; post-rounding ties break on
    * event_id identically in every engine). */
  def sampleReservoir(events: DataFrame, k: Int = 3): DataFrame = {
    val c77 = 12345L + 77L * 1013904223L
    val u = s"((((((event_id % 2147483648) * 1103515245 + $c77) % 2147483648)" +
      s" * 1103515245 + 12345) % 2147483648) + 1.0) / 2147483649.0"
    val ekey = s"(-ln($u) / (greatest(value, 0.0) + 1.0))"
    events
      .withWatermark("ts", "2 hours")
      .withColumn("ekey", graft.functions.Compat.r6(expr(ekey)))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(graft.functions.BottomKAgg.bottomK(col("ekey"), col("event_id"), k).as("picks"))
      .select(col("window.start").as("window_start"), col("event_type"),
        posexplode(col("picks")))
      .select(col("window_start"), col("event_type"), (col("pos") + 1).as("rk"),
        col("col.id").as("event_id"), col("col.ekey").as("ekey"))
  }

  /** Stream-STREAM interval join — the attribution primitive (every
    * impression↔conversion pipeline): views LEFT OUTER joined to same-
    * user purchases landing within [view ts, view ts + 1 h], both
    * sides watermarked so the join state is BOUNDED (a view's buffer
    * row is evictable once the watermark passes its match horizon;
    * purchases likewise — without the bounds the state grows with the
    * stream forever). Inner matches emit the moment both rows have
    * arrived; an unmatched view emits null-extended exactly when the
    * watermark proves no purchase can still arrive — so the finalized
    * output equals the BATCH left join row-for-row, which is what the
    * oracle checks. The sentinel rides BOTH branches (user −1, matches
    * nothing) purely to push the final watermark; callers drop it.
    *
    * At 100 TB this is the shape to keep: equality key first
    * (user_id) so the join is hash-partitioned user-wise, the time
    * bound as a range predicate on top, and watermarks as the state
    * GC. A time-only interval join (no equality key) would buffer
    * every row against every other — the cross-join cliff. */
  def intervalJoinStream(events: DataFrame): DataFrame = {
    // ONE watermark node, branches filtered under it (the documented
    // self-join shape): the watermark metadata rides the aliased ts
    // into both join inputs, so a single far-future sentinel row
    // advances the one tracked watermark even when a branch's filter
    // drops it — two independent watermark nodes would each need
    // their own sentinel to un-stick the min policy
    val wm = events.withWatermark("ts", "2 hours")
    val views = wm
      .filter(col("event_type") === "view" || col("event_type") === "sentinel")
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val buys = wm
      .filter(col("event_type") === "purchase" || col("event_type") === "sentinel")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value").as("p_value"))
    views.join(buys,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("view_ts") &&
        col("p_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
  }

  /** Streaming exact dedup — drops re-deliveries of the same event_id
    * inside the watermark horizon (the streaming twin of
    * operators.Dedup.dedupExact; state is bounded by the watermark). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Live drift monitor — the streaming twin of TimeSeries.psi: per
    * finalized 1-day window × event_type, the population stability
    * index of that day's value distribution against a FIXED reference
    * binning (cut points + reference bin shares supplied by the
    * caller — in production the batch q_psi computes both from a
    * frozen reference snapshot, so batch defines "normal" and the
    * stream patrols it). An upstream shift pages on the day it
    * happens instead of at the next batch audit.
    *
    * Chop-invariance: bin assignment is scan-local, bin counts are
    * additive longs, and the PSI folds its bins in fixed order from
    * the FINALIZED counts only — so emitted rows are byte-identical
    * under any micro-batch chop (the spec's claim). State per key is
    * one count vector per open window. */
  def psiMonitor(events: DataFrame, cuts: Seq[Double], refShares: Seq[Double]): DataFrame = {
    require(refShares.size == cuts.size + 1, "one reference share per bin")
    val nb = cuts.size + 1
    val binCol = aggregate(typedLit(cuts), lit(0),
      (acc, c) => acc + when(col("value") > c, 1).otherwise(0))
    val cAggs = (0 until nb).map(b =>
      sum(when(col("bin") === b, 1L).otherwise(0L)).as(s"c$b"))
    val agg = events
      .withWatermark("ts", "2 hours")
      .withColumn("bin", binCol)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), cAggs: _*)
    val terms = (0 until nb).map { b =>
      val q = (col(s"c$b") + 0.5) / (col("n") + lit(nb * 0.5))
      val p = lit(refShares(b))
      graft.functions.Compat.r6((q - p) * log(q / p))
    }
    agg.select(col("window.start").as("window_start"), col("event_type"),
        col("n"), graft.functions.Compat.r4(terms.reduce(_ + _)).as("psi"))
      .withColumn("drift", col("psi") >= 0.2)
  }

  /** Live robust-anomaly monitor — the streaming twin of
    * TimeSeries.madAnomaly: per finalized 1-day window × event_type,
    * the modified z-score 0.6745·(daily_mean − refMed)/refMad of the
    * day's KPI against a FIXED reference median/MAD supplied by the
    * caller (the batch q_mad_anomaly over a frozen reference period
    * defines "normal" — the psiMonitor contract), flagging |rz| > 2.5.
    * Median/MAD references make the alarm robust to the anomaly
    * itself, where a live mean/σ threshold drifts with the break.
    *
    * Chop-invariance: the day's value sum accumulates in exact
    * DECIMAL, the mean divides once at finalize, and rz is scan-local
    * arithmetic on the finalized aggregate — emitted rows are
    * byte-identical under any micro-batch chop. */
  def madMonitor(events: DataFrame, refMed: Double, refMad: Double): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val r6 = graft.functions.Compat.r6 _
    val r4 = graft.functions.Compat.r4 _
    val mean = r6(col("s") / col("n"))
    // degenerate reference (refMad == 0) yields null rz, not Infinity —
    // mirroring the batch twin's nz(col("mad")) divisor guard
    val madDiv = when(lit(refMad) =!= 0.0, lit(refMad))
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("s"))
      .select(col("window.start").as("day"), col("event_type"), col("n"),
        mean.as("daily_mean"),
        r4(lit(0.6745) * (mean - refMed) / madDiv).as("rz"))
      .withColumn("is_anomaly", abs(col("rz")) > 2.5)
  }

  /** Live conversion-rate guard — the streaming twin of
    * Stats.propTest: per finalized window × event_type, the On/Off
    * conversion counts (conversion = value above a FROZEN batch-derived
    * threshold, the psiMonitor contract) and the pooled-SE two-
    * proportion z, flagging |z| > 3 — a conversion regression in one
    * arm pages within the hour instead of at the daily batch readout.
    *
    * Chop-invariance: the 2×2 cells are additive integer counts and z
    * is scan-local arithmetic on the finalized aggregate. */
  def convGuard(events: DataFrame, threshold: Double): DataFrame = {
    val r4 = graft.functions.Compat.r4 _
    val onOff = when((expr("unix_micros(date_trunc('hour', ts)) div 3600000000") +
      col("user_id") % 10) % 2 === 0, "On").otherwise("Off")
    def nz(c: org.apache.spark.sql.Column) = when(c =!= 0, c)
    val agg = events
      .withWatermark("ts", "2 hours")
      .withColumn("g", onOff)
      .withColumn("conv", (col("value") > threshold).cast("long"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        sum(when(col("g") === "On", 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") === "On", col("conv")).otherwise(0L)).as("x1"),
        sum(when(col("g") === "Off", 1L).otherwise(0L)).as("n2"),
        sum(when(col("g") === "Off", col("conv")).otherwise(0L)).as("x2"))
    val p1 = col("x1") / nz(col("n1"))
    val p2 = col("x2") / nz(col("n2"))
    val pp = (col("x1") + col("x2")) / nz(col("n1") + col("n2"))
    // nz on every divisor: an empty arm must yield a null z, and under
    // ANSI mode (Spark 4 default) an unguarded 1/0 kills the stream
    val z = (p1 - p2) /
      nz(sqrt(pp * (lit(1) - pp) * (lit(1.0) / nz(col("n1")) + lit(1.0) / nz(col("n2")))))
    agg.select(col("window.start").as("window_start"), col("event_type"),
        col("n1"), col("x1"), col("n2"), col("x2"), r4(z).as("z"))
      .withColumn("alarm", abs(col("z")) > 3.0)
  }

  /** Live sample-ratio-mismatch guard — the streaming twin of
    * Switchback.srmChisq per tumbling window: a broken assignment
    * (e.g. a zone dropping out of one arm) shows up as a chi-square
    * spike on finalized windows, hours before a daily batch check
    * would see it. Pure post-aggregation scalar math, append mode. */
  def srmGuard(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .withColumn("on_off",
        when((expr("unix_micros(date_trunc('hour', ts)) div 3600000000") +
          col("user_id") % 10) % 2 === 0, "On").otherwise("Off"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("on_off") === "On", 1L).otherwise(0L)).as("n_on"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("n_on"), (col("n") - col("n_on")).as("n_off"),
        ((col("n_on") - col("n") / 2.0) * (col("n_on") - col("n") / 2.0) / (col("n") / 2.0) +
          ((col("n") - col("n_on")) - col("n") / 2.0) *
            ((col("n") - col("n_on")) - col("n") / 2.0) / (col("n") / 2.0)).as("chisq"))

  /** Streaming mixture-SPRT monitor — the incremental twin of
    * operators.Stats.msprt: per event_type, cumulative On/Off moments
    * advance one experiment DAY at a time as the watermark passes each
    * day boundary, emitting the running mean difference, the
    * normal-mixture log likelihood ratio, and the running-min
    * anytime-valid p. Continuous monitoring is exactly the workload the
    * reference's notebooks simulate by re-reading live tests daily —
    * here every emitted row is a peek-safe readout.
    *
    * Chop-robustness: counts and value sums accumulate as longs
    * (micro-scaled — exact and commutative across micro-batch
    * boundaries), so delta is bit-identical however the stream is
    * chopped; only the squared-sum term is a float accumulation
    * (documented ~1e-9 relative tolerance in the spec). Emission
    * happens ONLY at day finalization, so no partial-day readout can
    * leak. State per key is the open (un-watermarked) day buckets plus
    * seven cumulative scalars — bounded by the watermark horizon. */
  def msprtMonitor(events: Dataset[Event]): Dataset[MsprtReadout] = {
    import events.sparkSession.implicits._
    val dayUsLen = 86400000000L
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[MsprtState, MsprtReadout](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (eventType: String, it: Iterator[Event], state: GroupState[MsprtState]) =>
          var st = state.getOption.getOrElse(
            MsprtState(Nil, 0L, 0L, 0.0, 0L, 0L, 0.0, 1.0, Long.MinValue))
          // fold this batch's events into per-day buckets; an event for
          // a day that ALREADY finalized is dropped — its readout was
          // emitted (append mode cannot retract), so folding it into the
          // cumulative moments would double-count against every later
          // day's readout. Spark's own late-record filter drops most of
          // these at the watermark; this guard makes the contract hold
          // even for records that race the watermark advance.
          it.foreach { e =>
            val us = e.ts.getTime * 1000L
            val day = us - java.lang.Math.floorMod(us, dayUsLen)
            if (day > st.lastFinalUs) {
              val hour = java.lang.Math.floorDiv(us, 3600000000L)
              val on = (hour + e.user_id % 10) % 2 == 0
              val vMicro = java.lang.Math.round(e.value * 1e6)
              val cur = st.open.find(_.dayUs == day).getOrElse(
                DayMoments(day, 0L, 0L, 0.0, 0L, 0L, 0.0))
              val upd =
                if (on) cur.copy(n1 = cur.n1 + 1, s1Micro = cur.s1Micro + vMicro,
                  ss1 = cur.ss1 + e.value * e.value)
                else cur.copy(n2 = cur.n2 + 1, s2Micro = cur.s2Micro + vMicro,
                  ss2 = cur.ss2 + e.value * e.value)
              st = st.copy(open = upd :: st.open.filterNot(_.dayUs == day))
            }
          }
          // finalize every day fully below the watermark, in day order
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (done, open) = st.open.partition(_.dayUs + dayUsLen <= wmUs)
          val out = done.sortBy(_.dayUs).flatMap { d =>
            st = st.copy(
              cumN1 = st.cumN1 + d.n1, cumS1Micro = st.cumS1Micro + d.s1Micro,
              cumSs1 = st.cumSs1 + d.ss1,
              cumN2 = st.cumN2 + d.n2, cumS2Micro = st.cumS2Micro + d.s2Micro,
              cumSs2 = st.cumSs2 + d.ss2, lastFinalUs = d.dayUs)
            if (st.cumN1 > 1 && st.cumN2 > 1) {
              val n1 = st.cumN1.toDouble; val n2 = st.cumN2.toDouble
              val s1 = st.cumS1Micro / 1e6; val s2 = st.cumS2Micro / 1e6
              val delta = s1 / n1 - s2 / n2
              val sig2 = ((st.cumSs1 - s1 * s1 / n1) +
                (st.cumSs2 - s2 * s2 / n2)) / (n1 + n2 - 2.0)
              val se2 = sig2 * (1.0 / n1 + 1.0 / n2)
              val logLambda = 0.5 * math.log(se2 / (se2 + sig2)) +
                sig2 * delta * delta / (2.0 * se2 * (se2 + sig2))
              val pSeq = math.min(1.0, math.exp(-logLambda))
              // a degenerate day (pooled variance exactly 0 -> NaN
              // logLambda) must not poison the running minimum: NaN
              // stored once would surface as p_avp forever after
              if (!pSeq.isNaN)
                st = st.copy(minP = math.min(st.minP, pSeq))
              Some(MsprtReadout(eventType, new java.sql.Timestamp(d.dayUs / 1000L),
                st.cumN1, st.cumN2, st.cumS1Micro, st.cumS2Micro,
                delta, logLambda, pSeq, st.minP))
            } else None
          }
          st = st.copy(open = open)
          // cumulative-by-design: state persists for the experiment's
          // lifetime (one row of scalars per event_type)
          state.update(st)
          // wake up when the earliest open day can finalize (strictly
          // above the current watermark by construction of `open`)
          open.map(_.dayUs + dayUsLen).sorted.headOption
            .foreach(us => state.setTimeoutTimestamp(us / 1000L))
          out.iterator
      }
  }

  /** Live group-sequential monitor — the streaming twin of
    * Switchback.gst: per event_type, cumulative On/Off moments advance
    * one CALENDAR WEEK at a time as the watermark passes each epoch-
    * aligned week boundary, and each finalized week k ≤ 4 emits the
    * cumulative z against the O'Brien–Fleming boundary
    * b_k = 2.024·√(4/k). Weeks are epoch-aligned (never derived from
    * arrival order), and the interim index k counts from the first
    * nonempty week in EVENT time, so the readout is micro-batch-chop
    * invariant; value sums accumulate as micro-scaled longs (exact),
    * squared sums as doubles (documented ~1e-9 spec tolerance) — the
    * msprtMonitor discipline throughout. State per key: open week
    * buckets (watermark-bounded) + eight scalars. */
  def gstMonitor(events: Dataset[Event]): Dataset[GstReadout] = {
    import events.sparkSession.implicits._
    val weekUs = 7L * 86400000000L
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[GstState, GstReadout](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (eventType: String, it: Iterator[Event], state: GroupState[GstState]) =>
          var st = state.getOption.getOrElse(
            GstState(Nil, 0L, 0L, 0.0, 0L, 0L, 0.0, Long.MinValue, Long.MinValue))
          it.foreach { e =>
            val us = e.ts.getTime * 1000L
            val wk = us - java.lang.Math.floorMod(us, weekUs)
            // a week that already finalized cannot be amended (append
            // mode): drop racers, same contract as msprtMonitor
            if (wk > st.lastFinalUs) {
              val hour = java.lang.Math.floorDiv(us, 3600000000L)
              val on = (hour + e.user_id % 10) % 2 == 0
              val vMicro = java.lang.Math.round(e.value * 1e6)
              val cur = st.open.find(_.dayUs == wk).getOrElse(
                DayMoments(wk, 0L, 0L, 0.0, 0L, 0L, 0.0))
              val upd =
                if (on) cur.copy(n1 = cur.n1 + 1, s1Micro = cur.s1Micro + vMicro,
                  ss1 = cur.ss1 + e.value * e.value)
                else cur.copy(n2 = cur.n2 + 1, s2Micro = cur.s2Micro + vMicro,
                  ss2 = cur.ss2 + e.value * e.value)
              st = st.copy(open = upd :: st.open.filterNot(_.dayUs == wk))
            }
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (done, open) = st.open.partition(_.dayUs + weekUs <= wmUs)
          val out = done.sortBy(_.dayUs).flatMap { wkm =>
            val first = if (st.firstWeekUs == Long.MinValue) wkm.dayUs else st.firstWeekUs
            st = st.copy(
              cumN1 = st.cumN1 + wkm.n1, cumS1Micro = st.cumS1Micro + wkm.s1Micro,
              cumSs1 = st.cumSs1 + wkm.ss1,
              cumN2 = st.cumN2 + wkm.n2, cumS2Micro = st.cumS2Micro + wkm.s2Micro,
              cumSs2 = st.cumSs2 + wkm.ss2,
              firstWeekUs = first, lastFinalUs = wkm.dayUs)
            val k = (wkm.dayUs - first) / weekUs + 1
            if (k <= 4 && st.cumN1 > 1 && st.cumN2 > 1) {
              val n1 = st.cumN1.toDouble; val n2 = st.cumN2.toDouble
              val s1 = st.cumS1Micro / 1e6; val s2 = st.cumS2Micro / 1e6
              val v1 = (st.cumSs1 - s1 * s1 / n1) / (n1 - 1.0) / n1
              val v2 = (st.cumSs2 - s2 * s2 / n2) / (n2 - 1.0) / n2
              val z = (s1 / n1 - s2 / n2) / math.sqrt(v1 + v2)
              val bound = 2.024 * math.sqrt(4.0 / k)
              Some(GstReadout(eventType, new java.sql.Timestamp(wkm.dayUs / 1000L),
                k, st.cumN1, st.cumN2, st.cumS1Micro, st.cumS2Micro,
                z, bound, math.abs(z) > bound))
            } else None
          }
          st = st.copy(open = open)
          state.update(st)
          open.map(_.dayUs + weekUs).sorted.headOption
            .foreach(us => state.setTimeoutTimestamp(us / 1000L))
          out.iterator
      }
  }

  /** Live CUSUM change-point monitor — the streaming twin of
    * TimeSeries.cusum: per event_type, each finalized day contributes
    * (daily_mean − refMean) to a running cumulative sum, and the day's
    * readout flags |cusum| > h — the classic tabular-CUSUM drift alarm
    * (a level shift in the KPI accumulates linearly in the statistic,
    * so a persistent break pages within days of onset, long before the
    * batch change-point pass re-runs). refMean/h come from the caller
    * — in production the batch q_cusum run over the frozen reference
    * period defines "normal", the stream patrols it (the psiMonitor
    * contract).
    *
    * Chop-invariance (msprtMonitor discipline): per-day value sums
    * accumulate as micro-scaled longs (exact, order-invariant), days
    * finalize in event-time order as the watermark crosses each
    * boundary, and the cumulative sum folds finalized daily means in
    * that deterministic order — so emitted rows are byte-identical
    * under any micro-batch chop. State per key: open day buckets
    * (watermark-bounded) + two scalars. */
  def cusumMonitor(events: Dataset[Event], refMean: Double, h: Double): Dataset[CusumReadout] = {
    import events.sparkSession.implicits._
    val dayUsLen = 86400000000L
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, CusumReadout](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (eventType: String, it: Iterator[Event], state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(Nil, 0.0, Long.MinValue))
          it.foreach { e =>
            val us = e.ts.getTime * 1000L
            val day = us - java.lang.Math.floorMod(us, dayUsLen)
            // append mode cannot retract an emitted readout: drop
            // events racing the watermark into a finalized day
            if (day > st.lastFinalUs) {
              val vMicro = java.lang.Math.round(e.value * 1e6)
              val cur = st.open.find(_.dayUs == day).getOrElse(DaySum(day, 0L, 0L))
              val upd = cur.copy(n = cur.n + 1, sMicro = cur.sMicro + vMicro)
              st = st.copy(open = upd :: st.open.filterNot(_.dayUs == day))
            }
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (done, open) = st.open.partition(_.dayUs + dayUsLen <= wmUs)
          val out = done.sortBy(_.dayUs).flatMap { d =>
            if (d.n > 0) {
              val mean = d.sMicro / 1e6 / d.n
              st = st.copy(cum = st.cum + (mean - refMean), lastFinalUs = d.dayUs)
              Some(CusumReadout(eventType, new java.sql.Timestamp(d.dayUs / 1000L),
                d.n, mean, st.cum, math.abs(st.cum) > h))
            } else { st = st.copy(lastFinalUs = d.dayUs); None }
          }
          st = st.copy(open = open)
          state.update(st)
          open.map(_.dayUs + dayUsLen).sorted.headOption
            .foreach(us => state.setTimeoutTimestamp(us / 1000L))
          out.iterator
      }
  }

  /** Gap-based sessionization with explicit state
    * (flatMapGroupsWithState): emits a ClosedSession whenever a user is
    * silent for `gapMinutes` (streaming twin of TimeSeries.sessionize). */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          def toUs(t: java.sql.Timestamp): Long = t.getTime * 1000L
          def close(s: SessionState): ClosedSession = ClosedSession(
            userId, new java.sql.Timestamp(s.startUs / 1000L),
            new java.sql.Timestamp(s.lastUs / 1000L), s.n, s.sum)

          if (state.hasTimedOut) {
            val out = state.getOption.map(close).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (toUs(e.ts), e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { e =>
              val us = toUs(e.ts)
              cur match {
                case Some(s) if us - s.lastUs <= gapUs =>
                  // min/max, not assignment: a LATE in-gap event from a
                  // later micro-batch must never move the session end
                  // BACKWARDS (or the start forwards) - a regressed
                  // lastUs would let a later event fake a >gap silence
                  // and split a session that never had one
                  cur = Some(s.copy(startUs = math.min(s.startUs, us),
                    lastUs = math.max(s.lastUs, us),
                    n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed += close(s)
                  cur = Some(SessionState(us, us, 1, e.value))
                case None =>
                  cur = Some(SessionState(us, us, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapMinutes * 60L * 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
