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

/** Structured Streaming twins of the batch operators (SURVEY.md §2
  * block D): the same switchback aggregations the reference computes
  * daily, expressed incrementally.
  *
  * Scale: state is keyed by (window×type) or user — partitioned across
  * executors by the shuffle on the grouping key; watermarks bound state
  * size; output is append-mode so sinks see only finalized windows.
  */
object EventStream {

  /** Tumbling 1-hour per-event_type KPI aggregation with a 2-hour
    * watermark — the streaming twin of TimeSeries.windowTumbling. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
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
      .agg(count(lit(1)).as("n"), avg("value").as("value_per_order"))

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

  /** Streaming exact dedup — drops re-deliveries of the same event_id
    * inside the watermark horizon (the streaming twin of
    * operators.Dedup.dedupExact; state is bounded by the watermark). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

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
                  cur = Some(s.copy(lastUs = us, n = s.n + 1, sum = s.sum + e.value))
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
