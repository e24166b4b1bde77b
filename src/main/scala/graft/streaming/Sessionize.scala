package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization of an event stream — the canonical
  * `flatMapGroupsWithState` custom-state operator (SURVEY §2.9 /
  * builder mandate), with an equivalent batch formulation that a SQL
  * oracle can check.
  *
  * A session = maximal run of a user's events where consecutive gaps
  * are ≤ `gap`. Batch form: lag + conditional cumulative sum (two
  * window passes over one shuffle by user). Streaming form: per-key
  * state holding the open session, emitting it when the gap passes or
  * the watermark times the key out.
  */
object Sessionize {

  final case class Event(user_id: Long, event_id: Long, ts: Timestamp,
                         value: Double)
  final case class SessionState(startTs: Long, lastTs: Long, n: Int,
                                total: Double, firstEvent: Long)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long,
                           total_value: Double)

  /** Per-event session assignment (deterministic (ts, event_id)
    * ordering): the input rows plus a per-user `session_seq`.
    * [[batch]] aggregates this; path/funnel analyses group over it. */
  def assign(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("_prev", lag(col("ts"), 1).over(byUser))
      // µs-integer gap compare: exact and identical to DuckDB epoch_us
      .withColumn("_new",
        when(col("_prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("_prev")) >
            gapMinutes * 60L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("_new")).over(byUser))
      .drop("_prev", "_new")
  }

  /** Batch sessionization: deterministic ordering by (ts, event_id). */
  def batch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val withGap = assign(events, gapMinutes)
    withGap.groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .drop("session_seq")
  }

  // µs precision end-to-end: java.sql.Timestamp.getTime is ms-truncated
  private def toMicros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000L
  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos((us % 1000000L * 1000L).toInt)
    t
  }

  /** Streaming sessionization over a (possibly unordered-within-batch)
    * stream. Events are sorted inside each group iterator; state spans
    * micro-batches and a processing-time timeout flushes idle keys.
    * Emits CLOSED sessions; the final open session per key flushes on
    * timeout (or never, for an infinite stream — exactly the semantics
    * a downstream latest-state merge expects). */
  def streaming(events: Dataset[Event], gapMinutes: Int,
                timeoutMs: Option[Long] = None): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    val gapUs = gapMinutes * 60L * 1000000L
    val timeoutConf =
      if (timeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeoutConf) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s => close(userId, s)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = it.toArray.sortBy(e => (toMicros(e.ts), e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = toMicros(e.ts)
              cur match {
                case Some(s) if t - s.lastTs <= gapUs =>
                  cur = Some(s.copy(lastTs = math.max(s.lastTs, t),
                    n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed += close(userId, s)
                  cur = Some(SessionState(t, t, 1, e.value, e.event_id))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value, e.event_id))
              }
            }
            cur.foreach(state.update)
            timeoutMs.foreach(state.setTimeoutDuration)
            closed.result().iterator
          }
      }
  }

  /** Event-time variant of [[streaming]]: idle keys flush when the
    * WATERMARK passes `session end + gap`, so the output is identical
    * on replay at any processing speed — the reprocessing-correct form
    * (the processing-time timeout flushes on wall-clock, which differs
    * between live and catch-up runs). The input stream must carry a
    * watermark on `ts` (`withWatermark`) or Spark rejects the
    * EventTimeTimeout at analysis. */
  def streamingEventTime(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    val gapUs = gapMinutes * 60L * 1000000L

    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s => close(userId, s)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = it.toArray.sortBy(e => (toMicros(e.ts), e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = toMicros(e.ts)
              cur match {
                case Some(s) if t - s.lastTs <= gapUs =>
                  cur = Some(s.copy(lastTs = math.max(s.lastTs, t),
                    n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed += close(userId, s)
                  cur = Some(SessionState(t, t, 1, e.value, e.event_id))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value, e.event_id))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // flush once the watermark passes the gap horizon; the
              // timestamp must sit strictly beyond the current watermark
              state.setTimeoutTimestamp(math.max((s.lastTs + gapUs) / 1000L,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  private def close(userId: Long, s: SessionState): Session =
    Session(userId, fromMicros(s.startTs), fromMicros(s.lastTs), s.n, s.total)
}
