package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming aggregation surface (SURVEY §2.B `s_*` family): the R12
  * dashboard queries expressed over an unbounded stream, plus the standard
  * Structured Streaming state operators the reference's at-least-once pipeline
  * implies (watermarked windows, stream dedup).
  *
  * Each op takes a (possibly streaming) DataFrame with an event-time column
  * and returns the transformed frame; identical code serves batch replays, so
  * the test suite asserts batch/stream result parity (SURVEY §5.2).
  *
  * Scale: all state is keyed by (window, key) and bounded by the watermark —
  * state store size is O(active windows × keys), independent of stream length.
  */
object StreamOps {

  /** R12: tumbling-window count — the Grafana `$timeSeries` query
    * (`/root/reference/README.md:279-286`) with late-data bound.
    */
  def tumblingCounts(events: DataFrame, tsCol: String = "ts",
                     window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_).as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("t"), col("cnt"))

  /** Sliding-window count — R12's dashboard series at a finer refresh than
    * its bucket width (each event lands in window/slide overlapping
    * windows; state is keyed by window start, bounded by the watermark).
    */
  def slidingCounts(events: DataFrame, tsCol: String = "ts",
                    window_ : String = "1 hour", slide: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_, slide).as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("t"), col("cnt"))

  /** Sliding-window sum of a metric (bytes-served analog). */
  def slidingSum(events: DataFrame, valueCol: String, tsCol: String = "ts",
                 window_ : String = "1 hour", slide: String = "15 minutes",
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_, slide).as("w"))
      .agg(round(sum(col(valueCol)), 4).as("total"))
      .select(col("w.start").as("t"), col("total"))

  /** Session windows per key (gap-based) — user-session analytics over the
    * log stream.
    */
  def sessionCounts(events: DataFrame, keyCol: String, tsCol: String = "ts",
                    gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col(keyCol), col("cnt"))

  /** Streaming exact dedup by key within the watermark horizon — the
    * at-least-once upgrade the reference never had (SURVEY §2.A absences:
    * "MergeTree doesn't dedup here").
    */
  def dedup(events: DataFrame, keyCols: Seq[String], tsCol: String = "ts",
            watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Stream-stream interval join: correlate two live streams on a key within
    * a bounded event-time window (e.g. errors within 30 minutes after a
    * purchase by the same user). Both sides carry watermarks and the join
    * condition bounds the time skew, so each side's buffered state is evicted
    * once the other side's watermark passes — state stays O(in-flight
    * interval), not O(stream).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String = "lts", rightTs: String = "rts",
                   interval: String = "30 minutes",
                   watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, l(key) === r(key) &&
      col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $interval"))
      .drop(r(key))
  }

  /** Custom per-key state (`flatMapGroupsWithState` + event-time timeout):
    * TRUE gap-based sessionization with arbitrary state logic — the escape
    * hatch for semantics `session_window` can't express (emitting only on
    * session close, carrying whole-session aggregates). Semantics match the
    * batch gap sessionizer exactly: event times compare in integer
    * MICROSECONDS, a batch whose rows span a > gap hole splits into multiple
    * sessions right there (closed ones emit immediately), and the one open
    * trailing session per key waits in state until the event-time watermark
    * passes `last + gap` (its timeout) — so state is ONE small record per
    * active key, bounded by concurrently-active keys regardless of stream
    * length. Disorder contract: events may arrive unsorted within a batch
    * (sorted in the handler) and late up to the watermark across batches;
    * a late event merges into the still-open session (closed sessions are
    * never revised — the same contract every watermarked operator has).
    */
  case class AsofState(p_us: Long, p_id: Long)
  case class AsofOut(e_id: Long, e_user: Long, p_id: Option[Long])

  /** Streaming AS-OF join via custom state: one merged stream of typed
    * events per key; a purchase updates the key's single latest-purchase
    * record, an error emits (error, latest purchase so far) immediately —
    * the streaming twin of `plans.AsOfJoin`, O(1) state per key instead of
    * buffered row sets.
    *
    * Correct when the stream is time-ordered ACROSS micro-batches (each
    * batch's rows all at-or-after the previous batch's — the chunked
    * replay guarantees it; a production feed gets it from log-structured
    * sources). WITHIN a batch, rows sort here: purchases before errors at
    * equal timestamps (`p_ts <= e_ts` includes equality), ids ascending so
    * the last same-timestamp purchase (max id) wins the tie — matching the
    * batch oracle's `ORDER BY p_ts DESC, p_id DESC ... rn = 1`. No
    * timeout: state is one record per key, bounded by key cardinality
    * (the exact-global dial, like streaming dedup).
    */
  def asofCustomState(events: org.apache.spark.sql.Dataset[
        (java.sql.Timestamp, Long, String, Long)],
      buildType: String = "purchase", probeType: String = "error")
      : org.apache.spark.sql.Dataset[AsofOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    def micros(t: java.sql.Timestamp): Long =
      (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    events.filter(r => r._3 == buildType || r._3 == probeType)
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(java.sql.Timestamp, Long, String, Long)],
         state: GroupState[AsofState]) =>
          val out = Seq.newBuilder[AsofOut]
          var cur = state.getOption
          // (ts, kind, id): build rows (kind 0) before probe rows (kind 1)
          // at the same timestamp; ascending ids make the last update the max
          rows.map(r => (micros(r._1), if (r._3 == probeType) 1 else 0, r._4))
            .toArray.sorted
            .foreach { case (us, kind, id) =>
              if (kind == 0) cur = Some(AsofState(us, id))
              else out += AsofOut(id, user, cur.map(_.p_id))
            }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  case class SessState(first_us: Long, last_us: Long, count: Long)
  case class SessionOut(user_id: Long, n_events: Long, first_us: Long,
                        last_us: Long)

  def sessionizeCustomState(events: org.apache.spark.sql.Dataset[
      (java.sql.Timestamp, Long)], gapMinutes: Int,
      watermark: String = "10 minutes"): org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    def micros(t: java.sql.Timestamp): Long =
      (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    events.toDF("ts", "user_id")
      .withWatermark("ts", watermark)
      .as[(java.sql.Timestamp, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(java.sql.Timestamp, Long)],
         state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.count, s.first_us, s.last_us))
          } else {
            val closed = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            rows.map(r => micros(r._1)).toArray.sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.last_us > gapUs =>
                  closed += SessionOut(user, s.count, s.first_us, s.last_us)
                  cur = Some(SessState(t, t, 1L))
                case Some(s) =>
                  cur = Some(SessState(math.min(s.first_us, t),
                    math.max(s.last_us, t), s.count + 1L))
                case None =>
                  cur = Some(SessState(t, t, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout is ms-grained; round UP so it never fires early
              state.setTimeoutTimestamp((s.last_us + gapUs) / 1000L + 1L)
            }
            closed.result().iterator
          }
      }
  }
}
