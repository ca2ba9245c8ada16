package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming operators over the `events` stream shape
  * (`event_id, ts, user_id, event_type, value, props`) — the north-star
  * streaming slice (SURVEY §2.6): windowed aggregation under a watermark,
  * session windows, stream-static enrichment, and in-stream dedup.
  *
  * All operators take an unbounded DataFrame (from `readStream`) and
  * return a transformed unbounded DataFrame — sink choice (append mode +
  * `writeStream`) stays with the caller. State size at scale is bounded
  * by the watermark: expired windows/sessions/dedup keys are evicted, so
  * a 1000-executor job holds only the open-window working set.
  */
object Streams {

  /** Tumbling-window counts + sums per event_type, finalized by the
    * watermark (append-mode emittable). */
  def windowedCounts(events: DataFrame,
                     windowLen: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("cnt"), col("total"))

  /** Sliding-window moving aggregate (overlapping windows). */
  def slidingCounts(events: DataFrame,
                    windowLen: String = "10 minutes",
                    slide: String = "5 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"), col("cnt"))

  /** Per-user session windows: events gapped < `gap` merge into one
    * session; emits per-session event counts and value totals. */
  def sessionize(events: DataFrame,
                 gap: String = "30 minutes",
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("session"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total"))
      .select(col("session.start").as("session_start"),
        col("session.end").as("session_end"),
        col("user_id"), col("n_events"), col("total"))

  /** Stream-static enrichment: broadcast-join a small dimension onto the
    * stream (no state — per-batch hash join against the static side). */
  def enrich(events: DataFrame, dim: DataFrame, joinCol: String): DataFrame =
    events.join(broadcast(dim), joinCol)

  /** In-stream exact dedup on event_id, state bounded by the watermark
    * (late duplicates beyond it are already emitted — the at-least-once
    * to effectively-once compaction used in ingest pipelines). */
  def dedup(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}
