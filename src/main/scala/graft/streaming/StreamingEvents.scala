package graft.streaming

import graft.pipeline.EventQueries
import org.apache.spark.sql.DataFrame

/** Streaming face of the windowed event analytics (SURVEY.md §2.10):
  * the batch operators in [[graft.pipeline.EventQueries]] are written as
  * Structured-Streaming-shaped aggregations, and this wrapper runs the
  * SAME expression tree over an unbounded source with an event-time
  * watermark bounding the aggregation state.
  *
  * Semantics under append output: a window's row is emitted exactly
  * once, when the watermark (max observed event time − delay) passes
  * the window end — late events inside the delay are incorporated
  * before emission, later ones are dropped. State size is
  * O(open windows × group keys), independent of stream length — the
  * property that lets this run forever on a 100 TB/day event stream.
  */
object StreamingEvents {

  /** Event-time tumbling 1-hour aggregate over a streaming `events`
    * relation (needs `ts: timestamp`, `event_type`, `value` columns).
    * `delay` is the max accepted event-time lateness. */
  def tumblingStream(events: DataFrame, delay: String = "2 hours"): DataFrame =
    EventQueries.tumblingAgg(events.withWatermark("ts", delay))

  /** Per-user session windows (6-hour gap) over a streaming relation
    * (needs `ts: timestamp`, `user_id`, `value`). Session state merges
    * across micro-batches until the watermark passes last-event + gap,
    * then the session emits once (append). */
  def sessionStream(events: DataFrame, delay: String = "2 hours"): DataFrame =
    EventQueries.sessionAgg(events.withWatermark("ts", delay))
}
