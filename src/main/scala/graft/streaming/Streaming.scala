package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the events stream shape
  * (event_id, ts, user_id, event_type, value, props).
  */
object Streaming {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  /** Open-session state carried across micro-batches: constant-size
    * aggregates, never the raw events.
    */
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long, total: Double)

  private def close(uid: Long, o: OpenSession): Session =
    Session(uid, new Timestamp(o.startMs), new Timestamp(o.lastMs), o.n, o.total)

  private def fold(uid: Long, sorted: Seq[Event], prior: Option[OpenSession],
      gapSec: Long): (Vector[Session], Option[OpenSession]) = {
    val out = Vector.newBuilder[Session]
    var open = prior
    sorted.foreach { e =>
      val t = e.ts.getTime
      open = open match {
        case Some(o) if t - o.lastMs > gapSec * 1000L =>
          out += close(uid, o)
          Some(OpenSession(t, t, 1L, e.value))
        case Some(o) =>
          Some(o.copy(lastMs = math.max(o.lastMs, t), n = o.n + 1, total = o.total + e.value))
        case None =>
          Some(OpenSession(t, t, 1L, e.value))
      }
    }
    (out.result(), open)
  }

  /** Batch sessionization: every session (including the final one per user)
    * is emitted — a plain per-group fold, no state machinery.
    */
  def sessionize(events: Dataset[Event], gapSec: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (uid, evs) =>
      val sorted = evs.toVector.sortBy(e => (e.ts.getTime, e.event_id))
      val (closed, open) = fold(uid, sorted, None, gapSec)
      (closed ++ open.map(close(uid, _))).iterator
    }
  }

  /** Streaming sessionization with custom state
    * (flatMapGroupsWithState, Append): a session is emitted exactly once —
    * either when a later event proves it closed (gap exceeded), or when the
    * event-time watermark passes the session's gap deadline (EventTimeTimeout)
    * for a user who went idle. State is therefore bounded: an open session
    * lives at most `gapSec` of event time past its last event, then is
    * emitted and REMOVED — no unbounded state growth on a long-running
    * stream. The open tail lives in constant-size checkpointed state, so the
    * stream resumes sessions across restarts. Assumes per-user event-time
    * arrives in order across batches (events later than the watermark are
    * dropped by the watermark, as usual for stateful streaming).
    *
    * @param watermark event-time watermark duration (e.g. "10 seconds") —
    *        required by EventTimeTimeout; bounds how late events may arrive.
    */
  def sessionizeStream(events: Dataset[Event], gapSec: Long,
      watermark: String = "10 seconds"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, evs: Iterator[Event], state: GroupState[OpenSession]) =>
          if (!evs.hasNext && state.hasTimedOut) {
            // watermark passed lastMs + gap with no new events: the open
            // session is provably closed — emit it and drop the state
            val out = state.getOption.map(close(uid, _)).iterator
            state.remove()
            out
          } else {
            val sorted = evs.toVector.sortBy(e => (e.ts.getTime, e.event_id))
            val (closed, open) = fold(uid, sorted, state.getOption, gapSec)
            open match {
              case Some(o) =>
                state.update(o)
                // fire when event-time watermark passes the gap deadline;
                // must be strictly beyond the current watermark or Spark
                // throws — max() guards sessions already older than it
                val deadline = o.lastMs + gapSec * 1000L
                state.setTimeoutTimestamp(
                  math.max(deadline, state.getCurrentWatermarkMs() + 1L))
              case None => if (state.exists) state.remove()
            }
            closed.iterator
          }
      }
  }

  /** End-to-end streaming sessionization job over an events parquet table —
    * the driver-gate surface for [[sessionizeStream]]: readStream →
    * flatMapGroupsWithState → foreachBatch append to parquet, run to
    * completion with Trigger.AvailableNow, then the closed sessions are read
    * back. Deterministic and equal to batch gaps-and-islands sessionization
    * because one SENTINEL event per user is appended a full gap past the
    * global max event time: when the stream drains, every real session has
    * been proven closed by a later event and emitted exactly once; the
    * sentinel's own singleton session stays open in state and is discarded
    * with the stream (and filtered by `session_start <= max real ts` for
    * belt-and-braces). This is how a production run closes the books on a
    * bounded replay without weakening the streaming semantics.
    *
    * Returns (user_id, start_ms, end_ms, n_events) with epoch-millisecond
    * longs — integer-exact columns only, so the result is oracle-comparable
    * (float sums stay out of the gate).
    */
  def sessionizeParquetJob(spark: org.apache.spark.sql.SparkSession,
      eventsPath: String, workDir: String, gapSec: Long): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val prepDir = s"$workDir/input"
    val outDir = s"$workDir/sessions"
    val ckDir = s"$workDir/ckpt"
    val fs = new org.apache.hadoop.fs.Path(workDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(workDir), true)

    // the parquet ts column is TIMESTAMP_NTZ; the session runs UTC, so the
    // cast to (ltz) TIMESTAMP — what the Event encoder and unix_millis
    // expect — is lossless
    val events = spark.read.parquet(eventsPath)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val maxTsMs = events.agg(max(unix_millis(col("ts")))).as[Long].head()
    // sentinel strictly more than gap + watermark past every real event
    val sentinelMs = maxTsMs + gapSec * 1000L + 60000L
    val sentinels = events.select(col("user_id")).distinct()
      .select(lit(-1L).as("event_id"), timestamp_millis(lit(sentinelMs)).as("ts"),
        col("user_id"), lit("__sentinel").as("event_type"), lit(0.0).as("value"))
    events.unionByName(sentinels).write.parquet(prepDir)

    // one micro-batch for the whole prep dir: FileStreamSource's default
    // maxFilesPerTrigger (1000) would split a >1000-file prep dir into
    // several batches with no event-time ordering — if the sentinel file
    // landed in an early batch the watermark would advance past every real
    // event and later batches would be silently dropped
    val stream = spark.readStream
      .option("maxFilesPerTrigger", Int.MaxValue)
      .schema(events.schema).parquet(prepDir).as[Event]
    val q = sessionizeStream(stream, gapSec)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Session], _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()

    spark.read.parquet(outDir)
      .where(unix_millis(col("session_start")) <= maxTsMs) // drop sentinel-born sessions
      .select(col("user_id"),
        unix_millis(col("session_start")).as("start_ms"),
        unix_millis(col("session_end")).as("end_ms"),
        col("n_events"))
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

  /** End-to-end streaming windowed aggregation over an events parquet table
    * — the driver-gate surface for [[windowedCounts]] in the BOUNDED-STATE
    * shape (append output + watermark eviction + foreachBatch parquet — the
    * same plan a production stream runs forever on): a window's row is
    * emitted exactly once, when the event-time watermark passes its end, and
    * its state is evicted. Complete-mode/memory-sink (the previous gate
    * shape) would instead accumulate every window ever seen in driver
    * memory. Like [[sessionizeParquetJob]], a single sentinel event past
    * `max ts + windowDur + watermark` proves every real window closed inside
    * the AvailableNow drain; the sentinel's own window is filtered on
    * read-back.
    *
    * Returns (hour_sec, event_type, n) — integer-exact columns only, so the
    * result is oracle-comparable (float sums stay out of the gate; the batch
    * path q14 gates decimal sums).
    */
  def windowedCountsParquetJob(spark: org.apache.spark.sql.SparkSession,
      eventsPath: String, workDir: String,
      windowDur: String = "1 hour", watermark: String = "10 seconds",
      sentinelLeadMs: Long = 3600000L + 10000L + 60000L): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val prepDir = s"$workDir/input"
    val outDir = s"$workDir/windows"
    val ckDir = s"$workDir/ckpt"
    val fs = new org.apache.hadoop.fs.Path(workDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(workDir), true)

    import spark.implicits._
    val events = spark.read.parquet(eventsPath)
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"), col("value"))
    val maxTsMs = events.agg(max(unix_millis(col("ts")))).as[Long].head()
    val sentinel = spark.range(1).select(
      timestamp_millis(lit(maxTsMs + sentinelLeadMs)).as("ts"),
      lit("__sentinel").as("event_type"), lit(0.0).as("value"))
    events.unionByName(sentinel).write.parquet(prepDir)

    val stream = spark.readStream
      .option("maxFilesPerTrigger", Int.MaxValue) // single batch — see sessionizeParquetJob
      .schema(events.schema).parquet(prepDir)
    val q = windowedCounts(stream, windowDur, watermark)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()

    spark.read.parquet(outDir)
      .where(col("event_type") =!= "__sentinel" &&
        unix_millis(col("window_start")) <= maxTsMs)
      .select(unix_timestamp(col("window_start")).as("hour_sec"),
        col("event_type"), col("n"))
  }
}
