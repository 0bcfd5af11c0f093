package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streaming
import graft.streaming.Streaming.Event

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("gap sessionization splits on gaps > gap, aggregates per session") {
    val events = Seq(
      Event(1, ts(0), 1L, "click", 1.0),
      Event(2, ts(100), 1L, "click", 2.0),
      Event(3, ts(5000), 1L, "buy", 3.0), // new session (gap 4900 > 600)
      Event(4, ts(50), 2L, "click", 5.0)
    ).toDS()
    val sessions = Streaming.sessionize(events, gapSec = 600).collect()
      .map(s => (s.user_id, s.session_start.getTime / 1000, s.n_events, s.total_value)).toSet
    assert(sessions == Set((1L, 0L, 2L, 3.0), (1L, 5000L, 1L, 3.0), (2L, 50L, 1L, 5.0)))
  }

  test("streaming windowed aggregation over a file source (memory sink)") {
    val dir = tmpDir("graft-stream")
    val events = Seq(
      Event(1, ts(10), 1L, "click", 1.0),
      Event(2, ts(70), 1L, "click", 2.0),
      Event(3, ts(80), 2L, "buy", 4.0)
    ).toDS()
    events.write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val agg = Streaming.windowedCounts(stream, "1 minute", "2 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_counts")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val res = spark.table("win_counts")
      .select(unix_timestamp(col("window_start")).as("w"), col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(res == Set((0L, "click", 1L), (60L, "click", 1L), (60L, "buy", 1L)))
  }
}
