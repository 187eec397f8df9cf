package graft.streaming

import graft.SparkSpec
import graft.ext.Events
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamJobsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly counts equal the batch tumbling aggregation") {
    // the file stream source watches directories, so stage the fixture
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = StreamJobs.readEvents(spark, dir.toString)
    assert(stream.isStreaming)
    // Complete mode: with Append, windows above the watermark would still
    // be open when the bounded replay ends and never reach the sink
    val got = StreamJobs.runToMemory(
      StreamJobs.hourlyCounts(stream), "hourly_test", OutputMode.Complete())
      .select(col("window_start"), col("event_type"), col("n_events"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    val want = Events.tumbling(spark, sf001)
      .select(col("window_start"), col("event_type"), col("n_events"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == want, s"stream/batch drift: ${(got diff want).take(3)} vs ${(want diff got).take(3)}")
  }

  test("flatMapGroupsWithState sessionization matches session_window totals") {
    val ev = Events.loadEvents(spark, sf001)
      .select(col("user_id"), col("ts")).as[StreamJobs.Event]
    val sessions = StreamJobs.sessionize(ev).collect()
    val batch = Events.sessions(spark, sf001).collect()
    assert(sessions.length == batch.length,
      s"session count drift: state=${sessions.length} window=${batch.length}")
    val gotTotal = sessions.map(_.n_events.toLong).sum
    val wantTotal = batch.map(_.getAs[Long]("n_events")).sum
    assert(gotTotal == wantTotal)
  }
}
