package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** True streaming semantics: watermark-driven late-data drop across
  * micro-batches, driven through MemoryStream (the file replay in
  * StreamJobsSpec can't exercise multi-batch lateness). */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("append-mode window agg drops data later than the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val agg = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("k"))
      .count()
      .select(col("w.start").as("ws"), col("k"), col("count"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("wm_test").start()

    // batch 1: two events in the 10:00 window
    mem.addData((ts("2024-01-01 10:01:00"), "a"), (ts("2024-01-01 10:05:00"), "a"))
    q.processAllAvailable()
    // batch 2: event time jumps far ahead -> watermark passes 10:10,
    // the 10:00 window closes and is emitted
    mem.addData((ts("2024-01-01 11:00:00"), "a"))
    q.processAllAvailable()
    // batch 3: a LATE event for the closed 10:00 window -> dropped
    mem.addData((ts("2024-01-01 10:02:00"), "a"))
    q.processAllAvailable()
    // batch 4: advance again so nothing else is pending
    mem.addData((ts("2024-01-01 12:00:00"), "a"))
    q.processAllAvailable()
    q.stop()

    val closed = spark.table("wm_test")
      .filter(col("ws") === ts("2024-01-01 10:00:00")).collect()
    assert(closed.length == 1)
    assert(closed.head.getAs[Long]("count") == 2,
      "the late third event must NOT be counted in the closed window")
  }

  test("streaming dedup drops repeats within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val deduped = StreamJobs.dedupEvents(
      mem.toDF().toDF("event_id", "ts"))
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_test").start()

    mem.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:01:00")))
    q.processAllAvailable()
    // same ids again in a later micro-batch, still inside the watermark
    mem.addData((1L, ts("2024-01-01 10:05:00")), (3L, ts("2024-01-01 10:06:00")))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_test").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L),
      s"repeat of id 1 must be dropped, got ${ids.mkString(",")}")
  }
}
