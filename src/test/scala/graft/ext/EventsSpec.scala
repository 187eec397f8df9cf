package graft.ext

import graft.SparkSpec
import java.sql.Timestamp

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("session_window splits on >= 30 minute gaps") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")),
      (1L, ts("2024-01-01 10:50:00")), // 40min gap -> new session
      (2L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "ts")
    import org.apache.spark.sql.functions._
    val sess = ev.groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .count().collect()
    assert(sess.count(_.getLong(0) == 1L) == 2, "user 1 must have 2 sessions")
    assert(sess.count(_.getLong(0) == 2L) == 1)
  }

  test("tumbling windows cover every event exactly once") {
    val total = Events.tumbling(spark, sf001).agg(
      org.apache.spark.sql.functions.sum("n_events")).head.getLong(0)
    val raw = Events.loadEvents(spark, sf001).count()
    assert(total == raw)
  }

  test("sliding windows count each event size/slide times") {
    val total = Events.sliding(spark, sf001).agg(
      org.apache.spark.sql.functions.sum("n_events")).head.getLong(0)
    val raw = Events.loadEvents(spark, sf001).count()
    assert(total == raw * 4, "1h window / 15min slide = 4 windows per event")
  }

  test("props rollup parses JSON with an explicit schema, no inference") {
    val res = Events.propsRollup(spark, sf001).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      val n = r.getLong(1)
      val sumK = r.getLong(2)
      val avg = r.getDouble(3)
      assert(avg == sumK.toDouble / n, "avg must equal sum/count exactly")
      assert(r.getInt(4) <= r.getInt(5), "min <= max")
    }
    // malformed JSON must null out, not throw (coerce semantics)
    import org.apache.spark.sql.functions._
    val bad = Seq(("a", "{not json")).toDF("event_type", "props")
      .select(from_json(col("props"), lit("k INT")).getField("k").as("k"))
      .collect()
    assert(bad(0).isNullAt(0), "malformed props must parse to null")
  }
}
