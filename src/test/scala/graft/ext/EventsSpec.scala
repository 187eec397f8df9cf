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

  test("range join: exclusive end, bucket-straddling events, many-to-many") {
    import org.apache.spark.sql.functions._
    val H = Events.RangeHalfUs
    // RangeWindows(20) > 7 rows, so every event anchors a window; the
    // assertions pin windows A(id 1, t=0) and B(id 2, t=+30min), which
    // overlap so one event lands in both (many-to-many)
    val ev = Seq(
      (1L, 10L, 100.0, 0L),          // anchor A at t=0
      (2L, 11L, 99.0, H),            // anchor B at t=+30min (windows overlap)
      (3L, 12L, 0.0, H - 1),         // in A [−H,H) and B [0,2H) — both
      (4L, 13L, 0.0, H),             // == A's exclusive end: B only
      (5L, 14L, 0.0, -H),            // == A's inclusive start: A only
      (6L, 15L, 0.0, 2 * H),         // == B's exclusive end: neither
      (7L, 10L, 0.0, 1L)             // same user as anchor A: n_users dedup
    ).toDF("event_id", "user_id", "value", "us")
    val got = Events.rangeJoinOn(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // window A [-H, H): events 1,3,5,7 (2 and 4 sit AT the exclusive
    // end, 6 beyond); users {10,12,14,10} -> 3 distinct
    assert(got(1L) == (4L, 3L), s"window A got ${got(1L)}")
    // window B [0, 2H): events 1,2,3,4,7 (6 at the exclusive end, 5
    // before start); users {10,11,12,13,10} -> 4 distinct
    assert(got(2L) == (5L, 4L), s"window B got ${got(2L)}")
    assert(!got.values.exists(_._1 == 0L), "no empty windows emitted")
  }

  test("as-of semantics: at-or-before click wins, later clicks ignored") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // user 1: click@10:00, view@10:05 (-> click 100), click@10:10 (later,
    // ignored), view@10:10 w/ same-ts click (-> click 101), user 2: no click
    val ev = Seq(
      (100L, 1L, "click", ts("2024-01-01 10:00:00")),
      (200L, 1L, "view", ts("2024-01-01 10:05:00")),
      (101L, 1L, "click", ts("2024-01-01 10:10:00")),
      (201L, 1L, "view", ts("2024-01-01 10:10:00")),
      (202L, 2L, "view", ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    val tagged = clicks
      .select(col("user_id"), col("ts"), lit(0).as("tag"),
        col("click_id"), lit(null).cast("long").as("view_id"))
      .union(views.select(col("user_id"), col("ts"), lit(1).as("tag"),
        lit(null).cast("long").as("click_id"), col("view_id")))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = tagged
      .withColumn("asof", last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("view_id").isNotNull)
      .collect().map(r => r.getAs[Long]("view_id") ->
        Option(r.getAs[java.lang.Long]("asof"))).toMap
    assert(got(200L).contains(100L), "prior click must attach")
    assert(got(201L).contains(101L), "same-timestamp click counts as at-or-before")
    assert(got(202L).isEmpty, "no click for user 2 -> null")
  }

  test("cogroup as-of join is row-equal to the window formulation") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[java.lang.Long](2)))).toSet
    val a = key(Events.asofJoin(spark, sf001))
    val b = key(Events.asofJoinCogroup(spark, sf001))
    assert(a == b, s"drift: ${(a diff b).take(3)} vs ${(b diff a).take(3)}")
  }
}
