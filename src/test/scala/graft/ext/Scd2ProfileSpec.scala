package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for SCD2 history build (q75) and the table profiler (q76). */
class Scd2ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("scd2: versions are dense, intervals chain, one open per user") {
    val rows = Events.scd2History(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (uid, vs) =>
      val sorted = vs.sortBy(_._2)
      // dense version numbering from 1
      assert(sorted.map(_._2).toSeq == (1L to sorted.length))
      // exactly one open (current) version, and it is the last
      assert(sorted.count(_._6) == 1 && sorted.last._6,
        s"user $uid must have exactly one current version")
      // each valid_to equals the next version's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4),
            s"user $uid v${a._2} valid_to must chain to v${b._2}")
          // consecutive versions must actually change the attribute
          assert(a._3 != b._3, s"user $uid v${a._2}->${b._2} same type")
        case _ =>
      }
    }
  }

  test("scd2 on a hand-built change stream") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "view", 0.0, "{}"),
      (2L, ts("2024-01-01 01:00:00"), 7L, "view", 0.0, "{}"),
      (3L, ts("2024-01-01 02:00:00"), 7L, "click", 0.0, "{}"),
      (4L, ts("2024-01-01 03:00:00"), 7L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val got = ev
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(w))
      .collect().map(r => (r.getAs[Int]("version"), r.getAs[String]("event_type")))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1, "view"), (2, "click"), (3, "view")),
      s"run-length collapse wrong: ${got.toSeq}")
  }

  test("profiler counts nulls and distincts on a poisoned frame") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None),
      (Some(2L), Some("b")), (None, Some("b"))
    ).toDF("k", "s")
    val wide = df.agg(count(lit(1)).as("n"),
      count(col("k")).as("k_nn"), count_distinct(col("k")).as("k_nd"),
      count(col("s")).as("s_nn"), count_distinct(col("s")).as("s_nd"))
      .collect().head
    assert(wide.getLong(0) - wide.getLong(1) == 1) // one null k
    assert(wide.getLong(2) == 2)                   // distinct k
    assert(wide.getLong(0) - wide.getLong(3) == 1) // one null s
    assert(wide.getLong(4) == 2)                   // distinct s
    // fixture: one row per profiled column, min <= max as strings
    val fix = graft.queries.Etl.profile(spark, sf001).collect()
    assert(fix.map(_.getString(0)).toSeq ==
      graft.queries.Etl.ProfileCols.sorted)
    fix.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(2) > 0))
  }
}
