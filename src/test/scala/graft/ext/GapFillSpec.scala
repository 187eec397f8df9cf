package graft.ext

import graft.SparkSpec

class GapFillSpec extends SparkSpec {

  test("gap fill: dense calendar, LOCF values, correct gap ages") {
    val rows = Events.gapFill(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getBoolean(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val gmax = rows.map(_._2).max
    rows.groupBy(_._1).foreach { case (uid, series) =>
      val sorted = series.sortBy(_._2.toEpochDay)
      // dense: consecutive days, first is observed, runs to global max
      assert(sorted.head._3, s"user $uid first grid day must be observed")
      assert(sorted.last._2 == gmax, s"user $uid grid must reach $gmax")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2.toEpochDay == a._2.toEpochDay + 1,
            s"user $uid gap between ${a._2} and ${b._2}")
        case _ =>
      }
      // LOCF: value changes only on observed days; gap_age counts since
      // the last observed day
      var lastVal = Double.NaN
      var lastObs = sorted.head._2
      sorted.foreach { case (_, d, obs, v, age) =>
        if (obs) { lastVal = v; lastObs = d }
        else assert(v == lastVal, s"user $uid $d LOCF broke: $v vs $lastVal")
        assert(age == d.toEpochDay - lastObs.toEpochDay,
          s"user $uid $d gap_age $age")
      }
    }
    // every user appears
    assert(rows.map(_._1).distinct.length ==
      Events.loadEvents(spark, sf001).select("user_id").distinct.count())
  }
}
