package graft

/** The round-6 bench hardening: a one-off environment stall must not
  * survive as a query's published time (BENCH_r05 recorded 99.8s for a
  * query that reproducibly runs in 1.4s because the repCap skip left a
  * stalled first run unchallenged). */
class BenchSpec extends SparkSpec {

  private val instant =
    (s: org.apache.spark.sql.SparkSession, _: String) => s.range(1).toDF()

  test("steadyTimes loads the SCALING side matching the sfDir") {
    val small = Bench.steadyTimes("/root/testdata/sf0.01")
    val big = Bench.steadyTimes("/root/testdata/sf0.1")
    assert(small.nonEmpty && big.nonEmpty,
      "SCALING.json must resolve both of its recorded sides")
    assert(small.keySet == big.keySet)
    assert(Bench.steadyTimes("/no/such/dir").isEmpty)
  }

  test("retryOutliers re-measures a query recorded far above steady") {
    val (fixed, flagged) = Bench.retryOutliers(spark, sf001,
      Map("stalled" -> instant, "fine" -> instant),
      Map("stalled" -> 99.9, "fine" -> 0.4),
      repCap = 60.0,
      steady = Map("stalled" -> 1.4, "fine" -> 0.5))
    assert(flagged.keySet == Set("stalled"), "only the outlier retries")
    assert(flagged("stalled") == 99.9, "raw value preserved for the report")
    assert(fixed("stalled") < 99.9, "retry must replace the stalled record")
    assert(fixed("fine") == 0.4, "in-range queries keep their first-pass min")
  }

  test("retryOutliers retries a >=repCap run even with no steady reference") {
    val (fixed, flagged) = Bench.retryOutliers(spark, sf001,
      Map("newq" -> instant, "newq2" -> instant),
      Map("newq" -> 75.0, "newq2" -> 3.0),
      repCap = 60.0, steady = Map.empty)
    assert(flagged.keySet == Set("newq"),
      "no-reference queries flag only at the repCap rule")
    assert(fixed("newq") < 75.0)
    assert(fixed("newq2") == 3.0)
  }

  test("retryOutliers keeps the min when the retry itself stalls") {
    val slow =
      (s: org.apache.spark.sql.SparkSession, _: String) => {
        Thread.sleep(1500); s.range(1).toDF()
      }
    val (fixed, _) = Bench.retryOutliers(spark, sf001,
      Map("q" -> slow), Map("q" -> 1.1), repCap = 60.0,
      steady = Map("q" -> 0.05))
    assert(fixed("q") == 1.1, "a slower retry must never worsen the record")
  }
}
