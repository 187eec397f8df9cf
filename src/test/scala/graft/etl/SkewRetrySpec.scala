package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewRetrySpec extends SparkSpec {

  test("salted join returns exactly the plain-join result") {
    val li = Tables.load(spark, sf001, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val ord = Tables.load(spark, sf001, "orders")
      .select("o_orderkey", "o_custkey")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val plain = canon(li.join(ord, Seq("l_orderkey")))
    val salted = canon(Skew.saltedJoin(li, ord, "l_orderkey", 8))
    assert(plain.length > 0 && salted == plain)
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    // the runtime complement to Skew.saltedJoin: AQE detects a hot
    // shuffle partition after the map stage and splits it into
    // multiple reader tasks ("skew=true" on the join node). Fixture
    // shuffles are tiny, so the skew thresholds are lowered to fire;
    // at real scale the defaults (256MB advisory, factor 5) do this
    // unattended — which is why declared queries don't hand-salt.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    import s2.implicits._
    // one hot key (0) with 200k rows vs 100 cold keys
    val large = s2.range(0, 220000)
      .selectExpr("CASE WHEN id < 200000 THEN 0 ELSE id % 100 + 1 END AS k",
        "id AS payload")
    val small = s2.range(0, 101).selectExpr("id AS k", "id * 10 AS v")
    val joined = large.join(small, "k")
    // run THIS QueryExecution (count() would plan a separate query and
    // leave this one un-finalized by AQE)
    assert(joined.queryExecution.toRdd.count() == 220000L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not mark the skewed join:\n${plan.take(2000)}")
  }

  test("retry retries transient failures then succeeds") {
    var calls = 0
    val out = Retry.withRetry(retries = 2) {
      calls += 1
      if (calls < 3) sys.error("transient")
      "ok"
    }
    assert(out == "ok" && calls == 3)
  }

  test("retry exhausts and rethrows the last error") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withRetry(retries = 1) { calls += 1; sys.error(s"boom $calls") }
    }
    assert(calls == 2 && e.getMessage == "boom 2")
  }

  test("rolling_fingerprint is callable from SQL via extensions") {
    val viaSql = spark.sql("SELECT rolling_fingerprint('hello world', 8)")
      .head.getLong(0)
    val direct = graft.functions.Fingerprints.minRollingHash(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello world"), 8)
    assert(viaSql == direct)
  }
}
