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
