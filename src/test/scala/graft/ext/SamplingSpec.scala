package graft.ext

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  test("stratified sample takes an exact ceil-quota from every stratum") {
    val got = Sampling.stratifiedSample(spark, sf001)
      .groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val full = graft.Tables.load(spark, sf001, "documents")
      .groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.keySet == full.keySet,
      "every stratum must contribute at least one row (ceil quota >= 1)")
    full.foreach { case (k, n) =>
      val want = math.ceil(n * Sampling.SampleFrac).toLong
      assert(got(k) == want, s"stratum $k: got ${got(k)}, want $want of $n")
    }
  }

  test("sample is deterministic across runs") {
    val a = Sampling.stratifiedSample(spark, sf001).collect().map(_.toString).toSeq
    val b = Sampling.stratifiedSample(spark, sf001).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
