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

  test("token shards fill to the budget and never split mid-doc") {
    val rows = Sampling.tokenShards(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perShard = rows.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val budget = Sampling.TokensPerShard
    // every shard except possibly the last must have reached the budget
    // by its final doc (the doc that crossed the boundary belongs to it)
    val lastShard = perShard.keys.max
    perShard.foreach { case (sid, total) =>
      if (sid != lastShard)
        assert(total >= budget - rows.map(_._2).max && total > 0,
          s"shard $sid holds $total tokens against budget $budget")
    }
    // shard ids are dense from 0
    assert(perShard.keys.toSeq.sorted == (0L to lastShard),
      "shard ids must be dense")
    // total conservation: every doc lands in exactly one shard
    assert(rows.map(_._2).sum == perShard.values.sum)
  }

  test("sample is deterministic across runs") {
    val a = Sampling.stratifiedSample(spark, sf001).collect().map(_.toString).toSeq
    val b = Sampling.stratifiedSample(spark, sf001).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
