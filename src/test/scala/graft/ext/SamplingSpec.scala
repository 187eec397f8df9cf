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

  test("two-pass mega-strata selection reproduces q31 bit for bit") {
    // same survivors, same stratum_rank, same order — the distributed
    // selection is a pure decomposition of the per-stratum window
    val a = Sampling.stratifiedSample(spark, sf001).collect().toSeq
    val b = Sampling.stratifiedTwoPass(spark, sf001).collect().toSeq
    assert(a == b, s"two-pass drifted: ${a.diff(b).take(3)} vs ${b.diff(a).take(3)}")
  }

  test("two-pass weighted mix reproduces q52 bit for bit") {
    val a = Sampling.weightedMix(spark, sf001).collect().toSeq
    val b = Sampling.weightedMixTwoPass(spark, sf001).collect().toSeq
    assert(a == b, s"two-pass drifted: ${a.diff(b).take(3)} vs ${b.diff(a).take(3)}")
  }

  test("temperature mix: weights normalize and tau<1 boosts small sources") {
    val rows = Sampling.temperatureMix(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // both share and temp_weight are distributions (sum ~= 1 after 6dp)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3, "shares must sum to 1")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3, "weights must sum to 1")
    // tau < 1: the smallest source gets boost >= the largest source's
    val bySize = rows.sortBy(_._2)
    assert(bySize.head._5 >= bySize.last._5,
      s"small sources must be upsampled: ${bySize.head} vs ${bySize.last}")
    // monotone: weight order follows count order (pow is monotone)
    assert(bySize.map(_._4).toSeq == bySize.map(_._4).sorted.toSeq,
      "temperature weights must be monotone in source size")
  }

  test("length batches: buckets bound the 2x pad ratio, batches fill") {
    val rows = Sampling.lengthBatches(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // bucket invariant: 2^(b-1) < n_tokens <= 2^b  (pad waste <= 2x)
    rows.foreach { case (d, n, b, _, _) =>
      assert(n <= (1L << b) && (b == 1 || n > (1L << (b - 1))),
        s"doc $d: $n tokens outside bucket $b")
    }
    // within every (bucket, batch): positions dense from 0; every batch
    // except a bucket's last is exactly full
    rows.groupBy(r => (r._3, r._4)).foreach { case ((b, bid), rs) =>
      assert(rs.map(_._5).sorted.toSeq == (0L until rs.size),
        s"bucket $b batch $bid positions not dense")
      val lastBatch = rows.filter(_._3 == b).map(_._4).max
      if (bid != lastBatch)
        assert(rs.size == Sampling.BatchDocs,
          s"bucket $b batch $bid underfull: ${rs.size}")
    }
  }

  test("epoch shuffle is a dense permutation in keyed-hash order") {
    val rows = Sampling.epochShuffle(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = rows.length
    // ranks are exactly 0..n-1 (a permutation, no gap/dup from the
    // two-phase decomposition)
    assert(rows.map(_._2).sorted.toSeq == (0L until n),
      "shuffle ranks must be a dense permutation")
    // rank order agrees with the flat md5 keyed order computed here
    import org.apache.spark.sql.functions._
    val want = graft.Tables.load(spark, sf001, "documents")
      .select(col("doc_id"),
        md5(concat(lit(Sampling.EpochSeed + ":"),
          col("doc_id").cast("string"))).as("h"))
      .collect().map(r => (r.getString(1), r.getLong(0)))
      .sorted.map(_._2).zipWithIndex
      .map { case (d, i) => d -> i.toLong }.toMap
    rows.foreach { case (d, rk, sid, pos) =>
      assert(rk == want(d), s"doc $d rank $rk != flat-order ${want(d)}")
      assert(sid == rk / Sampling.EpochShardDocs && pos == rk % Sampling.EpochShardDocs)
    }
    // every shard except the last is exactly full
    val sizes = rows.groupBy(_._3).view.mapValues(_.size).toMap
    val last = sizes.keys.max
    sizes.foreach { case (sid, sz) =>
      if (sid != last) assert(sz == Sampling.EpochShardDocs,
        s"shard $sid has $sz docs")
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

  test("context chunks cover every token and overlap by the stride gap") {
    val docs = graft.Tables.load(spark, sf001, "documents")
      .selectExpr("doc_id",
        "CAST(size(split(text, '\\\\s+')) AS BIGINT) AS n_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = Sampling.contextChunks(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(chunks.keySet == docs.keySet, "every doc must produce chunks")
    chunks.foreach { case (doc, cs) =>
      val n = docs(doc)
      val sorted = cs.sortBy(_._2)
      // full coverage: chunk c starts at c*stride and spans to start+len;
      // consecutive starts differ by stride < window => no gaps
      assert(sorted.head._3 == 0L, s"doc $doc first chunk must start at 0")
      assert(sorted.last._3 + sorted.last._4 == n,
        s"doc $doc last chunk must end at n_tokens=$n")
      sorted.foreach { case (_, c, start, len) =>
        assert(start == c * Sampling.ChunkStride)
        assert(len >= 1 && len <= Sampling.ChunkTokens)
        assert(start + len <= n)
      }
      // every full-window pair overlaps by window - stride tokens
      sorted.sliding(2).foreach {
        case Array((_, _, s1, l1), (_, _, s2, _)) =>
          assert(s1 + l1 - s2 >= math.min(
            Sampling.ChunkTokens - Sampling.ChunkStride, l1),
            s"doc $doc: gap between chunks at $s1+$l1 -> $s2")
        case _ =>
      }
    }
  }

  test("sample is deterministic across runs") {
    val a = Sampling.stratifiedSample(spark, sf001).collect().map(_.toString).toSeq
    val b = Sampling.stratifiedSample(spark, sf001).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("unimax: small sources cap at C epochs, the rest split the remainder") {
    import spark.implicits._
    // n = [10, 10, 100], C=4, B=150: both 10s cap (4·10·3=120≤150,
    // 4·10·2=80≤110), the 100 can't (400>70) -> allocs 40, 40, 70
    val per = Seq(("a", 10L), ("b", 100L), ("c", 10L)).toDF("source", "n_tokens")
    val got = Sampling.unimaxOn(per, 150L, 4).collect()
      .map(r => r.getString(0) ->
        ((r.getBoolean(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("a") == ((true, 40.0, 4.0)), s"a: ${got("a")}")
    assert(got("c") == ((true, 40.0, 4.0)), s"c: ${got("c")}")
    assert(got("b") == ((false, 70.0, 0.7)), s"b: ${got("b")}")
  }

  test("unimax edge cases: budget under uniform share, budget over all caps") {
    import spark.implicits._
    val per = Seq(("a", 10L), ("b", 100L), ("c", 10L)).toDF("source", "n_tokens")
    // B=100: 4·10·3=120>100 -> nobody caps, all get B/N=33.33…
    val low = Sampling.unimaxOn(per, 100L, 4).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(2), r.getDouble(3)))).toMap
    assert(low.values.forall(v => !v._1 && v._2 == 33.33), s"low: $low")
    // B=500 > ΣC·n=480: everyone caps, budget deliberately underspent
    val high = Sampling.unimaxOn(per, 500L, 4).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(2), r.getDouble(4)))).toMap
    assert(high.values.forall(v => v._1 && v._2 == 4.0), s"high: $high")
  }

  test("rendezvous shards: resize moves docs ONLY into the new shard") {
    val rows = Sampling.rendezvousShards(spark, sf001).collect()
    assert(rows.length == Sampling.RdvShardsAfter)
    val newShard = Sampling.RdvShardsAfter - 1
    rows.foreach { r =>
      val (s, nb, na, arr, dep) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      if (s == newShard) {
        assert(nb == 0L && dep == 0L && na == arr,
          s"new shard $s: before=$nb after=$na arr=$arr dep=$dep")
      } else {
        assert(arr == 0L, s"HRW must not relocate into surviving shard $s")
        assert(na == nb - dep, s"shard $s population must only shrink by departures")
      }
    }
    val total = rows.map(_.getLong(1)).sum.toDouble
    val churn = rows.map(_.getLong(3)).sum / total
    val exp = 1.0 / Sampling.RdvShardsAfter
    val sigma = math.sqrt(exp * (1 - exp) / total)
    assert(math.abs(churn - exp) < 5 * sigma + 1e-9,
      s"churn $churn should be near $exp (n=$total)")
  }

  test("unimax on the fixture: mixed capped/uncapped, budget exactly spent") {
    val rows = Sampling.unimaxBudget(spark, sf001).collect()
    val capped = rows.count(_.getBoolean(2))
    assert(capped > 0 && capped < rows.length,
      s"B=3.7×corpus with C=4 must split the fixture: $capped/${rows.length}")
    // uncapped epochs sit strictly between the capped boundary and C
    rows.filterNot(_.getBoolean(2)).foreach { r =>
      assert(r.getDouble(4) < 4.0, s"uncapped ${r.getString(0)} above cap")
    }
  }
}
