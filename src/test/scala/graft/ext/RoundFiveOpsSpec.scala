package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the round-5 changes the row-hash oracle can't
  * express: q197's refined two-token blocking key, and the q237
  * densified-axis / guarded-sMAPE backtest. */
class RoundFiveOpsSpec extends SparkSpec {

  test("q197: every emitted pair shares the full block key and is ordered") {
    val toks = split(lower(col("text")), "\\s+")
    val keyed = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 100).cast("long").as("lb"),
        element_at(toks, 1).as("ft"),
        coalesce(element_at(toks, 2), lit("")).as("ft2"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    val pairs = TextAnalysis.erBlocking(spark, sf001).collect()
    assert(pairs.nonEmpty, "fixture must produce at least one ER candidate")
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b, "pairs must be canonically ordered")
      assert(keyed(a) == keyed(b),
        s"pair ($a,$b) crosses a block key: ${keyed(a)} vs ${keyed(b)}")
      assert(r.getLong(4) <= TextAnalysis.ErMaxDist)
      assert(r.getString(2) == keyed(a)._1 && r.getLong(3) == keyed(a)._2)
    }
  }

  test("q197: two-token blocking bounds candidate growth vs one-token key") {
    // the round-5 scale fix: the refined key must produce no MORE
    // candidates than the coarse one (a strict subset of its blocks)
    val toks = split(lower(col("text")), "\\s+")
    val b = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 100).cast("long").as("lb"),
        element_at(toks, 1).as("ft"),
        coalesce(element_at(toks, 2), lit("")).as("ft2"))
    def candidates(keys: Seq[String]): Long = b.groupBy(keys.head,
        keys.tail: _*).agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) div 2"))).collect()(0).getLong(0)
    val coarse = candidates(Seq("lang", "lb", "ft"))
    val fine = candidates(Seq("lang", "lb", "ft", "ft2"))
    assert(fine <= coarse,
      s"refined key must not enlarge the candidate set ($fine > $coarse)")
  }

  test("q238: WAV decode round-trips the synthesized PCM exactly") {
    // the REAL-codec guarantee: javax.sound's decoded frame stream must
    // reproduce the closed-form stats of the synthesized samples
    val expected = Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val s = r.getString(1).getBytes("UTF-8")
          .map(b => ((b & 0xff) - Multimodal.SampleBias) * 256)
        val zc = s.sliding(2).count(p =>
          p.length == 2 && p(0).toLong * p(1) < 0)
        r.getLong(0) -> (s.length.toLong, s.map(_.toLong).sum,
          if (s.isEmpty) 0L else s.map(x => math.abs(x.toLong)).max,
          zc.toLong)
      }.toMap
    val rows = Multimodal.audioDecode(spark, sf001).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (n, sum, peak, zc) = expected(r.getLong(0))
      assert(r.getInt(1) == Multimodal.SampleRate)
      assert(r.getLong(2) == n, s"doc ${r.getLong(0)}: n_samples")
      assert(r.getLong(3) == sum, s"doc ${r.getLong(0)}: sum_amp")
      assert(r.getLong(4) == peak, s"doc ${r.getLong(0)}: peak")
      assert(r.getLong(5) == zc, s"doc ${r.getLong(0)}: zero crossings")
    }
  }

  test("q239: padding identity holds and batches respect the doc cap") {
    val rows = Sampling.paddingWaste(spark, sf001).collect()
    assert(rows.nonEmpty)
    val totalDocs = Tables.load(spark, sf001, "documents").count()
    assert(rows.map(_.getLong(1)).sum == totalDocs, "every doc batched once")
    rows.foreach { r =>
      val (docs, batches) = (r.getLong(1), r.getLong(2))
      val (toks, padded, waste) =
        (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(padded == toks + waste, "padded = real + waste, exactly")
      assert(batches == (docs + Sampling.PadBatchDocs - 1) / Sampling.PadBatchDocs,
        "batch count must be ceil(docs / batch size)")
      // max length inside band b is (b+1)*width - 1
      val bandMax = (r.getLong(0) + 1) * Sampling.LenBucketWidth - 1
      assert(padded <= docs * bandMax, "padding bounded by the band ceiling")
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) < 1.0)
    }
  }

  test("q240: the MDE worksheet agrees with q138's arms and scales as 1/sqrt(n)") {
    val mde = Events.powerMde(spark, sf001).collect()(0)
    val ab = Events.abTest(spark, sf001).collect()(0)
    assert(mde.getLong(0) == ab.getLong(0) && mde.getLong(1) == ab.getLong(1),
      "power worksheet must see the identical md5 arm split")
    val (sd, se, mdeAbs) =
      (mde.getDouble(2), mde.getDouble(3), mde.getDouble(4))
    assert(sd > 0 && se > 0 && mdeAbs > 0)
    assert(mdeAbs > se, "MDE = (z_a+z_b)·se must exceed one se")
    // pooled se must sit between the two single-arm extremes
    val nMin = math.min(mde.getLong(0), mde.getLong(1)).toDouble
    assert(se <= sd * math.sqrt(2.0 / nMin) + 1e-9)
  }

  test("q241: Wilson intervals bracket the estimate inside [0, 1]") {
    val rows = Events.wilsonDaily(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k) = (r.getLong(1), r.getLong(2))
      val (p, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(k <= n)
      assert(lo >= 0.0 && hi <= 1.0 && lo <= hi)
      assert(p >= lo - 1e-9 && p <= hi + 1e-9,
        s"day ${r.getDate(0)}: p=$p outside [$lo, $hi]")
    }
  }

  test("q242: ranking metrics agree with q81's hit counts and stay in [0,1]") {
    val rank = Similarity.annRankQuality(spark, sf001).collect()
    val recall = Similarity.annRecall(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rank.length == recall.size, "one row per exact-eval query")
    rank.foreach { r =>
      val (q, hits, fh) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(hits == recall(q),
        s"query $q: intersection size must match q81 ($hits vs ${recall(q)})")
      val (mrr, dcg, ndcg) = (r.getDouble(3), r.getLong(4), r.getDouble(5))
      assert(mrr >= 0.0 && mrr <= 1.0 && ndcg >= 0.0 && ndcg <= 1.0)
      assert(dcg <= Similarity.IdcgE6)
      if (hits == 0) assert(fh == 0L && mrr == 0.0 && dcg == 0L)
      else assert(fh >= 1L && fh <= Similarity.TopK)
      if (fh == 1L) assert(mrr == 1.0)
    }
  }

  test("q243: q-hat is the exact calibration order statistic; coverage holds") {
    // recompute the conformal quantile from first principles driver-side
    val p = TextAnalysis.logitQuality(spark, sf001)
      .select(col("doc_id"), round(col("p_keep") * 1e6, 0).cast("long").as("pm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gold = TextAnalysis.gopherRulesOn(
      Tables.load(spark, sf001, "documents"))
      .select(col("doc_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> (if (r.getBoolean(1)) 1000000L else 0L)).toMap
    def isCal(id: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 2 == 0
    }
    val nc = p.keys.toSeq.map(id => (id, math.abs(gold(id) - p(id))))
    val cal = nc.filter(t => isCal(t._1)).map(_._2).sorted
    val rank = ((TextAnalysis.ConformalNum * (cal.size + 1) +
      TextAnalysis.ConformalDen - 1) / TextAnalysis.ConformalDen).toInt
    val wantQ = if (rank <= cal.size) cal(rank - 1) else 1000000L
    val rows = TextAnalysis.conformalCoverage(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) == wantQ, "q-hat must be the exact order statistic")
      assert(r.getLong(5) == cal.size.toLong)
      assert(r.getLong(2) <= r.getLong(1), "covered <= tested")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // marginal (all-source) coverage should sit near the 90% target
    val (cov, tot) = (rows.map(_.getLong(2)).sum, rows.map(_.getLong(1)).sum)
    assert(cov.toDouble / tot >= 0.85,
      s"marginal conformal coverage ${cov.toDouble / tot} collapsed below target")
  }

  test("q244: observed adjacencies match a direct replay of the q114 order") {
    val order = Sampling.epochShuffle(spark, sf001)
      .select("doc_id", "shuffle_rank").collect()
      .sortBy(_.getLong(1)).map(_.getLong(0))
    val src = Tables.load(spark, sf001, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val direct = order.sliding(2).collect {
      case Array(x, y) if src(x) == src(y) => src(x)
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = Sampling.shuffleAudit(spark, sf001).collect()
    assert(rows.map(_.getLong(1)).sum == order.length.toLong)
    rows.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(2) == direct.getOrElse(s, 0L),
        s"source $s: adjacency count must match the replayed order")
      assert(r.getDouble(4) >= 0.0)
    }
    // a healthy keyed-md5 permutation stays near the uniform expectation
    val obs = rows.map(_.getLong(2)).sum.toDouble
    val exp = rows.map(_.getDouble(3)).sum
    assert(exp > 0 && obs / exp < 2.0,
      s"shuffle looks source-correlated: observed $obs vs expected $exp")
  }

  test("q237: backtest scores a dense day axis and sMAPE never NaNs") {
    val rows = Events.forecastBacktest(spark, sf001).collect()
    assert(rows.length == 2)
    // a DENSE axis backtests span-minus-7 days for both methods
    val daily = Events.loadEvents(spark, sf001)
      .filter(col("event_type") === "purchase")
      .agg(datediff(max(to_date(col("ts"))), min(to_date(col("ts")))))
      .collect()(0).getInt(0)
    rows.foreach { r =>
      assert(r.getLong(1) == daily.toLong - 6,
        "densified axis must backtest every calendar day after warm-up")
      assert(!r.getDouble(3).isNaN && r.getDouble(3) >= 0.0 &&
        r.getDouble(3) <= 2.0, "guarded sMAPE must stay in [0, 2]")
    }
  }
}
