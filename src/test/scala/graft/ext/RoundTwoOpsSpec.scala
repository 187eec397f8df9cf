package graft.ext

import graft.SparkSpec
import graft.queries.Bi
import org.apache.spark.sql.functions._

/** Specs for the round-2 operators: text scrub (q39), per-user lag
  * deltas (q40), event-type pivot (q41), rollup (q42), exact length
  * quantiles (q43), and the salted hot-key join (q44). */
class RoundTwoOpsSpec extends SparkSpec {
  import spark.implicits._

  test("scrub masks emails and long digit runs on poisoned rows") {
    val df = Seq(
      (1L, "contact bob.smith@example.com today"),
      (2L, "call 5551234567 now"),
      (3L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextAnalysis.scrubbedCol(col("text")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "contact [MASK] today", s"email not masked: ${out(1L)}")
    assert(out(2L) == "call [MASK] now", s"digits not masked: ${out(2L)}")
    assert(out(3L) == "nothing sensitive here")
  }

  test("scrub on the fixture: marker tier fires, hash changes with it") {
    val rows = TextAnalysis.scrub(spark, sf001).collect()
    assert(rows.nonEmpty)
    // fixture text is @- and digit-free
    assert(rows.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
    assert(rows.exists(_.getLong(3) > 0L), "marker words must fire somewhere")
  }

  test("user deltas: one null gap per user, non-negative gaps") {
    val d = Events.userDeltas(spark, sf001).cache()
    val nUsers = Events.loadEvents(spark, sf001)
      .select("user_id").distinct().count()
    assert(d.filter(col("gap_s").isNull).count() == nUsers,
      "exactly the first event per user has no predecessor")
    assert(d.filter(col("gap_s") < 0).count() == 0, "time must not go backwards")
  }

  test("event pivot: cells cover every event exactly once") {
    val p = Events.dailyPivot(spark, sf001)
    val cells = Events.EventTypes.map(t => sum(col(t))).reduce(_ + _)
    val total = p.agg(cells).head.getLong(0)
    assert(total == Events.loadEvents(spark, sf001).count())
  }

  test("salted hot-key join equals the plain join") {
    val salted = Events.saltedHotJoin(spark, sf001)
    val ev = Events.loadEvents(spark, sf001)
      .select(col("event_id"), col("event_type"), col("value"))
    val dim = ev.groupBy("event_type").agg(count(lit(1)).as("type_count"))
    val plain = ev.join(dim, Seq("event_type"))
      .groupBy("event_type")
      .agg(max(col("type_count")).as("type_count"),
        count(lit(1)).as("n_rows"),
        sum(graft.Tables.money(col("value"))).as("v_dec"))
      .select(col("event_type"), col("type_count"), col("n_rows"),
        col("v_dec").cast("double").as("total_value"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salting must not change the join result")
  }

  test("revenue rollup: leaves sum to year subtotals and the grand total") {
    val rows = Bi.revenueRollup(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val leaves = rows.filter { case (y, f, _) => y != -1 && f != "ALL" }
    val years = rows.filter { case (y, f, _) => y != -1 && f == "ALL" }
    val grand = rows.filter { case (y, _, _) => y == -1 }
    assert(grand.size == 1 && grand.head._2 == "ALL")
    assert(grand.head._3 == leaves.map(_._3).sum, "grand total must cover leaves")
    years.foreach { case (y, _, n) =>
      assert(n == leaves.filter(_._1 == y).map(_._3).sum, s"year $y subtotal")
    }
  }

  test("distinctive terms: rarest-then-most-frequent wins, df is honest") {
    val out = TextAnalysis.distinctiveTerms(spark, sf001).cache()
    val docs = graft.Tables.load(spark, sf001, "documents")
    assert(out.count() == docs.count(), "one distinctive term per doc")
    // the chosen term's df must never exceed any other term's df for
    // that doc — spot-check: df of the winner is the per-doc minimum
    val toks = docs.select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val minDf = tf.join(tf.groupBy("tok").agg(count(lit(1)).as("df")), Seq("tok"))
      .groupBy("doc_id").agg(min(col("df")).as("min_df"))
    val bad = out.join(minDf, Seq("doc_id"))
      .filter(col("df") =!= col("min_df")).count()
    assert(bad == 0, "winner must carry the minimal document frequency")
  }

  test("oov rate: the out-of-vocab branch is live on the fixture") {
    val rows = TextAnalysis.oovRate(spark, sf001).collect()
    assert(rows.exists(_.getDouble(2) > 0.0),
      "VocabK must sit below the fixture lexicon size or the OOV " +
        "arithmetic is never exercised")
    assert(rows.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("weighted mix honors each language's configured fraction") {
    val out = Sampling.weightedMix(spark, sf001).cache()
    val sizes = graft.Tables.load(spark, sf001, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val taken = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Sampling.MixWeights.foreach { case (l, w) =>
      sizes.get(l).foreach { n =>
        assert(taken.getOrElse(l, 0L) == math.ceil(n * w).toLong,
          s"$l quota: ${taken.get(l)} of $n at weight $w")
      }
    }
    assert(taken.keySet.subsetOf(Sampling.MixWeights.map(_._1).toSet),
      "unconfigured languages must be dropped")
  }

  test("approx quantile sketch tracks the exact percentile within its error") {
    // the 100 TB path (mergeable one-pass sketch) must stay close to the
    // exact two-pass answer the oracle checks; 1% relative rank error
    // on 500+ docs keeps the value error tight on this distribution
    val docs = graft.Tables.load(spark, sf001, "documents")
    val Seq(exact25, exact50, exact75) = docs
      .select(percentile(col("n_chars"),
        array(lit(0.25), lit(0.5), lit(0.75))).as("q"))
      .head.getSeq[Double](0).toSeq
    val approx = docs.stat
      .approxQuantile("n_chars", Array(0.25, 0.5, 0.75), 0.01)
    val spread = exact75 - exact25
    Seq(exact25, exact50, exact75).zip(approx).foreach { case (e, a) =>
      assert(math.abs(e - a) <= math.max(spread * 0.1, 1.0),
        s"sketch answer $a too far from exact $e")
    }
  }

  test("length quantiles are ordered and bounded per language") {
    TextAnalysis.lengthQuantiles(spark, sf001).collect().foreach { r =>
      val (mn, mx) = (r.getLong(2).toDouble, r.getLong(6).toDouble)
      val qs = Seq(r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(qs.sorted == qs, s"quantiles must be monotone: $qs")
      assert(mn <= qs.head && qs.last <= mx, s"quantiles must sit in [$mn,$mx]")
    }
  }
}
