package graft.ext

import graft.SparkSpec
import graft.etl.Layout
import graft.queries.Bi
import org.apache.spark.sql.functions._

/** Specs for the sketch / layout / retrieval / graph operators added in
  * round 3: portable HLL (q87), Z-order layout (q88), BM25 (q89), EWMA
  * (q90), triangle census (q91), exact percentiles (q92), moment
  * regression (q93), and the bloom-prefiltered join (q94). */
class SketchGraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hll estimate lands within 3 standard errors of exact") {
    // rse for m=256 is 1.04/sqrt(256) = 6.5%
    val rows = Sketches.hllDistinct(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val relErr = r.getDouble(3)
      assert(relErr < 3 * 0.065,
        s"${r.getString(0)}: rel_err $relErr outside 3 rse")
    }
  }

  test("z-order buckets are 32x32 tiles: tight bounds on BOTH dims") {
    val rows = Layout.zorderStats(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (minX, maxX) = (r.getLong(2), r.getLong(3))
      val (minY, maxY) = (r.getLong(4), r.getLong(5))
      assert(maxX - minX < 32, s"bucket ${r.getLong(0)}: x spans $minX..$maxX")
      assert(maxY - minY < 32, s"bucket ${r.getLong(0)}: y spans $minY..$maxY")
    }
  }

  test("clusterByZ partitions carry tight envelopes on both dimensions") {
    val li = graft.Tables.load(spark, sf001, "lineitem")
      .select((col("l_partkey") % 256).as("x"), (col("l_suppkey") % 256).as("y"))
    val parts = Layout.clusterByZ(li, col("x"), col("y"), 16)
      .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
      .groupBy("pid")
      .agg(count(lit(1)).as("n"),
        (max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(parts.length > 4, "range partitioner must actually split")
    // z-range partitions are unions of z-tiles: each must span far less
    // than the full 0..255 domain on BOTH dims (a single-column sort
    // would show sy ~ 255 everywhere)
    val avgSpanX = parts.map(_.getLong(2)).sum.toDouble / parts.length
    val avgSpanY = parts.map(_.getLong(3)).sum.toDouble / parts.length
    assert(avgSpanX < 200 && avgSpanY < 200,
      s"z-clustering lost locality: avg x-span $avgSpanX, y-span $avgSpanY")
  }

  test("z-value matches a reference bit-interleave on 256 random pairs") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(256)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    def ref(x: Long, y: Long): Long =
      (0 until Layout.ZBits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val got = pts.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    pts.zip(got).foreach { case ((x, y), z) =>
      assert(z == ref(x, y), s"($x, $y): got $z want ${ref(x, y)}")
    }
  }

  test("z-value interleaves bits exactly") {
    val out = spark.range(1)
      .select(Layout.zValue(lit(0b1010L), lit(0b0110L)).as("z"))
      .head.getLong(0)
    // x bits at even positions, y bits at odd: x=1010, y=0110 →
    // z = sum(x_i·4^i) + 2·sum(y_i·4^i) = (64+4) + 2·(16+4) = 108
    assert(out == 108L, s"z=$out")
  }

  test("bm25 returns the full top-k, descending, docs contain a term") {
    val rows = TextAnalysis.bm25(spark, sf001).collect()
    assert(rows.length == TextAnalysis.Bm25TopK)
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse), "not score-descending")
    val topIds = rows.map(_.getLong(0)).toSet
    val withTerm = graft.Tables.load(spark, sf001, "documents")
      .filter(col("doc_id").isin(topIds.toSeq: _*))
      .filter(TextAnalysis.Bm25Query
        .map(t => lower(col("text")).contains(t)).reduce(_ || _))
      .count()
    assert(withTerm == TextAnalysis.Bm25TopK,
      "every retrieved doc must contain a query term")
  }

  test("ewma matches a driver-side fold on one user") {
    val ev = Events.loadEvents(spark, sf001)
      .filter(col("user_id") === 1L)
      .select(col("ts"), col("event_id"), col("value"))
      .orderBy("ts", "event_id").collect().map(_.getDouble(2))
    assume(ev.nonEmpty)
    val expected = ev.reduce((acc, x) =>
      Events.EwmaAlpha * x + (1.0 - Events.EwmaAlpha) * acc)
    val got = Events.ewmaValue(spark, sf001)
      .filter(col("user_id") === 1L).head.getDouble(2)
    assert(math.abs(got - BigDecimal(expected)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
      s"got $got expected $expected")
  }

  test("array-free mapPartitions EWMA equals the fold formulation") {
    val a = Events.ewmaValue(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Events.ewmaValueStreaming(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b, s"drift: ${(a diff b).take(3)} vs ${(b diff a).take(3)}")
  }

  test("triangle kernel counts a known graph exactly") {
    // 4-clique on 1-4 plus a pendant 4-5: C(4,3)=4 triangles, each
    // clique node in 3 of them; node 5 in none, degree 1
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("doc_a", "doc_b")
    val out = Dedup.triangleStatsOn(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((3L, 3L, 1.0)))
    assert(out(2L) == ((3L, 3L, 1.0)))
    assert(out(3L) == ((3L, 3L, 1.0)))
    assert(out(4L) == ((4L, 3L, 0.5)))
    assert(out(5L) == ((1L, 0L, 0.0)))
  }

  test("percentiles are ordered and bracketed by min/max") {
    val ev = Events.loadEvents(spark, sf001)
    val (lo, hi) = ev.agg(min("value"), max("value")).as[(Double, Double)].head
    Events.valuePercentiles(spark, sf001).collect().foreach { r =>
      val ps = (2 to 6).map(r.getDouble)
      assert(ps == ps.sorted, s"${r.getString(0)}: quantiles not monotone")
      assert(ps.head >= lo - 1e-6 && ps.last <= hi + 1e-6)
    }
  }

  test("exact moments agree with Spark's built-in skewness/kurtosis") {
    val got = Events.valueMoments(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    val want = Events.loadEvents(spark, sf001)
      .select(col("event_type"), floor(col("value") * 100).as("c"))
      .groupBy("event_type")
      .agg(skewness(col("c")).as("s"), kurtosis(col("c")).as("k"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    got.foreach { case (t, (s, k)) =>
      assert(math.abs(s - want(t)._1) < 1e-6, s"$t skew: $s vs ${want(t)._1}")
      assert(math.abs(k - want(t)._2) < 1e-6, s"$t kurt: $k vs ${want(t)._2}")
    }
  }

  test("moment regression recovers an exact line") {
    // y = 2x + 1 exactly: slope 2, intercept 1, r = 1
    val pts = (0 until 100)
      .map(i => ("t", i.toLong, BigDecimal(2 * i + 1))).toDF("g", "x", "y")
    val m = pts.groupBy("g").agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"),
      sum("y").as("sy"), sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy")).head
    val (n, sx, sxx) = (m.getLong(1).toDouble,
      m.getLong(2).toDouble, m.getLong(3).toDouble)
    val sy = m.getDecimal(4).doubleValue
    val sxy = m.getDecimal(6).doubleValue
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(slope - 2.0) < 1e-9)
    // and the fixture query yields |r| <= 1 everywhere
    Events.hourValueRegression(spark, sf001).collect().foreach { r =>
      assert(math.abs(r.getDouble(4)) <= 1.0 + 1e-9,
        s"${r.getString(0)}: r out of range")
    }
  }

  test("unpivot is the exact inverse reshape of the pivot") {
    val long = Events.dailyUnpivot(spark, sf001)
    assert(long.agg(sum("n")).head.getLong(0) ==
      Events.loadEvents(spark, sf001).count(),
      "melted cells must cover every event exactly once")
    val nDays = Events.dailyPivot(spark, sf001).count()
    assert(long.count() == nDays * Events.EventTypes.size,
      "one row per (day, type) including zero cells")
  }

  test("grouping sets: marginals are consistent with the full cells") {
    val g = Bi.prioritySets(spark, sf001).cache()
    val full = g.filter(col("order_year") =!= -1 && col("priority") =!= "ALL")
    val byYear = g.filter(col("order_year") =!= -1 && col("priority") === "ALL")
    val byPrio = g.filter(col("order_year") === -1)
    assert(full.agg(sum("n_orders")).head.getLong(0) ==
      byYear.agg(sum("n_orders")).head.getLong(0))
    assert(full.agg(sum("n_orders")).head.getLong(0) ==
      byPrio.agg(sum("n_orders")).head.getLong(0))
    // no grand-total row: this set shape is not a rollup or a cube
    assert(g.filter(col("order_year") === -1 && col("priority") === "ALL")
      .count() == 0)
  }

  test("cms counters conserve mass: every row lands once per hash row") {
    val df = Seq.tabulate(500)(i => s"tok_${i % 37}").toDF("k")
    val rows = Sketches.cmsCounters(df, "k").collect()
    val perRow = rows.groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getLong(2)).sum)
    (0 until Sketches.CmsRows).foreach { r =>
      assert(perRow(r) == 500L, s"hash row $r lost mass: ${perRow(r)}")
    }
    rows.foreach(r => assert(r.getLong(1) >= 0 &&
      r.getLong(1) < Sketches.CmsWidth, s"bucket out of range: $r"))
  }

  test("count-min never underestimates, and is tight on heavy hitters") {
    val rows = Sketches.cmsHeavyHitters(spark, sf001).collect()
    assert(rows.length == Sketches.CmsTopK)
    rows.foreach { r =>
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"${r.getString(0)}: CMS underestimated")
      assert(over == est - exact)
    }
  }

  test("interval overlap: bounded by session length and incident count") {
    val out = Events.sessionIncidentOverlap(spark, sf001).cache()
    assert(out.filter(col("n_incidents") > 0).count() > 0,
      "error incidents must overlap some session")
    assert(out.filter(col("overlap_us") < 0).count() == 0)
    assert(out.filter(
      col("overlap_us") > col("n_incidents") * Events.IncidentLenUs)
      .count() == 0, "per-incident overlap cannot exceed the incident")
  }

  test("bpe encode: merges only ever shrink the char-level tokenization") {
    val enc = TextAnalysis.bpeEncode(spark, sf001).cache()
    // per doc: n_words <= n_bpe_tokens <= total non-space chars
    val letters = graft.Tables.load(spark, sf001, "documents")
      .select(col("doc_id"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("long").as("nl"))
    val joined = enc.join(letters, Seq("doc_id")).cache()
    assert(joined.filter(col("n_bpe_tokens") < col("n_words")).count() == 0)
    assert(joined.filter(col("n_bpe_tokens") > col("nl")).count() == 0)
    // the 8 learned merges must actually fire: strictly fewer tokens
    // than the char-level baseline somewhere
    assert(joined.filter(col("n_bpe_tokens") < col("nl")).count() > 0,
      "no merge ever applied")
  }

  test("logit scores are proper probabilities consistent with the gate") {
    TextAnalysis.logitQuality(spark, sf001).collect().foreach { r =>
      val p = r.getDouble(2)
      assert(p > 0.0 && p < 1.0, s"p_keep $p out of range")
      assert(r.getBoolean(3) == (p >= 0.5), "keep flag inconsistent")
    }
  }

  test("bloom-prefiltered join equals the plain join") {
    val plain = {
      val cust = graft.Tables.load(spark, sf001, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val nation = graft.Tables.load(spark, sf001, "nation")
      graft.Tables.load(spark, sf001, "orders")
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(graft.Tables.money(col("o_totalprice")))
            .cast("double").as("revenue"))
    }
    val got = Bi.bloomPrefilterRevenue(spark, sf001)
    assert(got.except(plain).isEmpty && plain.except(got).isEmpty,
      "bloom pre-filter must not change the join result")
  }

  test("q178 registers-only WAU matches q149's estimate column exactly") {
    // the production path and the eval path must be the SAME estimator:
    // identical (week_ending, n_hll/wau_hll) values, q178 just drops the
    // event-scale exact twin
    val eval = Sketches.wauHll(spark, sf001)
      .select(col("week_ending"), col("n_days"), col("n_hll"))
    val prod = Sketches.wauRegisters(spark, sf001)
      .select(col("week_ending"), col("n_days"),
        col("wau_hll").as("n_hll"))
    assert(eval.except(prod).isEmpty && prod.except(eval).isEmpty,
      "q178 estimates diverge from q149")
  }

  test("q178's plan is register-sized: no user-level distinct anywhere") {
    // the point of the production shape: after the memoized register
    // build, the declared plan never touches user_id — every aggregate
    // is over (wend, bucket) register rows
    val df = Sketches.wauRegisters(spark, sf001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("user_id"),
      s"q178 must not re-derive user-level state:\n$plan")
    assert(!plan.contains("Expand"),
      s"q178 must not plan a countDistinct Expand:\n$plan")
  }

  test("q149 partial windows are visible: n_days < 7 iff wend < d0+6") {
    val rows = Sketches.wauHll(spark, sf001)
      .orderBy("week_ending").collect()
    val nDays = rows.map(_.getLong(1))
    assert(nDays.take(6).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L),
      s"leading partial windows must count up: ${nDays.take(6).toSeq}")
    assert(nDays.drop(6).forall(_ == 7L),
      "full windows must report n_days = 7")
  }
}
