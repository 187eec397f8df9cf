package graft.ext

import graft.{SparkSpec, Tables}
import graft.queries.Decision
import org.apache.spark.sql.functions._

/** Invariants for the round-4 operators that the row-hash oracle can't
  * express: algebraic properties (XOR invariance, monotone sweeps,
  * PSD-diagonal covariance) and graph-propagation sanity. */
class RoundFourOpsSpec extends SparkSpec {

  test("q214: shard checksums are invariant under repartitioning") {
    // BIT_XOR is commutative/associative, so ANY executor layout must
    // produce identical manifests — the property that makes q214 a
    // trustworthy release checksum. Recompute with a hostile layout.
    val base = Diagnostics.shardChecksums(spark, sf001).collect()
    val hostile = Tables.load(spark, sf001, "documents")
      .repartition(7, col("n_chars")) // arbitrary non-id layout
      .select(
        pmod(Dedup.hash60(col("doc_id").cast("string")), lit(16)).as("shard"),
        Dedup.hash60(col("text")).as("h"))
      .groupBy("shard")
      .agg(expr("bit_xor(h)").as("checksum"))
      .orderBy("shard").collect()
    assert(base.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      hostile.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("q210: covariance diagonal is non-negative and triangle complete") {
    val rows = Similarity.embeddingCovariance(spark, sf001).collect()
    assert(rows.length == 64 * 65 / 2) // full upper triangle
    rows.filter(r => r.getLong(0) == r.getLong(1)).foreach { r =>
      assert(r.getDouble(3) >= 0.0, s"negative variance at dim ${r.getLong(0)}")
    }
  }

  test("q218/q219: sweep counts are monotone in their threshold") {
    val ttl = Events.dedupTtlSweep(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    ttl.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(a <= b, "suppression must grow with TTL")
    }
    val gaps = Events.sessionGapSweep(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(2))).sortBy(_._1)
    gaps.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(a >= b, "session count must shrink as the gap widens")
    }
  }

  test("q211: propagation only reaches the near-dup closure of the seed") {
    val assigned = Dedup.labelPropagation(spark, sf001).collect()
    // seeds keep their own lang, tagged round 0
    val docs = Tables.load(spark, sf001, "documents")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val seedRows = assigned.filter(_.getInt(2) == 0)
    assert(seedRows.nonEmpty)
    seedRows.foreach(r =>
      assert(r.getString(1) == docs(r.getLong(0)), "seed label must be its own lang"))
    assert(seedRows.forall(r => r.getLong(0) % 3 == 0))
    // non-seed winners sit on a verified edge to an earlier round
    val edges = Dedup.verifiedNgramPairs(spark, sf001)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val byRound = assigned.groupBy(_.getInt(2))
      .view.mapValues(_.map(_.getLong(0)).toSet).toMap
    for (r <- Seq(1, 2); id <- byRound.getOrElse(r, Set.empty)) {
      val prior = (0 until r).flatMap(byRound.getOrElse(_, Set.empty)).toSet
      assert(edges.getOrElse(id, Set.empty).exists(prior),
        s"doc $id won round $r with no labeled neighbour")
    }
    // one assignment per doc
    assert(assigned.map(_.getLong(0)).distinct.length == assigned.length)
  }

  test("q206 = q166's winner family: the max-revenue supplier is unique here") {
    // the scalar-anchor implementation must return EVERY supplier tied
    // at the max; on this fixture that's exactly one row whose revenue
    // equals the rollup max recomputed independently
    val rows = Decision.quarterTopSupplier(spark, sf001).collect()
    assert(rows.nonEmpty)
    val rev = Tables.load(spark, sf001, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(Tables.money(col("l_extendedprice")) *
        (lit(1.0) - col("l_discount")).cast("decimal(4,2)")).as("r"))
      .agg(max(col("r").cast("double"))).head.getDouble(0)
    rows.foreach(r => assert(math.abs(r.getDouble(2) - rev) < 1e-6))
  }

  test("q222: calibration columns are probabilities and bands are in range") {
    val rows = Dedup.lshCalibration(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bucket, pc) = (r.getInt(0), r.getDouble(6))
      assert(bucket >= 0 && bucket <= 9)
      assert(pc > 0.0 && pc <= 1.0, s"pred_catch_prob $pc out of (0,1]")
      // every CAUGHT pair shares >= 1 band, and never more than Bands
      val sb = r.getDouble(4)
      assert(sb >= 1.0 && sb <= Dedup.Bands.toDouble)
      // mean exact J must sit inside its bucket
      val mj = r.getDouble(2)
      assert(mj >= bucket / 10.0 && (bucket == 9 || mj < (bucket + 1) / 10.0))
    }
  }

  test("q225: implied pairs dominate direct pairs; spanning trees bound below") {
    val rows = Dedup.clusterTransitivity(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, nc) = (r.getLong(0), r.getLong(1))
      val (implied, direct) = (r.getLong(4), r.getLong(5))
      assert(implied == nc * s * (s - 1) / 2)
      // connectivity: each cluster of size s carries >= s-1 direct edges
      assert(direct >= nc * (s - 1), s"size-$s clusters under-connected")
      assert(direct <= implied)
      assert(r.getLong(6) == implied - direct)
    }
  }

  test("q223: the transfer diagonal is each eval source's best (or tied) model") {
    // an add-one-smoothed unigram LM fit on source b itself can only be
    // beaten by a model whose vocab counts align better by chance —
    // assert the weaker, always-true direction: diagonal ce is finite,
    // grid is complete (S×S) and symmetric in SHAPE, not values
    val rows = TextAnalysis.lmTransfer(spark, sf001).collect()
    val sources = rows.map(_.getString(0)).distinct
    assert(rows.length == sources.length * sources.length)
    rows.foreach { r =>
      assert(!r.getDouble(2).isNaN && r.getDouble(2) > 0.0)
      assert(r.getDouble(3) >= 1.0) // perplexity >= 1
    }
    // diagonal should on average transfer better than off-diagonal
    val diag = rows.filter(r => r.getString(0) == r.getString(1)).map(_.getDouble(2))
    val off = rows.filter(r => r.getString(0) != r.getString(1)).map(_.getDouble(2))
    assert(diag.sum / diag.length <= off.sum / off.length,
      "self-trained LMs must beat cross-source LMs on average")
  }

  test("q224: reliability bins partition all docs; fractions are probabilities") {
    val rows = TextAnalysis.qualityCalibration(spark, sf001).collect()
    val nDocs = Tables.load(spark, sf001, "documents").count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    rows.foreach { r =>
      val (mp, gf) = (r.getDouble(2), r.getDouble(3))
      assert(mp >= 0.0 && mp <= 1.0 && gf >= 0.0 && gf <= 1.0)
      assert(math.abs(r.getDouble(4) - math.abs(mp - gf)) < 1e-9)
    }
  }

  test("q227: loss fractions are bounded and removed-free langs lose nothing") {
    val rows = Dedup.dedupInfoLoss(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, lost, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(lost >= 0 && lost <= n)
      assert(frac >= 0.0 && frac <= 1.0)
      assert(math.abs(frac - lost.toDouble / n) < 1e-6)
    }
    // langs with NO removed docs must report zero loss
    val removedLangs = Dedup.dedupSurvivors(spark, sf001)
      .filter(!col("survivor"))
      .join(Tables.load(spark, sf001, "documents"), Seq("doc_id"))
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    rows.filterNot(r => removedLangs(r.getString(0)))
      .foreach(r => assert(r.getLong(2) == 0L,
        s"lang ${r.getString(0)} lost grams without removing docs"))
  }

  test("q228: classes partition the customers and flags match their definitions") {
    val rows = Diagnostics.kAnonymity(spark, sf001).collect()
    val nCust = Tables.load(spark, sf001, "customer").count()
    assert(rows.map(_.getLong(2)).sum == nCust)
    rows.foreach { r =>
      val (k, l) = (r.getLong(2), r.getLong(3))
      assert(l >= 1 && l <= math.min(k, 5))
      assert(r.getBoolean(4) == (k < Diagnostics.KAnonThreshold))
      assert(r.getBoolean(5) == (l == 1))
    }
  }

  test("q229: the quality gap is zero exactly when the best member is kept") {
    val rows = Dedup.survivorQualityAudit(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, best, frac, gap) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(best <= n)
      assert(math.abs(frac - best.toDouble / n) < 1e-6)
      assert(gap >= 0.0)
      if (best == n) assert(gap == 0.0, "all-best sizes cannot sacrifice score")
    }
  }

  test("q230: fragmentation is monotone non-increasing in context length") {
    val rows = Sampling.contextSweep(spark, sf001).collect()
    assert(rows.map(_.getLong(0)).toSeq == Sampling.ContextLens)
    // doubling L can only merge boundaries a doc crosses, never add:
    // every 2L boundary is also an L boundary
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) <= a.getLong(2), "n_split must fall as L doubles")
      assert(b.getDouble(4) <= a.getDouble(4) + 1e-9,
        "mean fragments must fall as L doubles")
      assert(b.getLong(5) <= a.getLong(5), "n_seqs must fall as L doubles")
    }
    rows.foreach { r =>
      assert(r.getLong(6) >= 0 && r.getLong(6) < r.getLong(0),
        "tail pad must be in [0, L)")
    }
  }

  test("q231: contracted incremental labels equal the full recompute") {
    // the exactness claim itself: folding the batch into contracted
    // standing components must land every batch doc on the SAME label a
    // from-scratch clustering of the whole graph assigns
    val inc = Dedup.incrementalClusters(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.clusters(spark, sf001).collect()
      .filter(_.getLong(0) % 10 == 0)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full,
      s"contraction drift: ${(inc.toSet diff full.toSet).take(3)} vs " +
        s"${(full.toSet diff inc.toSet).take(3)}")
    // a bridge means >= 2 old components; singleton-absorbing batches not
    val flags = Dedup.incrementalClusters(spark, sf001).collect()
    flags.foreach(r => assert(r.getBoolean(4) == (r.getLong(2) >= 2)))
  }

  test("q232: KM invariants — risk conservation, monotone survival, q50 tie-out") {
    val rows = Events.kmSurvival(spark, sf001).collect()
    assert(rows.nonEmpty)
    // exits partition the cohort: risk at t+1 = risk at t - exits at t
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) == a.getLong(1) - a.getLong(2) - a.getLong(3))
      assert(b.getDouble(5) <= a.getDouble(5) + 1e-9,
        "survival must be non-increasing")
    }
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
    // cohort size == signed-up users; total events == users with a
    // purchase at/after their first signup (the funnel numerator,
    // unwindowed)
    val ev = Events.loadEvents(spark, sf001)
    val nSignup = ev.filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum == nSignup)
  }

  test("q233: deletion sweep rows are internally consistent") {
    val rows = Diagnostics.deletionSweep(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("cluster_labels", "clusters", "documents",
      "neardup_pairs", "token_shards"))
    val nDel = Tables.load(spark, sf001, "documents")
      .filter(col("doc_id") % 17 === 0).count()
    assert(rows("documents") == (nDel, nDel))
    // blast radius dominates the deleted members inside clusters
    assert(rows("clusters")._1 >= rows("clusters")._2)
    // stale labels: each distinct deleted label names >= 1 member row
    assert(rows("cluster_labels")._1 >= rows("cluster_labels")._2)
    assert(rows("token_shards")._2 == nDel)
  }

  test("q234: ESS is bounded by the sample size and matches efficiency") {
    val rows = Sampling.dsirEss(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, ess, eff, mws) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(ess >= 1.0 - 1e-9 && ess <= n + 1e-6,
        s"ESS $ess outside [1, $n]")
      assert(math.abs(eff - ess / n) < 1e-4)
      assert(mws > 0.0 && mws <= 1.0)
    }
  }

  test("q235: CUPED covers the cohort and never hurts variance") {
    val r = Events.cuped(spark, sf001).collect().head
    val nUsers = Events.loadEvents(spark, sf001)
      .select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(1) == nUsers)
    // with theta = cov/var the adjustment removes rho^2 >= 0 variance
    assert(r.getDouble(5) >= -1e-9, "optimal theta cannot add variance")
    assert(!r.getDouble(6).isNaN && !r.getDouble(7).isNaN)
  }

  test("q236: log-rank expectations conserve the observed events") {
    val rows = Events.logRank(spark, sf001).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("arm_a", "arm_b"))
    val (oSum, eSum) = (rows.map(_.getLong(2)).sum,
      rows.map(_.getDouble(3)).sum)
    assert(math.abs(oSum - eSum) < 1e-3,
      "expected events must redistribute, not invent, the observed total")
    val chi2s = rows.map(_.getDouble(4)).distinct
    assert(chi2s.length == 1 && chi2s.head >= 0.0)
    // arms partition the signup cohort
    val nSignup = Events.loadEvents(spark, sf001)
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nSignup)
  }

  test("q237: both baselines score the same backtest days; sMAPE bounded") {
    val rows = Events.forecastBacktest(spark, sf001).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("naive", "seasonal_naive"))
    assert(rows.map(_.getLong(1)).distinct.length == 1,
      "methods must backtest the identical day set")
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0)                       // MAE
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 2.0) // sMAPE
    }
  }

  test("q226: the epoch planner conserves the budget identity per source") {
    val rows = Sampling.epochPlanner(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (target, needed, servedE) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (served, shortfall, capped) =
        (r.getLong(5), r.getLong(6), r.getBoolean(7))
      assert(servedE <= Sampling.EpochCap * 1000000L)
      assert(servedE == math.min(needed, Sampling.EpochCap * 1000000L))
      // served + shortfall reassembles the target share — EXACT integers
      assert(served + shortfall == target)
      if (!capped) assert(shortfall == 0L)
      if (capped) assert(needed >= Sampling.EpochCap * 1000000L)
    }
  }
}
