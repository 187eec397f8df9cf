package graft.ext

import graft.SparkSpec

/** Invariants for q258 (capped-SemDeDup recall audit) the row-hash
  * oracle can't express: recall is a true fraction of q132's ground
  * truth (≤ 1, equal to 1 exactly where the cap leaves a cluster
  * whole), the cap=SemDedupCap column reconciles row-for-row with
  * q257's shipped dup counts, and the ground-truth column reconciles
  * with q132 itself — the audit must MEASURE the shipped queries, not
  * a private reimplementation of them. */
class RoundNineOpsSpec extends SparkSpec {

  private lazy val rows =
    Similarity.semDedupCapRecall(spark, sf001).collect()

  test("q258: recall is bounded, exact on uncapped clusters") {
    assert(rows.nonEmpty, "fixture must produce audit rows")
    val caps = Similarity.SemDedupCapSweep
    assert(caps.contains(Similarity.SemDedupCap),
      "the sweep must bracket the cap q257 actually ships")
    val nClusters = rows.map(_.getLong(1)).distinct.length
    assert(rows.length == nClusters * caps.length,
      "one audit row per (cap, cluster)")
    rows.foreach { r =>
      val (cap, n, capped) = (r.getLong(0), r.getLong(2), r.getBoolean(3))
      val (full, cappedDups, missed) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(capped == (n > cap), s"capped flag wrong: $r")
      assert(cappedDups <= full, s"capped pass flagged MORE than full: $r")
      assert(missed == full - cappedDups, s"missed identity broken: $r")
      if (r.isNullAt(7))
        assert(full == 0, s"recall may be null only with no dups: $r")
      else {
        val recall = r.getLong(7)
        assert(recall <= 1000000L, s"recall > 1: $r")
        assert(recall == cappedDups * 1000000L / full,
          s"recall_ppm must be the floor-div of the counts: $r")
      }
      if (!capped) {
        // one shard => the capped pass IS the full pass
        assert(missed == 0, s"uncapped cluster missed dups: $r")
        if (full > 0)
          assert(r.getLong(7) == 1000000L,
            s"uncapped cluster must have recall exactly 1: $r")
      }
    }
    // the trade must be VISIBLE at fixture SF for at least one cap, or
    // the audit measures nothing (32 caps sf0.001's ~8x12-member
    // clusters into multiple shards)
    assert(rows.exists(_.getLong(6) > 0),
      "no cap missed any dup — the fixture no longer exercises the " +
        "cross-shard trade; shrink the smallest swept cap")
  }

  test("q259: spectrum invariants — unit loadings, PSD share, stability") {
    val dim = Similarity.Dim
    val rs = Similarity.covarianceSpectrum(spark, sf001).collect()
    assert(rs.length == dim, s"one row per dimension, got ${rs.length}")
    assert(rs.map(_.getLong(0)).toSeq == (0 until dim).map(_.toLong),
      "i must enumerate 0..D-1 in order")
    // the iterate is normalized every step, so the emitted loadings
    // are a unit vector up to round(6) noise (64 cells × 0.5e-6)
    val norm2 = rs.map(r => r.getDouble(1) * r.getDouble(1)).sum
    assert(math.abs(norm2 - 1.0) < 1e-4,
      s"loadings must be unit-norm, got |x|^2 = $norm2")
    val lambda = rs.map(_.getDouble(2)).distinct
    val explained = rs.map(_.getDouble(3)).distinct
    assert(lambda.length == 1 && explained.length == 1,
      "lambda_q/explained are per-corpus scalars, identical on every row")
    // covariance is PSD: 0 < lambda <= trace, so the share is a true
    // fraction; and the dominant-direction estimate should carry at
    // least the average per-dimension share on any non-degenerate
    // fixture
    assert(lambda.head > 0, "eigenvalue estimate must be positive")
    assert(explained.head > 0 && explained.head <= 1.0,
      s"explained share must be in (0, 1]: ${explained.head}")
    assert(explained.head >= 1.0 / dim,
      s"dominant share ${explained.head} below the 1/D isotropic floor")
    // deterministic: the fixed-K iterate from a fixed start is a pure
    // function of the corpus
    val again = Similarity.covarianceSpectrum(spark, sf001).collect()
    assert(rs.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "q259 must be bit-stable across runs")
  }

  test("q262: participation ratio is a true rank bound tied to q259") {
    val dim = Similarity.Dim
    val r = Similarity.effectiveRank(spark, sf001).collect()
    assert(r.length == 1, "one diagnostics row")
    val row = r.head
    val trace = row.getDouble(1)
    val (er, t1) = (row.getDouble(2), row.getDouble(3))
    assert(row.getLong(0) == dim)
    assert(trace > 0, s"PSD covariance: $row")
    // (Σλ)²/Σλ² is squeezed between 1 (fully collapsed) and D
    // (isotropic) for any PSD spectrum
    assert(er >= 1.0 - 1e-6 && er <= dim + 1e-6,
      s"effective rank $er escapes [1, $dim]")
    // top-1 share reconciles with q259's explained column exactly —
    // same iterate, same rounding
    val q259 = Similarity.covarianceSpectrum(spark, sf001)
      .collect().head.getDouble(3)
    assert(t1 == q259,
      s"q262 top1_share $t1 != q259 explained $q259")
    // consistency: a spectrum with effective rank R cannot give the
    // top component less than 1/R of the mass... (λ1 ≥ trace/D and
    // λ1² ≤ Σλ² ⇒ t1 ≥ 1/D and t1 ≤ 1/√er, both up to rounding)
    assert(t1 >= 1.0 / dim - 1e-6 && t1 <= 1.0 / math.sqrt(er) + 1e-3,
      s"top-1 share $t1 inconsistent with effective rank $er")
  }

  test("q263: per-label rank bounds, corpus partition, planted collapse") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dim = Similarity.Dim
    val rows = Similarity.labelRank(spark, sf001).collect()
    val corpus = graft.Tables.load(spark, sf001, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == corpus,
      "label counts must partition the corpus")
    rows.foreach { r =>
      val n = r.getLong(1)
      if (r.isNullAt(3))
        // NULL is reserved for the degenerate (zero-covariance) label
        assert(r.getDouble(2) == 0.0,
          s"er may be null only when the label's covariance is zero: $r")
      else {
        val er = r.getDouble(3)
        // participation ratio <= #nonzero eigenvalues <= rank of a
        // covariance built from n points <= n; and >= 1 always
        assert(er >= 1.0 - 1e-6 && er <= math.min(dim.toLong, n) + 1e-6,
          s"label ${r.getLong(0)}: er $er escapes [1, min(D, n=$n)]")
        assert(r.getDouble(2) > 0, s"PSD per-label covariance: $r")
      }
    }
    // planted spectra with KNOWN participation ratios: label 0's
    // vectors sit on ONE axis (rank-1 covariance => er exactly 1);
    // label 1 is the symmetric 4-point cross (covariance diag(.5, .5)
    // => er exactly 2). Both are exact in the quantized integer
    // domain, so the equality check carries no FP slack beyond
    // round(6).
    val planted = Seq(
      (1L, Array.tabulate(dim)(i => if (i == 0) 1.0f else 0f), 0),
      (2L, Array.tabulate(dim)(i => if (i == 0) 3.0f else 0f), 0),
      (3L, Array.tabulate(dim)(i => if (i == 0) 5.0f else 0f), 0),
      (4L, Array.tabulate(dim)(i => if (i == 0) 1.0f else 0f), 1),
      (5L, Array.tabulate(dim)(i => if (i == 0) -1.0f else 0f), 1),
      (6L, Array.tabulate(dim)(i => if (i == 1) 1.0f else 0f), 1),
      (7L, Array.tabulate(dim)(i => if (i == 1) -1.0f else 0f), 1),
      // a singleton label: zero covariance, er must be NULL (not NaN —
      // the twin's x/0 is NULL and NaN would flip the gate hash)
      (9L, Array.tabulate(dim)(i => if (i == 2) 4.0f else 0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val byLabel = Similarity.labelRankOn(spark, planted).collect()
      .map(r => r.getLong(0) -> r).toMap
    val got = byLabel.view.filterKeys(_ != 2L)
      .mapValues(_.getDouble(3)).toMap
    assert(math.abs(got(0L) - 1.0) < 1e-6,
      s"one-axis label must have effective rank exactly 1: ${got(0L)}")
    assert(math.abs(got(1L) - 2.0) < 1e-6,
      s"the symmetric cross must have effective rank exactly 2: ${got(1L)}")
    assert(byLabel(2L).isNullAt(3) && byLabel(2L).getDouble(2) == 0.0,
      s"singleton label must read NULL rank over a zero trace: ${byLabel(2L)}")
  }

  test("q260: chunk windows tile every document, hashes are content-true") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val (w, s) = (TextAnalysis.ChunkToks, TextAnalysis.ChunkStride)
    val ov = w - s
    assert(s < w, "stride must be < window or coverage gaps open")
    // a planted 50-token doc: exactly 2 chunks — the naive "while
    // start < n" rule would emit a third, fully-redundant 2-token tail
    // (tokens 48-49 are already inside chunk 1's 24-49 window)
    val text = (0 until 50).map(i => s"t$i").mkString(" ")
    val rows = TextAnalysis
      .tokenChunksOn(Seq((7L, text)).toDF("doc_id", "text"))
      .collect()
    assert(rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 0L, 32L), (1L, 24L, 26L)),
      s"planted-doc chunk geometry wrong: ${rows.mkString(";")}")
    val expect0 = Seq((0 until 32).map(i => s"t$i").mkString(" "))
      .toDF("c").select(Dedup.hash60(col("c"))).head().getLong(0)
    assert(rows(0).getLong(4) == expect0,
      "chunk 0's hash must be the hash of exactly its 32 tokens")
    // a doc shorter than the overlap still emits its single chunk
    val tiny = TextAnalysis
      .tokenChunksOn(Seq((8L, "a b c")).toDF("doc_id", "text")).collect()
    assert(tiny.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 0L, 3L)), s"tiny doc must emit one chunk: ${tiny.toSeq}")
    // fixture-wide coverage identity: the last chunk of every doc ends
    // exactly at the doc's token count, indices are dense from 0, and
    // every non-first chunk EXTENDS coverage (no redundant tails)
    val fix = TextAnalysis.tokenChunks(spark, sf001).collect()
      .groupBy(_.getLong(0))
    val nToks = graft.Tables.load(spark, sf001, "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"),
          t => length(t) > 0)).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fix.foreach { case (doc, cs) =>
      val n = nToks(doc)
      assert(cs.map(_.getLong(1)).sorted.toSeq == (0L until cs.length),
        s"doc $doc chunk indices not dense")
      assert(cs.length == math.max(1L, (n - ov + s - 1) / s),
        s"doc $doc: ${cs.length} chunks != max(1, ceil(($n-$ov)/$s))")
      assert(cs.map(r => r.getLong(2) + r.getLong(3)).max == n,
        s"doc $doc: chunks do not tile to the last token")
      assert(cs.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= w),
        s"doc $doc: chunk_toks out of [1, $w]")
      assert(cs.filter(_.getLong(1) > 0).forall(r => r.getLong(2) + ov < n),
        s"doc $doc: a non-first chunk adds no coverage")
    }
  }

  test("q261: boilerplate table reconciles with q260's hash multiset") {
    val chunks = TextAnalysis.tokenChunks(spark, sf001).collect()
    val byHash = chunks.groupBy(_.getLong(4))
    val expected = byHash.collect {
      case (h, cs) if cs.length > 1 =>
        h -> (cs.length.toLong, cs.map(_.getLong(0)).distinct.length.toLong)
    }
    val got = TextAnalysis.chunkDedup(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected,
      "q261 must be exactly q260's repeated-hash aggregation")
    got.values.foreach { case (nc, nd) =>
      assert(nc > 1 && nd <= nc, s"counts inconsistent: $nc, $nd")
    }
    assert(got.nonEmpty,
      "fixture has no repeated chunk — the detector is untestable; " +
        "re-check window size against the near-dup structure")
  }

  test("q258: cap=SemDedupCap column reconciles with q257, ground truth with q132") {
    val shipCap = Similarity.SemDedupCap
    val atShip = rows.filter(_.getLong(0) == shipCap)
      .map(r => r.getLong(1) -> r.getLong(5)).toMap
    val q257 = Similarity.semDedupCapped(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(atShip.keySet == q257.keySet, "cluster sets must agree")
    atShip.foreach { case (cid, dups) =>
      assert(dups == q257(cid),
        s"cid $cid: audit's cap=$shipCap dup count $dups != q257's " +
          s"${q257(cid)} — the audit is no longer measuring the " +
          s"shipped predicate")
    }
    val full = rows.filter(_.getLong(0) == shipCap)
      .map(r => r.getLong(1) -> r.getLong(4)).toMap
    val q132 = Similarity.semDedup(spark, sf001).collect()
      .filter(!_.getBoolean(4))
      .groupBy(_.getLong(1)).view.mapValues(_.length.toLong).toMap
    full.foreach { case (cid, f) =>
      assert(f == q132.getOrElse(cid, 0L),
        s"cid $cid: ground-truth dups $f != q132's flagged count " +
          s"${q132.getOrElse(cid, 0L)}")
    }
  }
}
