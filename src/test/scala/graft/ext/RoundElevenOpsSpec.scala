package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-11 operators the row-hash oracle can't
  * express: q273 (composed IVF-PQ serving index over raw vs whitened
  * coords) must EXECUTE the decision the q266/q268/q269/q272 audits
  * priced — on the planted anisotropic fixture where whitening
  * flattens the lists, the composed whitened index has to serve
  * better recall without paying more scanned rows than the raw one. */
class RoundElevenOpsSpec extends SparkSpec {
  import spark.implicits._

  /** The q269/q272 herding fixture: a dominant ±40 axis herds the
    * raw-space IVF assignment onto two hot lists, while the whitened
    * space spreads the same corpus evenly. */
  private def herded(n: Int) = {
    val dim = Similarity.Dim
    (0 until n).map { i =>
      val amp = 0.2 + 1.8 * (((i * 13) % 17) / 16.0)
      val v = Array.tabulate(dim)(d =>
        (amp * (((i * 31 + d * 17) % 19) - 9) / 9.0).toFloat)
      v(0) = if (i % 2 == 0) 40.0f else -40.0f
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("q273: shape invariants hold on the herded fixture") {
    val rows = Similarity.ivfPqOn(spark, herded(400)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val (raw, white) =
      (rows.filter(_._1 == "raw"), rows.filter(_._1 == "white"))
    assert(raw.length == Similarity.NQueries &&
      white.length == Similarity.NQueries)
    rows.foreach { r =>
      assert(r._4 == Similarity.TopK, s"gt_k must be k: $r")
      assert(r._5 >= 0 && r._5 <= r._4, s"hits out of range: $r")
      assert(r._3 >= r._5 && r._3 <= 399, s"scanned out of range: $r")
      assert(r._6 >= 0.0 && r._6 <= 1.0, s"recall out of range: $r")
    }
  }

  test("q273: the composed whitened index executes the priced decision") {
    // the round-10 verdict ask verbatim: on the planted anisotropic
    // fixture the composed whitened index must BEAT raw IVF-PQ on
    // recall at no more scanned rows — q272 showed the raw index only
    // holds recall by over-scanning its hot lists; adding PQ on top,
    // the raw residuals also quantize worse (the dominant axis eats
    // the codebook, q266's effect), so both margins must be visible
    val rows = Similarity.ivfPqOn(spark, herded(400)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val raw = rows.filter(_._1 == "raw")
    val white = rows.filter(_._1 == "white")
    val rawRecall = raw.map(_._4).sum.toDouble / (raw.length * 10)
    val whiteRecall = white.map(_._4).sum.toDouble / (white.length * 10)
    val rawScan = raw.map(_._3).sum.toDouble / raw.length
    val whiteScan = white.map(_._3).sum.toDouble / white.length
    assert(whiteRecall > rawRecall,
      s"whitened IVF-PQ must serve better recall on anisotropic input: " +
        s"white=$whiteRecall raw=$rawRecall")
    assert(whiteScan <= rawScan,
      s"...at no more scanned rows: white=$whiteScan raw=$rawScan")
  }

  test("q274: refresh fires at exactly the planted rotation event") {
    val dim = Similarity.Dim
    // batches 0-3: dominant axis 0 (scaled 4x over a busy base) —
    // the cumulative dominant holds, no refresh after bootstrap;
    // from batch 4 on: a strong constant axis-1 cohort per batch
    // whose variance overtakes axis 0 — the cumulative dominant
    // ROTATES at snapshot 4, the staleness gate trips, version 2
    // derives there, and snapshots 5-7 are stable vs the REFRESHED
    // model (the recovery the lifecycle exists to produce)
    val healthy = (0 until 80).map { i =>
      val v = Array.tabulate(dim)(d =>
        ((((i * 31 + d * 17) % 19) - 9) / 9.0).toFloat)
      v(0) = v(0) * 4.0f
      (i.toLong, v.toSeq)
    }
    val rotated = (80 until 160).map { i =>
      val v = Array.fill(dim)(0.0f); v(1) = 50.0f
      (i.toLong, v.toSeq)
    }
    val planted = (healthy ++ rotated).toDF("vec_id", "embedding")
    val rows = Similarity.modelRefreshOn(spark, planted).collect()
      .map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getBoolean(4), r.getLong(5)))
    assert(rows.length == 8 * Similarity.WhitenK)
    val byBatch = rows.groupBy(_._1).toSeq.sortBy(_._1).map(_._2)
    // one version row-set per batch, k = 1..WhitenK
    byBatch.foreach { b =>
      assert(b.map(_._5).sorted.toSeq ==
        (1L to Similarity.WhitenK.toLong))
      assert(b.map(_._2).distinct.length == 1, "one version per batch")
    }
    val perBatch = byBatch.map(b => (b.head._1, b.head._2, b.head._3,
      b.head._4))
    assert(perBatch(0) == ((0L, 1L, None, true)), "bootstrap is version 1")
    (1 to 3).foreach { b =>
      assert(perBatch(b)._2 == 1L && !perBatch(b)._4,
        s"healthy snapshot $b must keep version 1: ${perBatch(b)}")
      assert(perBatch(b)._3.get > Similarity.RefreshStability,
        s"healthy stability must clear the gate: ${perBatch(b)}")
    }
    assert(perBatch(4)._4 && perBatch(4)._2 == 2L,
      s"refresh must fire at the planted event: ${perBatch(4)}")
    assert(perBatch(4)._3.get < Similarity.RefreshStability,
      s"the firing stability must be below the gate: ${perBatch(4)}")
    (5 to 7).foreach { b =>
      assert(perBatch(b)._2 == 2L && !perBatch(b)._4,
        s"post-refresh snapshot $b must keep version 2: ${perBatch(b)}")
      assert(perBatch(b)._3.get > 0.99,
        s"post-refresh stability must recover: ${perBatch(b)}")
    }
  }

  test("q274: the versioned spectrum is the active model's, not the batch's") {
    // on the same fixture, batches 1-3 must carry version 1's λs
    // (derived at batch 0) even though their own cumulative spectra
    // differ — consumers keyed by version read model parameters, not
    // per-snapshot diagnostics
    val dim = Similarity.Dim
    val healthy = (0 until 80).map { i =>
      val v = Array.tabulate(dim)(d =>
        ((((i * 31 + d * 17) % 19) - 9) / 9.0).toFloat)
      v(0) = v(0) * 4.0f
      (i.toLong, v.toSeq)
    }
    val rotated = (80 until 160).map { i =>
      val v = Array.fill(dim)(0.0f); v(1) = 50.0f
      (i.toLong, v.toSeq)
    }
    val planted = (healthy ++ rotated).toDF("vec_id", "embedding")
    val rows = Similarity.modelRefreshOn(spark, planted).collect()
      .map(r => (r.getLong(0), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6))))
    def spectrumOf(b: Long) =
      rows.filter(_._1 == b).sortBy(_._2).map(_._3).toSeq
    (1L to 3L).foreach { b =>
      assert(spectrumOf(b) == spectrumOf(0L),
        s"batch $b must serve version 1's spectrum")
    }
    (5L to 7L).foreach { b =>
      assert(spectrumOf(b) == spectrumOf(4L),
        s"batch $b must serve version 2's spectrum")
    }
    assert(spectrumOf(0L) != spectrumOf(4L),
      "the refresh must actually change the model")
  }

  test("q275: reconciles with q270 when the probe retrieves everything") {
    // 49 IDENTICAL vectors: every cosine — seed scores, Lloyd
    // assignment, serving argmax — computes from the same fold on the
    // same bits, so every row picks the SAME winning list and every
    // probe set contains it -> the ANN pool IS the exact pool, so the
    // audit must read as a row-for-row q270 reconciliation: full
    // overlap, full agreement, zero score delta. (The pre-trained-K
    // version of this fixture planted 49 varied vectors to get one
    // modulus-sampled centroid; the trained fixed-K codebook makes
    // single-list coverage plantable only through exact ties.)
    val dim = Similarity.Dim
    val shared = Array.tabulate(dim)(d => (((d * 17) % 19) - 9) / 9.0f)
    val embs = (0 until 49).map(i => (i.toLong, shared.toSeq))
      .toDF("vec_id", "embedding")
    val rows = Similarity.annRerankOn(spark, embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == Similarity.NQueries)
    rows.foreach { r =>
      assert(r._2 == Similarity.RerankPool.toLong,
        s"forced-exact pool must fully overlap: $r")
      assert(r._3 == Similarity.TopK.toLong,
        s"forced-exact plain top-k must agree: $r")
      assert(r._4 == Similarity.TopK.toLong,
        s"forced-exact MMR picks must agree: $r")
      assert(r._5 == 0L, s"forced-exact score delta must be zero: $r")
    }
  }

  test("q275: the audit discriminates when the probe misses") {
    // the herded fixture: raw-space probes miss part of the exact
    // pool, so at least one query must show the loss — and every
    // count stays inside its bounds
    val rows = Similarity.annRerankOn(spark, herded(400)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == Similarity.NQueries)
    rows.foreach { r =>
      assert(r._2 >= 0 && r._2 <= Similarity.RerankPool.toLong,
        s"pool_overlap out of range: $r")
      assert(r._3 >= 0 && r._3 <= Similarity.TopK.toLong,
        s"topk_agree out of range: $r")
      assert(r._4 >= 0 && r._4 <= Similarity.TopK.toLong,
        s"mmr_agree out of range: $r")
      assert(r._4 <= r._2, s"picks can only agree inside the overlap: $r")
    }
    assert(rows.exists(r => r._2 < Similarity.RerankPool.toLong),
      "the herded probe must miss part of at least one exact pool")
  }

  test("q276: frozen quantizers pay recall exactly when the arrival drifts") {
    val dim = Similarity.Dim
    // drifted arrival: batches 0-6 live on a busy axis-0-dominant
    // distribution; batch 7 (the last eighth of ids) is a new region
    // on axis 1 with FOUR well-separated subclusters (±axis-2/3
    // offsets, ~30° apart after normalization). The frozen PQ books
    // never saw this residual geometry — their codewords collapse
    // the subcluster axes, so ADC confuses subclusters — while the
    // rebuilt books learn codewords that separate them; GT for an
    // arrival query is its own subcluster, so the gap is recall. A
    // first-draft tight single-cluster arrival showed NO gap: the
    // within-cohort GT order was noise below ANY book's resolution,
    // and both arms tied — staleness only costs recall when the new
    // region has structure worth quantizing.
    val standing = (0 until 280).map { i =>
      val v = Array.tabulate(dim)(d =>
        ((((i * 31 + d * 17) % 19) - 9) / 9.0).toFloat)
      v(0) = v(0) * 4.0f
      (i.toLong, v.toSeq)
    }
    val arrived = (280 until 320).map { i =>
      val v = Array.tabulate(dim)(d =>
        (0.05 * ((((i * 7 + d * 3) % 11) - 5) / 5.0)).toFloat)
      v(1) = 50.0f
      v(2) = if (i % 2 == 0) 20.0f else -20.0f
      v(3) = if ((i / 2) % 2 == 0) 20.0f else -20.0f
      (i.toLong, v.toSeq)
    }
    val drifted = (standing ++ arrived).toDF("vec_id", "embedding")
    val rows = Similarity.ivfPqMaintainOn(spark, drifted).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val frozen = rows.filter(_._1 == "frozen")
    val rebuilt = rows.filter(_._1 == "rebuilt")
    assert(frozen.length == Similarity.NQueries &&
      rebuilt.length == Similarity.NQueries)
    rows.foreach { r =>
      assert(r._4 == Similarity.TopK, s"gt_k must be k: $r")
      assert(r._5 >= 0 && r._5 <= r._4, s"hits out of range: $r")
    }
    val fRecall = frozen.map(_._5).sum
    val rRecall = rebuilt.map(_._5).sum
    assert(rRecall > fRecall,
      s"drifted arrival must cost the frozen index recall: " +
        s"frozen=$fRecall rebuilt=$rRecall (of ${8 * 10})")

    // same-distribution arrival: batch 7 drawn from the standing
    // recipe — incremental maintenance must be (near-)free
    val same = (0 until 320).map { i =>
      val v = Array.tabulate(dim)(d =>
        ((((i * 31 + d * 17) % 19) - 9) / 9.0).toFloat)
      v(0) = v(0) * 4.0f
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val rows2 = Similarity.ivfPqMaintainOn(spark, same).collect()
      .map(r => (r.getString(0), r.getLong(4)))
    val fHits = rows2.filter(_._1 == "frozen").map(_._2).sum
    val rHits = rows2.filter(_._1 == "rebuilt").map(_._2).sum
    assert(fHits >= rHits - 8,
      s"same-distribution arrival must keep frozen ~free: " +
        s"frozen=$fHits rebuilt=$rHits")
  }

  test("q273: degenerate model masks the white space NULL") {
    // all-constant corpus: zero covariance, no retained component —
    // the white arm must emit one NULL-metric row per query, raw
    // must still serve (the q272 degenerate discipline)
    val dim = Similarity.Dim
    val flat = (0 until 60).map { i =>
      (i.toLong, Seq.fill(dim)(1.0f))
    }.toDF("vec_id", "embedding")
    val rows = Similarity.ivfPqOn(spark, flat).collect()
    val white = rows.filter(_.getString(0) == "white")
    assert(white.length == Similarity.NQueries)
    white.foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5),
        s"degenerate white row must be NULL-masked: $r")
    }
    val raw = rows.filter(_.getString(0) == "raw")
    assert(raw.length == Similarity.NQueries)
  }
}
