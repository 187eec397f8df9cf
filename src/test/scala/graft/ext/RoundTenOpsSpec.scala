package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for q264 (PCA whitening application) and q265
  * (incremental covariance drift monitor) the row-hash oracle can't
  * express, plus two fixture premises the cross-engine twins rest on
  * (advisor findings, round 9).
  *
  * The q264 planted-spectrum property is the round-10 verdict ask
  * verbatim: on a planted anisotropic rank-r fixture, post-whitening
  * effective rank — measured with the SHIPPED q262 kernel, not a
  * private reimplementation — must rise toward min(D, rank) = r and
  * the top-1 share must drop to ~1/r. */
class RoundTenOpsSpec extends SparkSpec {
  import spark.implicits._

  private val allSfDirs =
    Seq(sf001, "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  /** Planted rank-3 anisotropic embeddings: three deterministic,
    * near-uncorrelated integer patterns on axes 0-2 with well-
    * separated scales (variance ratio ~4x between components, so the
    * 8-step power iteration converges to ~(1/4)^8 per component),
    * zeros everywhere else. */
  private def plantedRank3(n: Int) = {
    val dim = Similarity.Dim
    (0 until n).map { i =>
      val a = ((i * 37) % 21 - 10) / 10.0 * 3.0
      val b = ((i * 53) % 17 - 8) / 8.0 * 1.5
      val c = ((i * 71) % 13 - 6) / 6.0 * 0.7
      val v = Array.fill(dim)(0.0f)
      v(0) = a.toFloat; v(1) = b.toFloat; v(2) = c.toFloat
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  /** Effective rank + top-1 share of a vector frame, via the SHIPPED
    * q262 kernel chain (quantize -> GramMatrix -> shared cell
    * expression -> participation ratio), at the frame's own dim. */
  private def rankOf(vecs: Seq[Seq[Double]], dim: Int): (Double, Double) = {
    val g = vecs.toDF("raw")
      .select(transform(col("raw"),
        e => round(e * Similarity.CovScale).cast("long")).as("qv"))
      .as[Seq[Long]]
      .select(new graft.functions.GramMatrix(dim).toColumn)
      .head()
    val (a, _) = Similarity.gramToCov(g, dim)
    val trace = Similarity.covTrace(a)
    val fro2 = Similarity.fro2Of(a)
    val top = Similarity.deflatedSpectrum(a, 1).head._2
    (trace * trace / fro2, top / trace)
  }

  test("q264: planted rank-3 spectrum — NULL beyond rank, ER rises to rank") {
    val dim = Similarity.Dim
    val planted = plantedRank3(200)
    val rows = Similarity.pcaWhitenOn(spark, planted)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 200, "map-only: one output row per vector")

    // components beyond the planted rank are NOT applied: their
    // deflation residual is float noise ~trace*1e-14, far under the
    // WhitenEps floor, so w3..w7 are NULL for every row
    rows.foreach { r =>
      (3 until Similarity.WhitenK).foreach(k =>
        assert(r.isNullAt(1 + k), s"w$k should be NULL beyond rank: $r"))
      (0 until 3).foreach(k =>
        assert(!r.isNullAt(1 + k), s"w$k should be retained: $r"))
    }

    // pre-whitening the planted spectrum is collapsed (scales 3.0 /
    // 1.5 / 0.7 -> ER ~ 1.6); post-whitening, measured with the same
    // shipped q262 kernel over the retained columns, it must rise to
    // ~min(D, rank) = 3 and the top-1 share must drop to ~1/3
    val pre = planted.collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val (erPre, t1Pre) = rankOf(pre, dim)
    assert(erPre < 2.2, s"planted fixture not anisotropic: erPre=$erPre")
    assert(t1Pre > 0.5, s"planted top-1 share too weak: $t1Pre")

    val post = rows.map(r => Seq(r.getDouble(1), r.getDouble(2),
      r.getDouble(3))).toSeq
    val (erPost, t1Post) = rankOf(post, 3)
    assert(erPost > 2.97 && erPost <= 3.0 + 1e-6,
      s"post-whitening ER must reach min(D, rank)=3: $erPost")
    assert(math.abs(t1Post - 1.0 / 3) < 0.02,
      s"post-whitening top-1 share must drop to ~1/rank: $t1Post")
    assert(erPost > erPre + 1.0,
      s"whitening must visibly raise ER: $erPre -> $erPost")
  }

  test("q264: corpus fixture — full retention, unit variance per component") {
    val rows = Similarity.pcaWhiten(spark, sf001).collect()
    assert(rows.length == 500)
    // the real fixture is full-rank: every swept component clears the
    // eps floor, so no column is NULL
    rows.foreach { r =>
      (0 until Similarity.WhitenK).foreach(k =>
        assert(!r.isNullAt(1 + k), s"corpus component $k dropped: $r"))
    }
    // whitened coordinates have ~unit variance (up to power-iteration
    // convergence and the round(6) edge) and ~zero mean
    (0 until Similarity.WhitenK).foreach { k =>
      val xs = rows.map(_.getDouble(1 + k))
      val m = xs.sum / xs.length
      val v = xs.map(x => (x - m) * (x - m)).sum / xs.length
      assert(math.abs(m) < 1e-3, s"w$k mean not ~0: $m")
      assert(math.abs(v - 1.0) < 0.05, s"w$k variance not ~1: $v")
    }
  }

  test("q265: batched merge equals one-pass, collapsed batch bends the curve") {
    val dim = Similarity.Dim
    // batches 0-6: spread across all 64 axes (healthy); batch 7: one
    // repeated vector (a collapsed ingest batch, the failure q265
    // exists to catch). N=160, B=8 -> width 20.
    val healthy = (0 until 140).map { i =>
      val v = Array.tabulate(dim)(d => (((i * 31 + d * 17) % 19) - 9) / 9.0f)
      (i.toLong, v.toSeq)
    }
    val collapsed = (140 until 160).map { i =>
      val v = Array.fill(dim)(0.0f); v(0) = 20.0f
      (i.toLong, v.toSeq)
    }
    val planted = (healthy ++ collapsed).toDF("vec_id", "embedding")
    val rows = Similarity.gramDriftOn(spark, planted)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == (0L until 8L),
      "one snapshot per ingest batch, densely numbered")
    assert(rows.map(_.getLong(1)).toSeq == (1 to 8).map(_ * 20L),
      "cumulative vector count must step by the batch width")

    // the collapsed batch must bend effective rank DOWN at exactly its
    // snapshot, after a stable healthy prefix
    val ers = rows.map(_.getDouble(3))
    assert(ers(7) < ers(6) - 1.0,
      s"collapsed batch must visibly drop ER: ${ers.mkString(", ")}")
    assert(ers.take(7).forall(_ > ers(7)),
      "every healthy snapshot outranks the post-collapse one")

    // final snapshot == the unbatched one-pass fold of the whole frame:
    // batching + integer merge must lose nothing
    val (nAll, traceAll, erAll) =
      Similarity.gramSnapshot(Similarity.quantizedGramOf(spark, planted))
    assert(rows(7).getLong(1) == nAll)
    assert(math.abs(rows(7).getDouble(2) - traceAll) < 1e-5)
    assert(math.abs(rows(7).getDouble(3) - erAll.get) < 1e-5)
  }

  test("q266: whitened int8 copy quantizes strictly better on anisotropy") {
    val dim = Similarity.Dim
    // strong single-axis anisotropy over an otherwise-busy base: axis
    // 0 is 40x the rest, so its max sets the int8 step for EVERY axis
    // and the raw copy quantizes the other 63 coarsely (distortion
    // ~1e-3, far above the round(6) grid — the first draft planted a
    // 3-axis 4x spectrum whose distortions tied at 3e-6); the
    // whitened copy equalizes per-axis scale
    val planted = (0 until 200).map { i =>
      val v = Array.tabulate(dim)(d =>
        ((((i * 31 + d * 17) % 19) - 9) / 9.0).toFloat)
      v(0) = v(0) * 40.0f
      (i.toLong, v.toSeq, (i % 4).toLong)
    }.toDF("vec_id", "embedding", "label")
    val rows = Similarity.whitenPayoffOn(spark, planted).collect()
    assert(rows.length == 4, "one row per planted label")
    rows.foreach { r =>
      val (raw, wh) = (r.getDouble(2), r.getDouble(3))
      assert(raw > 0, s"planted anisotropy must cost the raw copy: $r")
      assert(wh < raw,
        s"whitened copy must quantize strictly better: $r")
      assert(!r.isNullAt(4) && r.getDouble(4) > 1.0,
        s"distortion_gain must exceed 1 on anisotropic input: $r")
    }
    // the audit measures the SHIPPED kernels: distortions are honest
    // cosine losses, bounded by [0, 1]
    rows.foreach { r =>
      Seq(r.getDouble(2), r.getDouble(3)).foreach(d =>
        assert(d >= 0.0 && d <= 1.0, s"distortion out of range: $r"))
    }
  }

  test("q267: rotation event dips stability at exactly its snapshot") {
    val dim = Similarity.Dim
    // batches 0-6: dominant axis 0 (scaled 4x over a busy base) ->
    // the cumulative dominant component is stable; batch 7: a strong
    // constant axis-1 cohort whose between-group variance overtakes
    // axis 0 -> the cumulative dominant ROTATES at snapshot 7 while
    // the spectrum's shape story stays q265's
    val healthy = (0 until 140).map { i =>
      val v = Array.tabulate(dim)(d =>
        ((((i * 31 + d * 17) % 19) - 9) / 9.0).toFloat)
      v(0) = v(0) * 4.0f
      (i.toLong, v.toSeq)
    }
    val rotated = (140 until 160).map { i =>
      val v = Array.fill(dim)(0.0f); v(1) = 50.0f
      (i.toLong, v.toSeq)
    }
    val planted = (healthy ++ rotated).toDF("vec_id", "embedding")
    val rows = Similarity.rotationDriftOn(spark, planted)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == (0L until 8L))
    assert(rows.head.isNullAt(2), "first snapshot has no predecessor")
    (1 to 6).foreach { b =>
      assert(rows(b).getDouble(2) > 0.99,
        s"healthy snapshot $b must hold the basis: ${rows(b)}")
    }
    assert(rows(7).getDouble(2) < 0.5,
      s"rotation event must dip stability at snapshot 7: ${rows(7)}")
    // the dominant share after the event belongs to the NEW axis and
    // is large; every stability is a valid |cos|
    assert(rows(7).getDouble(3) > rows(6).getDouble(3),
      "the rotating cohort must raise the top-1 share")
    rows.drop(1).foreach(r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.000001,
        s"stability out of range: $r"))
    // n_vectors_cum reconciles with q265's (shared cumulative pass)
    val q265n = Similarity.gramDriftOn(spark, planted)
      .collect().sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
    assert(rows.map(_.getLong(1)).toSeq == q265n)
  }

  test("fixture premise: documents.text carries no vertical tab (\\x0B)") {
    // Java \s matches \x0B, RE2 (DuckDB string_split_regex) \s does
    // not — every whitespace-tokenizing twin (q12/q156/q260/q261...)
    // rests on the corpus not exercising the divergence. Pin it at
    // every gate SF instead of rewriting ~30 proven regexes.
    allSfDirs.foreach { dir =>
      val n = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("text").contains("\u000B")).count()
      assert(n == 0, s"$dir: $n documents contain \\x0B — the Java-vs-" +
        "RE2 \\s+ premise no longer holds; pin an explicit class")
    }
  }

  test("fixture premise: embeddings.label has no NULLs") {
    // q263 drops NULL labels symmetrically in both engines; the
    // fixture premise is that none exist, so the filter is inert
    allSfDirs.foreach { dir =>
      val n = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("label").isNull).count()
      assert(n == 0, s"$dir: $n NULL labels in embeddings")
    }
  }

  test("q268: raw int8 loses the planted fine ranking, whitened keeps it") {
    val dim = Similarity.Dim
    // A corpus whose NEIGHBOR SETS are decided by structure the raw
    // int8 grid cannot represent: axis 0 is a ±20 coarse split (it
    // sets the per-vector int8 step at 20/127 ~ 0.157 and dominates
    // cosine), axes 1-2 carry a ±1 / ±0.55 cell pattern plus an
    // 11-level jitter of step 0.014 — same-cell candidates (~38 per
    // cell, > k=10) are float-ranked by the jitter, which the raw
    // grid collapses to ~2 levels per axis while the whitened grid
    // (max|w| ~ 1.13 over 3 retained unit-variance components ->
    // step ~ 0.009) resolves every level.
    val planted = (0 until 304).map { i =>
      val v = Array.fill(dim)(0.0f)
      v(0) = if (i % 2 == 0) 20.0f else -20.0f
      val b1 = if (((i >> 1) & 1) == 0) 1.0 else -1.0
      val b2 = if (((i >> 2) & 1) == 0) 0.55 else -0.55
      v(1) = (b1 + 0.07 * (((i * 37) % 11) - 5) / 5.0).toFloat
      v(2) = (b2 + 0.07 * (((i * 53) % 11) - 5) / 5.0).toFloat
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val rows = Similarity.whitenRecallOn(spark, planted)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == Similarity.NQueries)
    rows.foreach { r =>
      assert(r.getLong(1) == Similarity.TopK, s"gt_k must be k: $r")
      assert(!r.isNullAt(4) && !r.isNullAt(5),
        s"planted rank-3 model must retain components: $r")
      Seq(r.getDouble(3), r.getDouble(5)).foreach(rec =>
        assert(rec >= 0.0 && rec <= 1.0, s"recall out of range: $r"))
    }
    val raw = rows.map(_.getDouble(3))
    val wh = rows.map(_.getDouble(5))
    // per query the whitened copy never serves a worse top-k, and on
    // average the gap is the operator's whole point
    rows.indices.foreach(i =>
      assert(wh(i) >= raw(i),
        s"query $i: whitened recall ${wh(i)} < raw ${raw(i)}"))
    assert(wh.sum / wh.length > 0.85,
      s"whitened grid must resolve the jitter: ${wh.mkString(", ")}")
    assert(raw.sum / raw.length < wh.sum / wh.length - 0.2,
      s"raw grid must visibly lose the ranking: raw=${raw.mkString(", ")}" +
        s" white=${wh.mkString(", ")}")
  }

  test("q269: anisotropy herds raw IVF lists, whitening spreads them") {
    val dim = Similarity.Dim
    // a bimodal dominant axis (±40 by parity) over a busy base with
    // HETEROGENEOUS residual norms (per-vector amplitude 0.2..2.0 —
    // clean vs noisy rows, the shape real embedding corpora have):
    // in raw space every same-sign vector is nearly parallel, so the
    // v-INDEPENDENT |centroid| bias — the same-sign centroid with the
    // smallest residual norm maximizes the shared 1600/(|v||c|) term
    // for EVERY query — herds assignment onto ~one hot list per sign;
    // whitening scales the shared axis to ±1, the residual axes take
    // over, and the census follows the informative directions
    val planted = (0 until 400).map { i =>
      val amp = 0.2 + 1.8 * (((i * 13) % 17) / 16.0)
      val v = Array.tabulate(dim)(d =>
        (amp * (((i * 31 + d * 17) % 19) - 9) / 9.0).toFloat)
      v(0) = if (i % 2 == 0) 40.0f else -40.0f
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val rows = Similarity.whitenBalanceOn(spark, planted)
      .collect().sortBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq == Seq("raw", "white"))
    val Array(raw, white) = rows
    // shared protocol invariants: same codebook size, full census
    assert(raw.getLong(1) == Similarity.IvfK &&
      white.getLong(1) == raw.getLong(1))
    assert(raw.getLong(2) == 400 && white.getLong(2) == 400)
    // Cauchy-Schwarz floor in both spaces (1.0 = perfectly balanced)
    Seq(raw, white).foreach(r =>
      assert(r.getDouble(5) >= 1.0 - 1e-9,
        s"imbalance factor below its floor: $r"))
    // the payoff: the whitened census is strictly flatter, by enough
    // to matter for probe cost, and its hot list shrinks
    assert(white.getDouble(5) < raw.getDouble(5) - 0.2,
      s"whitening must flatten the census: raw=$raw white=$white")
    assert(white.getLong(3) < raw.getLong(3),
      s"whitening must shrink the hot list: raw=$raw white=$white")
    assert(raw.getDouble(5) > 1.3,
      s"planted anisotropy must visibly herd raw assignment: $raw")
  }

  test("q270: MMR diversifies where plain top-k drowns in near-duplicates") {
    val dim = Similarity.Dim
    // 4 orthogonal topic axes over a shared base axis, 20 members
    // each, with a small per-id jitter axis: within-topic sims ~0.99+
    // (near-duplicates), cross-topic ~0.08 (the shared axis) — plain
    // top-10 for any query is pure own-topic; MMR's novelty penalty
    // cancels the own-topic relevance after the first pick and the
    // rerank spreads across topics
    val planted = (0 until 80).map { i =>
      val v = Array.fill(dim)(0.0f)
      v(0) = 0.3f
      v(8 + i % 4) = 1.0f
      v(40 + i % 16) = 0.05f
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val rows = Similarity.mmrRerankOn(spark, planted)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == (0L until Similarity.NQueries).toSet)
    val vecs = planted.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def topic(id: Long): Long = id % 4
    byQ.foreach { case (qid, picks) =>
      val ordered = picks.sortBy(_._2)
      assert(ordered.length == Similarity.TopK)
      assert(ordered.map(_._3).distinct.length == ordered.length,
        s"q$qid: duplicate picks")
      // rank 1 is pure relevance: the plain argmax (rel DESC, id)
      val plainBest = vecs.keys.filter(_ != qid).toSeq
        .map(i => (i, graft.functions.VectorKernels.cosine(vecs(qid), vecs(i))))
        .minBy { case (i, rel) => (-rel, i) }._1
      assert(ordered.head._3 == plainBest,
        s"q$qid: rank 1 must equal the plain top-1")
      // plain top-10 is single-topic (the failure MMR exists to fix)
      val plain10 = vecs.keys.filter(_ != qid).toSeq
        .map(i => (i, graft.functions.VectorKernels.cosine(vecs(qid), vecs(i))))
        .sortBy { case (i, rel) => (-rel, i) }.take(Similarity.TopK)
      assert(plain10.map(p => topic(p._1)).distinct.length == 1,
        s"q$qid: fixture broken — plain top-k should be one topic")
      // the rerank spreads across topics
      val topics = ordered.map(p => topic(p._3)).distinct
      assert(topics.length >= 3,
        s"q$qid: MMR must diversify, got topics ${topics.mkString(",")}")
      // pick scores are non-increasing (novelty only grows, the
      // candidate set only shrinks)
      ordered.map(_._4).sliding(2).foreach { case Array(a, b) =>
        assert(b <= a + 1e-9, s"q$qid: scores must be non-increasing")
      }
    }
  }

  test("q271: the rerank tradeoff is visible — relevance down, coverage up") {
    val dim = Similarity.Dim
    // the q270 topic fixture with label = topic: plain top-10 is pure
    // own-label (10/10 same, 1 label); MMR trades some same-label
    // picks for cross-label coverage — exactly what the audit exists
    // to quantify
    val planted = (0 until 80).map { i =>
      val v = Array.fill(dim)(0.0f)
      v(0) = 0.3f
      v(8 + i % 4) = 1.0f
      v(40 + i % 16) = 0.05f
      (i.toLong, v.toSeq, (i % 4).toLong)
    }.toDF("vec_id", "embedding", "label")
    val rows = Similarity.rerankTradeoffOn(spark, planted)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == Similarity.NQueries)
    rows.foreach { r =>
      val qid = r.getLong(0)
      assert(r.getLong(1) == qid % 4, s"query label must be its topic: $r")
      assert(r.getLong(2) == Similarity.TopK,
        s"plain top-k must be pure own-label on the fixture: $r")
      assert(r.getLong(3) == 1,
        s"plain top-k must cover exactly one label: $r")
      assert(r.getLong(5) >= 3,
        s"MMR must raise label coverage: $r")
      assert(r.getLong(4) < Similarity.TopK,
        s"the coverage gain must cost same-label picks: $r")
      assert(r.getLong(4) >= 1,
        s"rank 1 is pure relevance, so at least one same-label pick: $r")
    }
    // reconciliation with q270: same-label counts and coverage derive
    // from the SAME picks the rerank emits
    val picks = Similarity.mmrRerankOn(spark, planted)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    rows.foreach { r =>
      val qid = r.getLong(0)
      val mine = picks.filter(_._1 == qid).map(_._2 % 4)
      assert(mine.count(_ == qid % 4) == r.getLong(4), s"same-label drift: $r")
      assert(mine.distinct.length == r.getLong(5), s"coverage drift: $r")
    }
  }

  test("q272: the herded raw index pays for its recall in scanned rows") {
    val dim = Similarity.Dim
    // the q269 herding fixture: raw-space assignment piles the corpus
    // onto few hot lists, so a fixed 3-probe budget happens to cover
    // almost everything relevant (recall stays high) BUT scans far
    // more rows per query; the whitened index spreads the lists and
    // serves its recall from a smaller probe footprint — the scan
    // column is the latency side of the q269 balance numbers
    val planted = (0 until 400).map { i =>
      val amp = 0.2 + 1.8 * (((i * 13) % 17) / 16.0)
      val v = Array.tabulate(dim)(d =>
        (amp * (((i * 31 + d * 17) % 19) - 9) / 9.0).toFloat)
      v(0) = if (i % 2 == 0) 40.0f else -40.0f
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val rows = Similarity.whitenIvfOn(spark, planted).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val (raw, white) = (rows.filter(_._1 == "raw"), rows.filter(_._1 == "white"))
    assert(raw.length == Similarity.NQueries &&
      white.length == Similarity.NQueries)
    rows.foreach { r =>
      assert(r._4 == Similarity.TopK, s"gt_k must be k: $r")
      assert(r._5 <= r._4 && r._5 >= 0, s"hits out of range: $r")
      assert(r._3 >= r._5 && r._3 <= 399, s"scanned out of range: $r")
      assert(r._6 >= 0.0 && r._6 <= 1.0, s"recall out of range: $r")
    }
    // both indexes serve good recall on this fixture — the raw one
    // because its hot lists contain nearly everything
    assert(raw.map(_._6).sum / raw.length >= 0.95,
      s"raw recall collapsed unexpectedly: ${raw.mkString(", ")}")
    assert(white.map(_._6).sum / white.length >= 0.8,
      s"white recall collapsed unexpectedly: ${white.mkString(", ")}")
    // ...but the herded index pays in probe volume: same nprobe,
    // visibly more candidate rows scanned per query on average
    val rawScan = raw.map(_._3).sum.toDouble / raw.length
    val whiteScan = white.map(_._3).sum.toDouble / white.length
    assert(rawScan > whiteScan + 15.0,
      s"herding must cost scan volume: raw=$rawScan white=$whiteScan")
  }
}
