package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("repetition: repeated phrase dominates the dup fraction") {
    val spam = Array.fill(10)("buy cheap tokens now").mkString(" ")
    val clean = "each word here appears exactly once in this clean sentence"
    Seq((1L, spam), (2L, clean)).toDF("doc_id", "text")
      .createOrReplaceTempView("rep_docs")
    // drive the same logic over the tiny frame through the fixture entry
    val fix = TextAnalysis.repetition(spark, sf001)
    assert(fix.columns.toSeq ==
      Seq("doc_id", "n_ngrams", "dup_fraction", "top_ngram_count"))
    val byDoc = fix.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byDoc.values.forall(f => f >= 0.0 && f <= 1.0))
    // direct check on planted rows via the same trigram derivation
    val res = {
      val df = Seq((1L, spam), (2L, clean)).toDF("doc_id", "text")
      import org.apache.spark.sql.functions._
      val w = split(lower(col("text")), "\\s+")
      val g = df.select(col("doc_id"), w.as("w"))
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("w")) - 2),
          i => concat_ws(" ", element_at(col("w"), i),
            element_at(col("w"), i + 1), element_at(col("w"), i + 2)))).as("ng"))
      g.groupBy("doc_id", "ng").count()
        .groupBy("doc_id")
        .agg((sum(when(col("count") > 1, col("count")).otherwise(0L)).cast("double") /
          sum(col("count")).cast("double")).as("f"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    assert(res(1L) > 0.8, s"spam doc must score high, got ${res(1L)}")
    assert(res(2L) == 0.0, s"clean doc must score zero, got ${res(2L)}")
  }

  test("bpe candidates: within-word pairs counted, ties broken by pair") {
    val fix = TextAnalysis.bpeMergeCandidates(spark, sf001)
    assert(fix.columns.toSeq == Seq("pair", "n"))
    val rows = fix.collect()
    assert(rows.length <= TextAnalysis.BpeTopK)
    assert(rows.forall(r => r.getString(0).length == 2 && !r.getString(0).contains(" ")),
      "every candidate must be a 2-char within-word pair")
    val ns = rows.map(_.getLong(1))
    assert(ns.sameElements(ns.sorted(Ordering[Long].reverse)), "must be count-descending")
    rows.sliding(2).foreach {
      case Array(a, b) if a.getLong(1) == b.getLong(1) =>
        assert(a.getString(0) < b.getString(0), "ties must break ascending by pair")
      case _ =>
    }
    // planted corpus: "aaab" -> aa,aa,ab ; "a b" -> both pairs span the space
    val planted = Seq((1L, "aaab"), (2L, "a b")).toDF("doc_id", "text")
    import org.apache.spark.sql.functions._
    val got = planted
      .select(explode(transform(
        sequence(lit(1), length(col("text")) - 1),
        i => col("text").substr(i, lit(2)))).as("pair"))
      .filter(!col("pair").contains(" "))
      .groupBy("pair").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("aa" -> 2L, "ab" -> 1L), s"got $got")
  }

  test("vocab coverage: monotone curve ending near total token share") {
    val res = TextAnalysis.vocabCoverage(spark, sf001)
    assert(res.columns.toSeq == Seq("word", "n", "coverage"))
    val rows = res.collect()
    assert(rows.length <= TextAnalysis.VocabTopK)
    val cov = rows.map(_.getDouble(2))
    assert(cov.sameElements(cov.sorted), "coverage must be non-decreasing")
    assert(cov.forall(c => c > 0.0 && c <= 1.0))
    val ns = rows.map(_.getLong(1))
    assert(ns.sameElements(ns.sorted(Ordering[Long].reverse)),
      "words must come most-frequent-first")
    // the increments must be exactly n_i / total: recover total from the
    // first row and re-derive the whole curve
    val total = math.round(ns(0) / cov(0))
    val rebuilt = ns.scanLeft(0L)(_ + _).tail.map(_.toDouble / total)
    rows.indices.foreach(i =>
      assert(math.abs(cov(i) - rebuilt(i)) < 1e-12, s"curve broken at $i"))
  }

  test("decontamination: benchmark docs are excluded and ratios bounded") {
    val res = TextAnalysis.decontamination(spark, sf001)
    val rows = res.collect()
    assert(rows.forall(_.getLong(0) >= TextAnalysis.BenchDocs),
      "benchmark docs must not score themselves")
    rows.foreach { r =>
      val c = r.getDouble(3)
      assert(c >= 0.0 && c <= 1.0, s"contamination out of range: $c")
      assert(r.getLong(2) <= r.getLong(1), "hits cannot exceed total grams")
    }
    // a doc that literally copies a benchmark doc must be fully contaminated
    val exact = Dedup.exact(spark, sf001).filter(col("copies") > 1)
    if (exact.count() > 0) {
      val hot = rows.filter(_.getDouble(3) == 1.0)
      assert(hot.nonEmpty || exact.filter(col("keep_id") < TextAnalysis.BenchDocs).count() == 0,
        "copies of benchmark docs must show contamination 1.0")
    }
  }

  test("dup spans: coverage is the interval union over shared 10-gram runs") {
    // doc 1/2 share EXACTLY one 10-token run planted inside distinct
    // padding; doc 3 shares nothing; doc 4 is the run verbatim (n = k)
    val run = (1 to 10).map(i => s"shared$i").mkString(" ")
    val d1 = s"alpha beta gamma $run delta epsilon"
    val d2 = s"one two three four five six $run seven"
    val d3 = "plain words that never repeat across any other document here okay fine"
    val docs = Seq((1L, d1), (2L, d2), (3L, d3), (4L, run)).toDF("doc_id", "text")
    val got = TextAnalysis.dupSpansOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // only the planted run's 10 positions are covered: padding differs,
    // so every overlapping gram that strays outside the run is unique
    assert(got(1L) == ((15L, 10L, 10.0 / 15.0)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((17L, 10L, 10.0 / 17.0)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((12L, 0L, 0.0)), s"doc3: ${got(3L)}")
    assert(got(4L) == ((10L, 10L, 1.0)), s"doc4: ${got(4L)}")
  }

  test("segment scrub: shared 8-token segments are dropped, order kept") {
    // docs 1 and 2 share segment B verbatim at SEGMENT-ALIGNED positions;
    // doc 3 contains B's words but straddling a segment boundary, so its
    // segments hash differently and survive
    val segA = (1 to 8).map(i => s"a$i").mkString(" ")
    val segB = (1 to 8).map(i => s"b$i").mkString(" ")
    val segC = (1 to 8).map(i => s"c$i").mkString(" ")
    val segD = (1 to 8).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      (1L, s"$segA $segB"),            // A unique, B shared -> keep A
      (2L, s"$segC $segB $segD"),      // C,D unique, B shared -> keep C D
      (3L, s"pad1 pad2 pad3 pad4 $segB x1 x2 x3 x4")  // B off-alignment
    ).toDF("doc_id", "text")
    val got = TextAnalysis.segmentScrubOn(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 1L, segA)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((3L, 1L, s"$segC $segD")), s"doc2: ${got(2L)}")
    assert(got(3L)._2 == 0L && got(3L)._3.startsWith("pad1"),
      s"off-alignment B must not be scrubbed: ${got(3L)}")
  }

  test("segment scrub: fully-templated doc scrubs to empty text") {
    val seg = (1 to 8).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, seg), (2L, seg)).toDF("doc_id", "text")
    val got = TextAnalysis.segmentScrubOn(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((1L, 1L, "")) && got(2L) == ((1L, 1L, "")),
      s"both copies scrub to empty: $got")
  }

  test("zipf slope: an exact power-law corpus fits slope -1, r2 1") {
    // term t_r appears floor(1024/r) times -> ln f = ln 1024 - ln r
    // exactly on the fit head, so OLS must recover slope -1 tightly
    val words = (1 to 64).flatMap(r =>
      Seq.fill(1024 / r)(f"w$r%03d")) // w001 64x... deterministic text
    val docs = Seq((1L, words.mkString(" "), "pow"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.zipfSlopeOn(docs).collect()
    assert(got.length == 1)
    val (n, slope, r2) = (got(0).getLong(1), got(0).getDouble(2),
      got(0).getDouble(3 + 1))
    assert(n == 64L, s"64 distinct terms, got $n")
    // floor() quantization perturbs ln f by <1/r, so not exactly -1
    assert(math.abs(slope + 1.0) < 0.02, s"slope $slope")
    assert(r2 > 0.999, s"r2 $r2")
  }

  test("zipf slope: fixture run fits the head per source, bounded rows") {
    val rows = TextAnalysis.zipfSlope(spark, sf001).collect()
    val nSrc = graft.Tables.load(spark, sf001, "documents")
      .select("source").distinct().count()
    assert(rows.length == nSrc)
    rows.foreach { r =>
      assert(r.getLong(1) <= TextAnalysis.ZipfTopTerms)
      assert(r.getDouble(2) < 0, s"${r.getString(0)}: slope must be negative")
      val r2 = r.getDouble(4)
      assert(r2 > 0 && r2 <= 1.0, s"${r.getString(0)}: r2 $r2")
    }
  }

  test("dup spans: overlapping duplicated grams merge, not double-count") {
    // two docs are identical 12-token texts -> all 3 grams duplicated,
    // union of [1,10],[2,11],[3,12] covers all 12 positions exactly once
    val t = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val got = TextAnalysis.dupSpansOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((12L, 12L, 1.0)) && got(2L) == ((12L, 12L, 1.0)),
      s"full coverage expected: $got")
  }

  test("gopher gate: keep is exactly the conjunction and rules discriminate") {
    val rows = TextAnalysis.gopherRules(spark, sf001).collect()
    rows.foreach { r =>
      val flags = Seq("words_ok", "mean_len_ok", "stop_ok", "alpha_ok",
        "sym_ok").map(r.getAs[Boolean])
      assert(r.getAs[Boolean]("keep") == flags.forall(identity),
        s"keep must be the conjunction: $r")
      val nw = r.getAs[Long]("n_words")
      assert((nw >= TextAnalysis.GopherMinWords) ==
        r.getAs[Boolean]("words_ok"), s"words_ok drifted: $r")
    }
    // the gate must actually split this corpus (not vacuously all-pass)
    val kept = rows.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < rows.length,
      s"gate should discriminate: $kept of ${rows.length} kept")
  }

  test("bigram LM: scrambling the same words costs more bits") {
    // three copies of a natural sentence make its bigrams frequent; the
    // scramble reuses the SAME words (so its w1 context counts are just
    // as high) but none of its bigrams — context-awareness means the
    // scramble must cost strictly more bits per position. (A unigram
    // model scores both identically — this is exactly what q118 adds
    // over q73.)
    val nat = "the cat sat on the mat while the dog slept near the door"
    val scr = "cat the on sat the while mat dog the near slept door the"
    val docs = Seq((1L, nat), (2L, nat), (3L, nat), (4L, scr))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // n_bigrams = n_tokens - 1
    assert(got(1L)._1 == nat.split("\\s+").length - 1)
    assert(got(1L)._2 == got(2L)._2 && got(2L)._2 == got(3L)._2,
      "identical docs must score equal")
    assert(got(4L)._2 > got(1L)._2,
      s"scrambled contexts must cost more bits: $got")
  }

  test("witten-bell: singleton-context runs stop scoring cheap") {
    // under q118's MLE a unique word predicts its successor with p=1,
    // so an all-rare-words doc scores nearly free; Witten-Bell gives a
    // singleton context λ=1/2, pushing ~1 bit of cost per position.
    // Two invariants MLE can't deliver together: (a) WB strictly
    // raises the rare-run cost, (b) genuinely predictable text (one
    // dominant successor per context, high counts) stays cheap — the
    // rare run must now cost MORE than the predictable doc by a wide
    // margin, not less.
    val predictable = "ping pong ping pong ping pong ping pong ping pong"
    val rare = "zebra quark nimbus fjord waltz glyph vortex prism ember oasis dune krill"
    val docs = Seq((1L, predictable), (2L, predictable), (3L, predictable),
      (4L, rare)).toDF("doc_id", "text")
    val mle = TextAnalysis.bigramLmOn(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val wb = TextAnalysis.wittenBellLmOn(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(wb(4L) > mle(4L) + 0.3,
      s"WB must charge singleton contexts: mle=$mle wb=$wb")
    assert(wb(4L) > 2 * wb(1L),
      s"rare run must cost far more than predictable text: $wb")
  }

  test("length KS: shifted distributions max out, identical ones read 0") {
    // srcA: all docs 10 tokens; srcB: all 20 (disjoint supports -> D=1);
    // srcC: same distribution as srcA -> D(A,C)=0
    def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      ("srcA", doc(10)), ("srcA", doc(10)),
      ("srcB", doc(20)), ("srcB", doc(20)),
      ("srcC", doc(10)), ("srcC", doc(10))).toDF("source", "text")
    val got = TextAnalysis.lengthKsOn(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("srcA", "srcB")) == 1.0, s"disjoint supports: $got")
    assert(got(("srcA", "srcC")) == 0.0, s"identical dists: $got")
    assert(got(("srcB", "srcC")) == 1.0, s"disjoint supports: $got")
  }

  test("source drift: KL is non-negative and covers every source") {
    val rows = TextAnalysis.sourceDrift(spark, sf001).collect()
    val sources = graft.Tables.load(spark, sf001, "documents")
      .select("source").distinct().count()
    assert(rows.length == sources, "one row per source")
    rows.foreach { r =>
      // KL >= 0 always; rounding can only graze zero from above
      assert(r.getAs[Double]("kl_divergence") >= -1e-6,
        s"negative KL: $r")
      assert(r.getAs[Long]("vocab_tokens") > 0, s"empty source: $r")
    }
  }
}
