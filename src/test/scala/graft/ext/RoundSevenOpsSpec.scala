package graft.ext

import graft.SparkSpec

/** Invariants for the round-7 registrations the row-hash oracle can't
  * express: q251's κ must live in [−1, 1] with NULL exactly on the
  * degenerate (constant-rater) cells, and q252's percentile-bootstrap
  * interval must be ordered, bracket the point estimate on the fixture,
  * and stay inside the replicate-mean support. */
class RoundSevenOpsSpec extends SparkSpec {

  test("q251: kappa in [-1,1], NULL exactly when the chance term degenerates") {
    val rows = TextAnalysis.raterKappa(spark, sf001).collect()
    assert(rows.nonEmpty, "fixture must produce per-language kappa rows")
    rows.foreach { r =>
      val n = r.getLong(1)
      val (kk, kd, dk, dd) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(kk + kd + dk + dd == n, s"contingency cells must sum to n: $r")
      // recompute the chance-corrected denominator from the emitted
      // exact counts: den = n² − pe, pe = (row marginals)·(col marginals)
      val pe = BigInt(kk + kd) * BigInt(kk + dk) +
        BigInt(dk + dd) * BigInt(kd + dd)
      val den = BigInt(n) * BigInt(n) - pe
      if (den == 0)
        assert(r.isNullAt(7), s"degenerate cell must emit NULL kappa: $r")
      else {
        assert(!r.isNullAt(7), s"non-degenerate cell must emit kappa: $r")
        val k = r.getDouble(7)
        assert(k >= -1.0 && k <= 1.0, s"kappa out of [-1,1]: $r")
      }
    }
    // the ROLLUP's pooled row covers the whole corpus exactly once
    val all = rows.filter(_.getString(0) == "ALL")
    assert(all.length == 1, "exactly one pooled ALL row")
    val nDocs = graft.Tables.load(spark, sf001, "documents").count()
    assert(all.head.getLong(1) == nDocs, "pooled n_docs = corpus size")
    assert(rows.filter(_.getString(0) != "ALL").map(_.getLong(1)).sum ==
      nDocs, "per-language rows partition the corpus")
  }

  test("q251: kappa formula sanity on hand-built contingency tables") {
    // perfect agreement → κ = 1; a constant rater → NULL (pe = 1);
    // checked through the same decimal expressions the query uses, via
    // a synthetic 2-rater frame fed into the identical select
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val agree = Seq((true, true), (false, false), (true, true))
      .toDF("keep_a", "keep_b")
    def kappaOf(df: org.apache.spark.sql.DataFrame): Option[Double] = {
      val ct = df.agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep_a") && col("keep_b"), 1L).otherwise(0L))
          .as("n_both_keep"),
        sum(when(col("keep_a") && !col("keep_b"), 1L).otherwise(0L))
          .as("n_gopher_only"),
        sum(when(!col("keep_a") && col("keep_b"), 1L).otherwise(0L))
          .as("n_logit_only"),
        sum(when(!col("keep_a") && !col("keep_b"), 1L).otherwise(0L))
          .as("n_both_drop")).collect().head
      val n = ct.getLong(0)
      val (kk, kd, dk, dd) =
        (ct.getLong(1), ct.getLong(2), ct.getLong(3), ct.getLong(4))
      val pe = BigInt(kk + kd) * BigInt(kk + dk) +
        BigInt(dk + dd) * BigInt(kd + dd)
      val den = BigInt(n) * BigInt(n) - pe
      if (den == 0) None
      else Some((BigInt(n) * BigInt(kk + dd) - pe).toDouble / den.toDouble)
    }
    assert(kappaOf(agree).contains(1.0), "perfect agreement must be κ=1")
    // ONE constant rater is κ=0 (pe = po), not degenerate — den = 0
    // requires pe = 1, i.e. BOTH raters constant on the SAME label
    val oneConstant = Seq((true, true), (true, false))
      .toDF("keep_a", "keep_b")
    assert(kappaOf(oneConstant).contains(0.0),
      "one constant rater is chance-level κ=0, not degenerate")
    val bothConstant = Seq((true, true), (true, true))
      .toDF("keep_a", "keep_b")
    assert(kappaOf(bothConstant).isEmpty,
      "both raters constant on one label must degenerate to NULL")
  }

  test("q253: sampled audit row is consistent with the full pair sets") {
    import org.apache.spark.sql.functions._
    val row = Dedup.sampledContainmentRecall(spark, sf001).collect().head
    val (ne, nb, miss, ppm) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(ne > 0, "the 25% sample must keep the fixture audit populated")
    assert(nb >= 0 && nb <= ne && miss == ne - nb,
      s"banded_s ⊆ exact_s and miss arithmetic must hold: $row")
    assert(ppm == (if (ne == 0) 0L else nb * 1000000L / ne))
    // the sampled exact count must equal the FULL exact pair set
    // restricted to sampled small docs — the estimate's unbiasedness
    // argument rests on exactly this identity
    val md5u = conv(substring(md5(concat(col("doc_small").cast("string"),
      lit(":recall"))), 1, 12), 16, 10).cast("long") % 1000L
    val fullSampled = Dedup.containmentPairs(spark, sf001)
      .filter(md5u < Dedup.RecallSamplePerMille).count()
    assert(ne == fullSampled,
      s"sampled exact ($ne) must equal full-exact-restricted ($fullSampled)")
  }

  test("q254: ablation arms are arithmetically consistent") {
    val rows = TextAnalysis.filterAblation(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("any", "dup", "gopher", "logit", "repeat"))
    val n = rows("any").getLong(1)
    rows.values.foreach { r =>
      assert(r.getLong(1) == n, "every arm sees the whole corpus")
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= n,
        s"unique <= dropped <= n_docs: $r")
    }
    val filters = Seq("dup", "gopher", "logit", "repeat").map(rows)
    // any.dropped = |union| <= sum of the parts; any.unique counts docs
    // dropped by EXACTLY one filter = sum of per-filter unique counts
    assert(rows("any").getLong(2) <= filters.map(_.getLong(2)).sum)
    assert(rows("any").getLong(3) == filters.map(_.getLong(3)).sum,
      "exactly-one = sum of per-filter uniques")
    assert(filters.forall(r => rows("any").getLong(2) >= r.getLong(2)),
      "the union drops at least what any single filter drops")
  }

  test("q255: novelty partitions the corpus gram inventory") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.sourceNovelty(spark, sf001).collect()
    assert(rows.nonEmpty)
    // every distinct gram is first-seen exactly once, so per-source
    // novel counts partition the corpus-wide distinct gram count
    val docs = graft.Tables.load(spark, sf001, "documents")
    val distinctGrams = docs
      .select(split(lower(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))"))
        .as("ng"))
      .select(countDistinct(col("ng"))).collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == distinctGrams,
      "sum of novel grams = corpus distinct grams")
    // the priority-first source owns every gram it contains
    val first = rows.minBy(_.getString(0))
    assert(first.getLong(1) == first.getLong(2) &&
      first.getLong(3) == 1000000L,
      s"the first source in scan order is 100% novel: $first")
  }

  test("q256: PPI estimate decomposes into its three ppm terms") {
    val rows = TextAnalysis.ppiKeepRate(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, ns) = (r.getLong(1), r.getLong(2))
      val (gs, cf, cs) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(ns <= n && gs <= ns && cs <= ns && cf <= n, s"count bounds: $r")
      if (ns == 0) assert(r.isNullAt(6) && r.isNullAt(7))
      else {
        assert(r.getLong(6) == gs * 1000000L / ns, s"naive term: $r")
        assert(r.getLong(7) ==
          cf * 1000000L / n + gs * 1000000L / ns - cs * 1000000L / ns,
          s"ppi = cheap_full + gold_sample - cheap_sample: $r")
      }
    }
  }

  test("q252: CI is ordered, brackets the point estimate, inside support") {
    import org.apache.spark.sql.functions._
    val rows = Sampling.bootstrapCi(spark, sf001).collect()
    assert(rows.nonEmpty, "fixture must produce per-source CI rows")
    rows.foreach { r =>
      val (mean, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(lo <= hi, s"interval must be ordered: $r")
      // not a theorem of the percentile bootstrap, but a measured
      // property of this fixture (B=128, n ≥ dozens per source) pinned
      // as a regression guard — a failure means the weights or the
      // order statistics changed, not that the math is optional
      assert(lo <= mean && mean <= hi,
        s"CI must bracket the fixture point estimate: $r")
    }
    // per-source doc counts must match the raw corpus (no rows lost to
    // the replicate fan-out / re-join)
    val n = graft.Tables.load(spark, sf001, "documents")
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == n(r.getString(0)),
      s"n_docs must match the corpus per source: $r"))
  }
}
