package graft.ext

import graft.SparkSpec

/** Invariants for q257 (capped SemDeDup) the row-hash oracle can't
  * express: the audit's integer identities, the cap's ceiling
  * arithmetic, and the relation to q132's uncapped dup set — sharding
  * compares a SUBSET of each cluster's pairs, so the capped pass can
  * only ever flag fewer (never different) duplicates, and exactly the
  * same ones on clusters the cap leaves whole. */
class RoundEightOpsSpec extends SparkSpec {

  test("q257: audit identities, ceiling shards, and the cap flag") {
    val cap = Similarity.SemDedupCap
    val rows = Similarity.semDedupCapped(spark, sf001).collect()
    assert(rows.nonEmpty, "fixture must produce per-cluster audit rows")
    val corpus = graft.Tables.load(spark, sf001, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == corpus,
      "cluster sizes must partition the corpus")
    rows.foreach { r =>
      val (n, shards, capped) = (r.getLong(1), r.getLong(2), r.getBoolean(3))
      val (pairs, dups, kept) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(shards == (n + cap - 1) / cap, s"shards != ceil(n/cap): $r")
      assert(capped == (n > cap), s"capped flag wrong: $r")
      assert(kept + dups == n, s"kept + dups != members: $r")
      val allPairs = n * (n - 1) / 2
      if (!capped)
        assert(pairs == allPairs,
          s"uncapped cluster must examine every pair: $r")
      else
        // pairs == allPairs on a capped cluster is NOT an engine bug:
        // it means every member md5-hashed into one shard, i.e. the
        // fixture stopped covering the sharding branch — say so, or a
        // regenerated fixture reads as a pair-count defect.
        assert(pairs < allPairs && pairs > 0,
          if (pairs == allPairs)
            s"capped cluster examined ALL pairs — every member hashed " +
              s"into a single shard; fixture no longer covers the " +
              s"sharding branch (regenerate or lower the cap): $r"
          else
            s"capped cluster must examine a strict, non-empty subset: $r")
    }
    // both branches must actually fire at fixture SF, or the oracle
    // stops covering one of them
    assert(rows.exists(_.getBoolean(3)) && rows.exists(!_.getBoolean(3)),
      "fixture must exercise BOTH the capped and uncapped branches")
  }

  test("q257: capped dup set is a per-cluster subset of q132's") {
    // q132 flags a vector when ANY earlier same-cluster member is
    // within tau; q257 only consults the same sub-shard. Same
    // clustering, same threshold, fewer pairs => per-cluster dup
    // counts can only drop, and match exactly where n <= cap.
    val cap = Similarity.SemDedupCap
    val capped = Similarity.semDedupCapped(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(5))).toMap
    val full = Similarity.semDedup(spark, sf001).collect()
      .filter(!_.getBoolean(4)) // keep == false: flagged duplicates
      .groupBy(_.getLong(1)).view.mapValues(_.length.toLong).toMap
    capped.foreach { case (cid, (n, dups)) =>
      val fullDups = full.getOrElse(cid, 0L)
      assert(dups <= fullDups,
        s"cid $cid: sharded pass flagged MORE dups ($dups) than the " +
          s"full within-cluster pass ($fullDups)")
      if (n <= cap)
        assert(dups == fullDups,
          s"cid $cid is uncapped ($n <= $cap) so the dup sets must " +
            s"coincide: got $dups vs $fullDups")
    }
  }
}
