package graft.ext

import graft.SparkSpec

/** Invariants for the round-6 additions the row-hash oracle can't
  * express: q245's banded containment must be a sound approximation of
  * q137 (no false positives — every emitted pair is exactly verified),
  * and q246's audit row must be arithmetically consistent with the two
  * pair sets it summarizes. */
class RoundSixOpsSpec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_small", "doc_big").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q245: banded pairs are a subset of q137's exact pairs") {
    val exact = pairSet(Dedup.containmentPairs(spark, sf001))
    val banded = pairSet(Dedup.bandedContainmentPairs(spark, sf001))
    assert(exact.nonEmpty, "fixture must produce exact containment pairs")
    assert(banded.subsetOf(exact),
      s"banded emitted non-pairs: ${(banded -- exact).take(5)}")
  }

  test("q245: recall is 100% on the fixture corpus") {
    // not a structural guarantee (banding is an approximation by
    // design) but a measured property of the fixture the audit row
    // documents; if a fixture change breaks it, q246's n_missed is
    // the first place to look
    val exact = pairSet(Dedup.containmentPairs(spark, sf001))
    val banded = pairSet(Dedup.bandedContainmentPairs(spark, sf001))
    assert(banded == exact,
      s"missed ${(exact -- banded).size} of ${exact.size} exact pairs")
  }

  test("q245: verified stats match q137's for the pairs both emit") {
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    val exact = Dedup.containmentPairs(spark, sf001).collect()
      .map(r => key(r) -> r.toSeq).toMap
    Dedup.bandedContainmentPairs(spark, sf001).collect().foreach { r =>
      assert(exact(key(r)) == r.toSeq,
        s"verification stats diverge for ${key(r)}")
    }
  }

  test("q247-q250: derived partsupp respects its documented domains") {
    import org.apache.spark.sql.functions._
    val ps = graft.queries.Decision.partsupp(spark, sf001).collect()
    // join-check against the REAL key set, not a 1..S range assert: the
    // fixture's s_suppkey is 0-based, and a range check would have let
    // an off-by-one derivation (orphaning supplier 0, fabricating a
    // phantom key S) pass while ~1% of pairs silently dropped out of
    // every supplier join
    val supKeys = graft.Tables.load(spark, sf001, "supplier")
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val nPart = graft.Tables.load(spark, sf001, "part").count()
    assert(ps.nonEmpty && ps.length <= 4 * nPart,
      "at most 4 slots per part")
    assert(ps.map(r => (r.getLong(0), r.getLong(1))).distinct.length ==
      ps.length, "(partkey, suppkey) must be a key")
    ps.foreach { r =>
      assert(supKeys.contains(r.getLong(1)),
        s"ps_suppkey ${r.getLong(1)} must be a real supplier key")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 9999, "availqty domain")
      assert(r.getLong(3) >= 100 && r.getLong(3) <= 100000, "cost domain")
    }
    assert(ps.map(_.getLong(1)).toSet == supKeys,
      "every supplier should hold stock at fixture sizes (4·P slots ≫ S)")
    val again = graft.queries.Decision.partsupp(spark, sf001).collect()
    assert(ps.map(_.toSeq).toSet == again.map(_.toSeq).toSet,
      "derivation must be deterministic")
  }

  test("q247: emitted cost equals the regional minimum for its part") {
    val rows = graft.queries.Decision.minCostSupplier(spark, sf001).collect()
    assert(rows.nonEmpty, "fixture must produce min-cost rows")
    val byPart = rows.groupBy(_.getLong(3))
    byPart.values.foreach { rs =>
      assert(rs.map(_.getLong(6)).distinct.length == 1,
        "all emitted suppliers of a part share the min cost")
    }
  }

  test("q248/q249/q250: TPC-H shapes are non-empty at the spec SF") {
    assert(graft.queries.Decision.importantStock(spark, sf001).count() > 0)
    assert(graft.queries.Decision.supplierPartTypes(spark, sf001).count() > 0)
    assert(graft.queries.Decision.promotableSuppliers(spark, sf001).count() > 0)
  }

  test("q54: char_pairs kernel matches substr semantics") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cases = Seq("", "a", "ab", "abc", "a b", "ab cd", "  ",
      "naïve café", "aéb")
    val got = cases.toDF("text")
      .select(col("text"),
        graft.functions.CharPairs.char_pairs(col("text")).as("pairs"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    def expected(s: String): Seq[String] = {
      val cps = s.codePoints().toArray.map(Character.toString)
      cps.zip(cps.drop(1)).map { case (a, b) => a + b }
        .filter(p => !p.contains(" ")).toSeq
    }
    cases.foreach { s =>
      assert(got(s) == expected(s), s"mismatch for '$s'")
    }
  }

  test("q238: PCM16 features agree across endianness, negatives intact") {
    // the same samples serialized LE and BE must decode identically —
    // the BE branch previously zero-extended the sign byte, turning
    // negative samples into large positives (dead code on the LE
    // fixture, but wrong the day a decoder reports big-endian)
    val samples = Array[Short](-32768, -256, -1, 0, 1, 255, 256, 32767)
    def bytes(be: Boolean): Array[Byte] = samples.flatMap { s =>
      val (hi, lo) = (((s >> 8) & 0xff).toByte, (s & 0xff).toByte)
      if (be) Seq(hi, lo) else Seq(lo, hi)
    }
    val le = Multimodal.pcm16Features(bytes(be = false), samples.length,
      bigEndian = false)
    val be = Multimodal.pcm16Features(bytes(be = true), samples.length,
      bigEndian = true)
    assert(le == be, s"LE/BE decode diverged: $le vs $be")
    assert(le._1 == samples.map(_.toLong).sum, "exact signed sum")
    assert(le._2 == 32768L, "peak must see |−32768|")
  }

  test("q246: audit row is consistent with the two pair sets") {
    val exact = pairSet(Dedup.containmentPairs(spark, sf001))
    val banded = pairSet(Dedup.bandedContainmentPairs(spark, sf001))
    val row = Dedup.containmentRecallAudit(spark, sf001).collect()
    assert(row.length == 1)
    val r = row(0)
    assert(r.getLong(0) == exact.size, "n_exact")
    assert(r.getLong(1) == (exact & banded).size, "n_banded")
    assert(r.getLong(2) == (exact -- banded).size, "n_missed")
    assert(r.getLong(3) == r.getLong(1) * 1000000L / r.getLong(0),
      "recall_ppm must be the integer floor division")
  }
}
