package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Range proof behind q248's BIGINT output (round 9): the round-8
  * adjudication pinned the driver-gate hash flake on decimal128
  * output handling, so `value_cents` now leaves as a long — legal
  * only because the derivation CONSTRUCTS a bound far inside
  * Long.MaxValue at any scale factor. This spec re-derives that bound
  * from the derivation's own constants and checks the fixture obeys
  * each premise, so a change to the partsupp derivation that breaks
  * the proof fails here instead of overflowing silently. */
class DecisionRangeSpec extends SparkSpec {

  // the derivation's literals: 4 hash slots per part, availqty in
  // [1, 9999], supplycost_cents in [100, 100000]
  private val MaxPairsPerPart = 4L
  private val MaxQty = 9999L
  private val MaxCost = 100000L
  private val ValueBound = MaxPairsPerPart * MaxQty * MaxCost // 3 999 600 000

  test("q248: per-part value_cents is construction-bounded inside Long") {
    // static part of the proof: the bound itself has ~9 orders of
    // magnitude of headroom (the corpus TOTAL does not — it stays in
    // DECIMAL(38,0) internally for the threshold compare)
    assert(BigInt(Long.MaxValue) / BigInt(ValueBound) > 1000000000L,
      "per-part bound must keep >1e9x headroom under Long.MaxValue")

    // fixture premises: the derived partsupp really obeys the ranges
    // and fan-out the bound is computed from
    val ps = Decision.partsupp(spark, sf001).cache()
    try {
      val r = ps.agg(
        max("ps_availqty").as("mq"),
        min("ps_availqty").as("nq"),
        max("ps_supplycost_cents").as("mc"),
        min("ps_supplycost_cents").as("nc")).head()
      assert(r.getLong(0) <= MaxQty && r.getLong(1) >= 1,
        s"ps_availqty out of [1, $MaxQty]: $r")
      assert(r.getLong(2) <= MaxCost && r.getLong(3) >= 100,
        s"ps_supplycost_cents out of [100, $MaxCost]: $r")
      val maxFan = ps.groupBy("ps_partkey").count()
        .agg(max("count")).head().getLong(0)
      assert(maxFan <= MaxPairsPerPart,
        s"a part carries $maxFan supplier pairs > $MaxPairsPerPart — " +
          s"the value_cents bound no longer holds")
    } finally ps.unpersist()

    // conclusion: the emitted column is a long and every value sits
    // inside the derived bound
    val out = Decision.importantStock(spark, sf001)
    assert(out.schema("value_cents").dataType == LongType,
      "q248 must emit value_cents as BIGINT — decimal128 on the output " +
        "surface is the adjudicated driver-hash flake suspect")
    assert(!out.schema.exists(_.dataType.typeName.startsWith("decimal")),
      "q248's output surface must be decimal-free")
    val mv = out.agg(max("value_cents"), min("value_cents")).head()
    assert(mv.getLong(0) <= ValueBound && mv.getLong(1) >= 0,
      s"observed value_cents ${mv} escapes the construction bound " +
        s"$ValueBound — re-derive before keeping the BIGINT cast")
  }
}
