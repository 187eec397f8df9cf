package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the 6-table star join (q83) and the decorrelated
  * correlated-subquery query (q84). */
class StarJoinSpec extends SparkSpec {

  test("q83: all dims broadcast; only lineitem-orders shuffles") {
    val plan = Bi.regionalRevenue(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dims must broadcast")
    // exactly one big-big join remains (SMJ or shuffled hash)
    val bigJoins = "SortMergeJoin|ShuffledHashJoin".r
      .findAllIn(plan).length
    assert(bigJoins <= 1, s"expected at most one big-big join:\n$plan")
  }

  test("q83: local-supplier constraint holds on every output nation") {
    // every contributing row had c_nationkey == s_nationkey, so revenue
    // grouped by that nation must equal a manual recount
    val got = Bi.regionalRevenue(spark, sf001).collect()
    assert(got.nonEmpty)
    val total = got.map(_.getLong(2)).sum
    val li = graft.Tables.load(spark, sf001, "lineitem")
    val ord = graft.Tables.load(spark, sf001, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val cust = graft.Tables.load(spark, sf001, "customer")
    val supp = graft.Tables.load(spark, sf001, "supplier")
    val manual = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .count()
    assert(total == manual, s"lineitem count $total != manual $manual")
  }

  test("q84: the subquery is decorrelated, and results obey the rule") {
    val df = Bi.aboveAvgOrders(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    // decorrelation leaves an aggregate+join, never a per-row subquery
    assert(!plan.contains("ScalarSubquery"),
      s"correlated subquery not decorrelated:\n$plan")
    val flagged = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(flagged.nonEmpty)
    // recompute the rule for the flagged customers' orders
    val orders = graft.Tables.load(spark, sf001, "orders")
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"),
        col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byCust = orders.groupBy(_._2)
    orders.foreach { case (ok, ck, price) =>
      val grp = byCust(ck).map(_._3)
      val expect = price * grp.length >= 1.5 * grp.sum
      // compare against the engine's decision modulo exact-decimal
      // rounding: recompute in BigDecimal to avoid FP ambiguity
      val exact = BigDecimal(price).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
        grp.length >= BigDecimal("1.5") * grp.map(p =>
        BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      assert(flagged.contains(ok) == exact,
        s"order $ok flagged=${flagged.contains(ok)} expect=$exact (approx $expect)")
    }
  }
}
