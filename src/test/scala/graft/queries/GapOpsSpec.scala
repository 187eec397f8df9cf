package graft.queries

import graft.SparkSpec
import graft.ext.{Events, TextAnalysis}
import org.apache.spark.sql.functions._

/** Cross-query invariants for the operator families SURVEY.md §2 lists
  * as absent from the reference (q63-q68): semi joins, set ops,
  * NTILE/percent_rank windows, CUBE, the Generator surface, and
  * dispersion stats. The DuckDB oracle pins exact values; these specs
  * pin the algebraic relationships a refactor could silently break.
  */
class GapOpsSpec extends SparkSpec {

  test("q63 + q06 partition the customer base (semi is the anti's dual)") {
    val semi = Hierarchy.customersWithOrders(spark, sf001)
    val anti = Hierarchy.customersWithoutOrders(spark, sf001)
    val total = graft.Tables.load(spark, sf001, "customer").count()
    assert(semi.count() + anti.count() == total,
      "every customer is in exactly one of EXISTS / NOT EXISTS")
    assert(semi.join(anti, Seq("customer_id"), "inner").count() == 0,
      "semi and anti results must be disjoint")
  }

  test("q64 statuses are disjoint and reconstruct both year-sets") {
    val r = Bi.retentionSets(spark, sf001).cache()
    val byStatus = r.groupBy("status").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val perId = r.groupBy("customer_id").count()
    assert(perId.filter(col("count") > 1).count() == 0,
      "no customer may carry two statuses")
    // |cur| = retained + new, |prev| = retained + churned
    val orders = graft.Tables.load(spark, sf001, "orders")
    val maxY = orders.agg(max(year(col("o_orderdate")))).head.getInt(0)
    def n(y: Int) = orders.filter(year(col("o_orderdate")) === y)
      .select("o_custkey").distinct().count()
    assert(byStatus("retained") + byStatus("new") == n(maxY))
    assert(byStatus("retained") + byStatus("churned") == n(maxY - 1))
  }

  test("q65 ntile balances within 1 per nation and percent_rank spans [0,1]") {
    val q = Bi.spendQuartiles(spark, sf001).cache()
    val tileCounts = q.groupBy("nation_id", "quartile").count()
      .groupBy("nation_id")
      .agg((max("count") - min("count")).as("spread"),
        countDistinct("quartile").as("tiles"),
        sum("count").as("n_customers"))
      .collect()
    tileCounts.foreach { r =>
      assert(r.getLong(1) <= 1, s"ntile must balance within 1: $r")
      assert(r.getLong(2) == math.min(4L, r.getLong(3)),
        s"a nation with >=4 customers must fill all 4 quartiles: $r")
    }
    assert(q.filter(col("pct_rank") < 0 || col("pct_rank") > 1).count() == 0)
    // the top spender of every nation has percent_rank exactly 0
    val tops = q.groupBy("nation_id").agg(min("pct_rank").as("mn")).collect()
    tops.foreach(r => assert(r.getDouble(1) == 0.0))
  }

  test("q66 cube subtotals are consistent with the grand total") {
    val c = Events.eventCube(spark, sf001).cache()
    val grand = c.filter(col("event_type") === "ALL" && col("hr") === -1)
      .select("n_events").head.getLong(0)
    assert(grand == Events.loadEvents(spark, sf001).count())
    val byType = c.filter(col("event_type") =!= "ALL" && col("hr") === -1)
      .agg(sum("n_events")).head.getLong(0)
    val byHour = c.filter(col("event_type") === "ALL" && col("hr") =!= -1)
      .agg(sum("n_events")).head.getLong(0)
    assert(byType == grand && byHour == grand,
      "each 1-D margin must re-sum to the grand total")
  }

  test("q67 positions are 1-based and occurrence counts re-sum to doc length") {
    val t = TextAnalysis.tokenPositions(spark, sf001).cache()
    assert(t.filter(col("first_pos") < 1).count() == 0)
    val resummed = t.groupBy("doc_id").agg(sum("n_occurrences").as("n"))
    val expected = graft.Tables.load(spark, sf001, "documents")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("n_toks"))
    assert(resummed.join(expected, Seq("doc_id"))
      .filter(col("n") =!= col("n_toks")).count() == 0,
      "per-token counts must partition the token stream")
  }

  test("q69 variant buckets cover every event, deciles stay in range") {
    val v = Events.variantBuckets(spark, sf001).cache()
    assert(v.agg(sum("n_events")).head.getLong(0) ==
      graft.Tables.load(spark, sf001, "events").count(),
      "decile histogram must partition the event stream")
    // between() also rules out the -999 missing-k sentinel and any NULL
    // from a silently-broken variant extraction
    assert(v.filter(col("k_bucket").between(0, 9)).count() == v.count(),
      "every fixture event must land in a real decile bucket")
  }

  test("q70 entropy bounded by log2(types), ttr in (0,1]") {
    val e = TextAnalysis.unigramEntropy(spark, sf001).cache()
    assert(e.count() == 500)
    assert(e.filter(col("entropy") < 0).count() == 0)
    // H is maximized by the uniform distribution over the doc's types;
    // entropy is rounded to 6dp, so allow the half-ulp of that rounding
    assert(e.filter(col("entropy") >
      log2(col("n_types").cast("double")) + 5e-7).count() == 0)
    assert(e.filter(col("type_token_ratio") <= 0 ||
      col("type_token_ratio") > 1).count() == 0)
    assert(e.filter(col("n_types") > col("n_tokens")).count() == 0)
  }

  test("q71 lead/frame: one open tail per user, gaps non-negative") {
    val q = Events.userNextWindow(spark, sf001).cache()
    val nUsers = Events.loadEvents(spark, sf001)
      .select("user_id").distinct().count()
    assert(q.filter(col("next_type").isNull).count() == nUsers,
      "exactly the last event per user has no successor")
    assert(q.filter(col("next_gap_s") < 0).count() == 0,
      "time must not run backwards within a user")
    assert(q.filter(col("moving_sum3").isNull).count() == 0,
      "a ROWS frame always contains at least the current row")
  }

  test("q68 moments: min <= avg <= max, stddev >= 0, counts partition orders") {
    val s = Bi.priorityStats(spark, sf001).cache()
    assert(s.filter(col("min_price") > col("avg_price") ||
      col("avg_price") > col("max_price")).count() == 0)
    assert(s.filter(col("stddev_price") < 0).count() == 0)
    val total = s.agg(sum("n_orders")).head.getLong(0)
    assert(total == graft.Tables.load(spark, sf001, "orders").count())
  }
}
