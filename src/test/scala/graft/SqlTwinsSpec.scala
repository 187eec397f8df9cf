package graft

import graft.queries.Hierarchy

/** SURVEY.md §3.2: the BI queries must run BOTH as DataFrame builders and
  * as SQL text through Catalyst's full parse→analyze→optimize path, and
  * converge to the same results. The oracle SQL strings double as the
  * spark.sql twins (kept ANSI enough for both DuckDB and Spark).
  */
class SqlTwinsSpec extends SparkSpec {

  // q18-q20 twins are DuckDB-only (epoch_us/make_timestamp dialect), so
  // the streaming/batch specs cover those instead.
  private val twinnable = Seq(
    "q01_revenue_by_category", "q02_top_customers", "q03_monthly_trend",
    "q06_customers_without_orders", "q07_etl_clean_sales",
    "q10_dedup_exact", "q31_stratified_sample",
    "q42_revenue_rollup", "q44_salted_hot_join")

  test("spark.sql twin equals the DataFrame plan, row for row") {
    Tables.registerAll(spark, sf001)
    twinnable.foreach { q =>
      val viaSql = spark.sql(SparkEntry.oracleSql(q))
        .collect().map(_.toString).toSeq
      val viaDf = SparkEntry.queries(q)(spark, sf001)
        .collect().map(_.toString).toSeq
      assert(viaSql == viaDf, s"$q: SQL twin diverged from DataFrame plan")
    }
  }

  test("every oracle Spark can parse AND run agrees with its DataFrame plan") {
    // the curated list above is the guaranteed floor; this sweep catches
    // any other oracle that happens to be ANSI enough for both dialects
    // and insists it cannot silently diverge
    Tables.registerAll(spark, sf001)
    var agreed = twinnable.toSet
    SparkEntry.oracleSql.filterNot(kv => agreed(kv._1)).foreach { case (q, sql) =>
      val viaSql =
        try spark.sql(sql).collect().map(_.toString).toSeq
        catch { case _: Exception => Nil } // DuckDB-only dialect: skip
      if (viaSql.nonEmpty) {
        val viaDf = SparkEntry.queries(q)(spark, sf001)
          .collect().map(_.toString).toSeq
        assert(viaSql == viaDf, s"$q: parseable oracle diverged from plan")
        agreed += q
      }
    }
    info(s"twinned ${agreed.size} of ${SparkEntry.oracleSql.size} oracles")
  }

  test("Spark 4 WITH RECURSIVE runs the reference hierarchy CTE") {
    val viaSql = spark.sql(Hierarchy.orgClosureSql)
      .collect().map(_.toString).toSeq
    val viaLoop = Hierarchy.orgClosure(spark, sf001)
      .collect().map(_.toString).toSeq
    assert(viaSql == viaLoop,
      "recursive CTE and fixpoint loop must agree on the 10-row org tree")
  }
}
