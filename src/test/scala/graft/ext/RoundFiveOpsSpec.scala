package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the round-5 changes the row-hash oracle can't
  * express: q197's refined two-token blocking key, and the q237
  * densified-axis / guarded-sMAPE backtest. */
class RoundFiveOpsSpec extends SparkSpec {

  test("q197: every emitted pair shares the full block key and is ordered") {
    val toks = split(lower(col("text")), "\\s+")
    val keyed = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 100).cast("long").as("lb"),
        element_at(toks, 1).as("ft"),
        coalesce(element_at(toks, 2), lit("")).as("ft2"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    val pairs = TextAnalysis.erBlocking(spark, sf001).collect()
    assert(pairs.nonEmpty, "fixture must produce at least one ER candidate")
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b, "pairs must be canonically ordered")
      assert(keyed(a) == keyed(b),
        s"pair ($a,$b) crosses a block key: ${keyed(a)} vs ${keyed(b)}")
      assert(r.getLong(4) <= TextAnalysis.ErMaxDist)
      assert(r.getString(2) == keyed(a)._1 && r.getLong(3) == keyed(a)._2)
    }
  }

  test("q197: two-token blocking bounds candidate growth vs one-token key") {
    // the round-5 scale fix: the refined key must produce no MORE
    // candidates than the coarse one (a strict subset of its blocks)
    val toks = split(lower(col("text")), "\\s+")
    val b = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 100).cast("long").as("lb"),
        element_at(toks, 1).as("ft"),
        coalesce(element_at(toks, 2), lit("")).as("ft2"))
    def candidates(keys: Seq[String]): Long = b.groupBy(keys.head,
        keys.tail: _*).agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) div 2"))).collect()(0).getLong(0)
    val coarse = candidates(Seq("lang", "lb", "ft"))
    val fine = candidates(Seq("lang", "lb", "ft", "ft2"))
    assert(fine <= coarse,
      s"refined key must not enlarge the candidate set ($fine > $coarse)")
  }

  test("q237: backtest scores a dense day axis and sMAPE never NaNs") {
    val rows = Events.forecastBacktest(spark, sf001).collect()
    assert(rows.length == 2)
    // a DENSE axis backtests span-minus-7 days for both methods
    val daily = Events.loadEvents(spark, sf001)
      .filter(col("event_type") === "purchase")
      .agg(datediff(max(to_date(col("ts"))), min(to_date(col("ts")))))
      .collect()(0).getInt(0)
    rows.foreach { r =>
      assert(r.getLong(1) == daily.toLong - 6,
        "densified axis must backtest every calendar day after warm-up")
      assert(!r.getDouble(3).isNaN && r.getDouble(3) >= 0.0 &&
        r.getDouble(3) <= 2.0, "guarded sMAPE must stay in [0, 2]")
    }
  }
}
