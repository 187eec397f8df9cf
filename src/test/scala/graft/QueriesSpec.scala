package graft

import graft.queries.Hierarchy

/** Smoke + shape checks for every declared query at sf0.001; the value
  * comparison against DuckDB happens in the driver's oracle gate (and
  * locally via tools/verify_local.py). */
class QueriesSpec extends SparkSpec {

  test("entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf001).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("oracle lint: deterministic, named, and DuckDB-shaped") {
    SparkEntry.queries.keys.foreach(k =>
      assert(k.matches("^q\\d{2,3}_[a-z0-9_]+$"), s"bad query name: $k"))
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val l = sql.toLowerCase
      assert(!l.contains("current_date") && !l.contains("now()"),
        s"$name oracle depends on wall clock")
      assert(l.contains("order by"), s"$name oracle lacks a total ORDER BY")
    }
  }

  test("every query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      "orphan oracle entries")
  }

  test("org closure enumerates each employee's ancestor chain") {
    val rows = Hierarchy.orgClosure(spark, sf001).collect()
    assert(rows.length == 29) // 10 self + 19 ancestor links in the 10-row tree
    val ceoRows = rows.filter(_.getAs[Int]("employee_id") == 1)
    assert(ceoRows.length == 1 && ceoRows.head.getAs[Int]("hierarchy_level") == 0)
    // deepest chain: engineers are 3 levels below the CEO
    assert(rows.map(_.getAs[Int]("hierarchy_level")).max == 3)
  }

  test("manager chains reach the CEO exactly once per employee") {
    val rows = Hierarchy.managerChains(spark, sf001).collect()
    assert(rows.length == 10)
    val jack = rows.find(_.getAs[Int]("employee_id") == 10).get
    assert(jack.getAs[String]("full_manager_hierarchy") ==
      "Jack (Software Engineer 3) → Grace (Engineering Manager 2) → Carol (VP of Engineering) → Alice (CEO)")
    assert(jack.getAs[Int]("hierarchy_level") == 4)
  }
}
