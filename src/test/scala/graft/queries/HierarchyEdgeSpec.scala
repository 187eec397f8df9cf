package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge semantics SURVEY.md calls out explicitly: NOT EXISTS null-key
  * behavior (§2.4 J6, fixture A3) and recursion termination on cyclic
  * data (§7.4). */
class HierarchyEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("left_anti matches NOT EXISTS on null probe keys (fixture A3)") {
    val orders = Seq(Some(1), Some(2), None).toDF("CustomerID")
    val payments = Seq(Some(1)).toDF("CustomerID")
    val got = orders.join(payments,
        orders("CustomerID") === payments("CustomerID"), "left_anti")
      .collect().map(r => Option(r.get(0))).toSet
    // NOT EXISTS keeps the null-key row (the correlated predicate is
    // never true for it) and customer 2; NOT IN would return neither
    assert(got == Set(Some(2), None))
  }

  test("fixpoint terminates on cyclic data via the depth guard") {
    val cyclic = Seq((1, "A", Some(2)), (2, "B", Some(1)))
      .toDF("employee_id", "name", "manager_id")
    val seed = cyclic.select(col("employee_id"), col("name"),
      col("manager_id"), lit(0).as("level"))
    val out = Hierarchy.fixpoint(seed, { frontier =>
      frontier.as("f")
        .join(broadcast(cyclic.as("e")),
          col("e.employee_id") === col("f.manager_id"))
        .select(col("e.employee_id").as("employee_id"),
          col("e.name").as("name"),
          col("e.manager_id").as("manager_id"),
          (col("f.level") + 1).as("level"))
    }, maxDepth = 5)
    // 2 seed rows + 2 rows per iteration x 5 bounded iterations
    assert(out.count() == 12)
    assert(out.agg(max("level")).head.getInt(0) == 5)
  }
}
