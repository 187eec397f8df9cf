package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's recursive-CTE hierarchy queries
  * (sql_definitions.sql:54-84 and 93-121) and the NOT EXISTS anti-join
  * (sql_definitions.sql:133-139), Spark-first.
  *
  * Recursion is a driver-side fixpoint loop over lazy DataFrames — the
  * portable equivalent of WITH RECURSIVE (SPARK-24497 landed in 4.0, but
  * the loop is deterministic, works everywhere, and lets us checkpoint
  * per iteration to cut lineage growth). Scale notes:
  *  - the `employees` dim is broadcast every step, so each iteration is a
  *    map-side hash join on the frontier — no shuffle at all;
  *  - `localCheckpoint` truncates the lineage each round (SURVEY.md §7.4),
  *    otherwise plan depth grows linearly with hierarchy depth;
  *  - a max-depth guard (100) bounds runaway recursion on cyclic data.
  */
object Hierarchy {

  /** The 10-row org-tree golden fixture (sql_definitions.sql:32-42). */
  def employees(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1, "Alice (CEO)", None: Option[Int]),
      (2, "Bob (VP of Sales)", Some(1)),
      (3, "Carol (VP of Engineering)", Some(1)),
      (4, "David (Sales Manager 1)", Some(2)),
      (5, "Eve (Sales Manager 2)", Some(2)),
      (6, "Frank (Engineering Manager 1)", Some(3)),
      (7, "Grace (Engineering Manager 2)", Some(3)),
      (8, "Henry (Software Engineer 1)", Some(6)),
      (9, "Ian (Software Engineer 2)", Some(6)),
      (10, "Jack (Software Engineer 3)", Some(7))
    ).toDF("employee_id", "name", "manager_id")
  }

  /** DuckDB VALUES literal for the same fixture, shared by the oracles;
    * aliased per use site because `... AS t(cols) extra_alias` is a syntax
    * error. */
  private def employeesSql(alias: String): String =
    s"""(VALUES
       | (1,'Alice (CEO)',CAST(NULL AS INT)),
       | (2,'Bob (VP of Sales)',1), (3,'Carol (VP of Engineering)',1),
       | (4,'David (Sales Manager 1)',2), (5,'Eve (Sales Manager 2)',2),
       | (6,'Frank (Engineering Manager 1)',3), (7,'Grace (Engineering Manager 2)',3),
       | (8,'Henry (Software Engineer 1)',6), (9,'Ian (Software Engineer 2)',6),
       | (10,'Jack (Software Engineer 3)',7)
       |) AS $alias(employee_id, name, manager_id)""".stripMargin

  private val MaxDepth = 100

  /** Generic ancestor-walk fixpoint: seeds with every employee and joins
    * the (broadcast) employees dim upward one manager per iteration.
    * `step` maps (frontier, employees-alias) to the next frontier — both
    * reference CTEs share this loop and differ only in carried columns.
    * Column order is re-selected each round because Spark union is
    * positional (SURVEY.md §7.4). */
  private[queries] def fixpoint(seed: DataFrame, step: DataFrame => DataFrame,
      maxDepth: Int = MaxDepth): DataFrame = {
    var acc = seed.localCheckpoint()
    var frontier = acc
    var depth = 0
    while (!frontier.isEmpty && depth < maxDepth) {
      frontier = step(frontier).localCheckpoint()
      acc = acc.union(frontier)
      depth += 1
    }
    acc
  }

  /** q04 entry point: Spark 4 ships native recursive CTEs (SPARK-24497),
    * which plan the whole iteration as one job — no per-round
    * localCheckpoint materializations — so the declared query uses SQL
    * text; `orgClosure` below is the portable fixpoint twin, proven
    * equal in SqlTwinsSpec. */
  def orgClosureNative(spark: SparkSession, sfDir: String): DataFrame =
    spark.sql(orgClosureSql)

  def managerChainsNative(spark: SparkSession, sfDir: String): DataFrame =
    spark.sql(managerChainsSql)

  /** First reference CTE (sql_definitions.sql:54-84): for every employee
    * (the "root"), enumerate its ancestor chain with the distance as
    * `hierarchy_level` (0 = the employee itself), then decorate the root
    * with its own name via a final equi-join. */
  def orgClosure(spark: SparkSession, sfDir: String): DataFrame = {
    val emp = employees(spark)
    val seed = emp.select(
      col("employee_id"), col("name"), col("manager_id"),
      lit(0).as("level"), col("employee_id").as("root_employee_id"))
    val closure = fixpoint(seed, { frontier =>
      val e = broadcast(emp.as("e"))
      frontier.as("eh")
        .join(e, col("e.employee_id") === col("eh.manager_id"))
        .select(
          col("e.employee_id").as("employee_id"),
          col("e.name").as("name"),
          col("e.manager_id").as("manager_id"),
          (col("eh.level") + 1).as("level"),
          col("eh.root_employee_id").as("root_employee_id"))
    })
    closure.as("eht")
      .join(broadcast(employees(spark).as("root")),
        col("eht.root_employee_id") === col("root.employee_id"))
      .select(
        col("eht.root_employee_id").as("employee_id"),
        col("root.name").as("employee_name"),
        col("eht.employee_id").as("hierarchy_employee_id"),
        col("eht.name").as("hierarchy_employee_name"),
        col("eht.level").as("hierarchy_level"))
      .orderBy(col("employee_id"), col("hierarchy_level").desc,
        col("hierarchy_employee_id"))
  }

  val orgClosureSql: String =
    s"""WITH RECURSIVE eht AS (
       |  SELECT employee_id, name, manager_id, 0 AS level,
       |         employee_id AS root_employee_id
       |  FROM ${employeesSql("employees")}
       |  UNION ALL
       |  SELECT e.employee_id, e.name, e.manager_id, eh.level + 1,
       |         eh.root_employee_id
       |  FROM ${employeesSql("e")}
       |  JOIN eht eh ON e.employee_id = eh.manager_id
       |)
       |SELECT eht.root_employee_id AS employee_id,
       |       root.name AS employee_name,
       |       eht.employee_id AS hierarchy_employee_id,
       |       eht.name AS hierarchy_employee_name,
       |       eht.level AS hierarchy_level
       |FROM eht
       |JOIN ${employeesSql("root")} ON eht.root_employee_id = root.employee_id
       |ORDER BY employee_id, hierarchy_level DESC, hierarchy_employee_id""".stripMargin

  /** Second reference CTE (sql_definitions.sql:93-121): concatenate the
    * full manager chain per employee ("A → A's manager → … → CEO") and
    * keep only the completed chains (walk terminated at the CEO). */
  def managerChains(spark: SparkSession, sfDir: String): DataFrame = {
    val emp = employees(spark)
    val seed = emp.select(
      col("employee_id"), col("name").as("employee_name"), col("manager_id"),
      col("name").as("manager_chain"), lit(1).as("hierarchy_level"))
    val walked = fixpoint(seed, { frontier =>
      val e = broadcast(emp.as("e"))
      frontier.as("eh")
        .join(e, col("eh.manager_id") === col("e.employee_id"))
        .select(
          col("eh.employee_id").as("employee_id"),
          col("eh.employee_name").as("employee_name"),
          col("e.manager_id").as("manager_id"),
          concat(col("eh.manager_chain"), lit(" → "), col("e.name"))
            .as("manager_chain"),
          (col("eh.hierarchy_level") + 1).as("hierarchy_level"))
    })
    walked
      .filter(col("manager_id").isNull)
      .select(
        col("employee_id"), col("employee_name"),
        col("manager_chain").as("full_manager_hierarchy"),
        col("hierarchy_level"))
      .orderBy(col("employee_id"), col("hierarchy_level").desc)
  }

  val managerChainsSql: String =
    s"""WITH RECURSIVE eh AS (
       |  SELECT employee_id, name AS employee_name, manager_id,
       |         name AS manager_chain, 1 AS hierarchy_level
       |  FROM ${employeesSql("employees")}
       |  UNION ALL
       |  SELECT eh.employee_id, eh.employee_name, e.manager_id,
       |         eh.manager_chain || ' → ' || e.name,
       |         eh.hierarchy_level + 1
       |  FROM eh
       |  JOIN ${employeesSql("e")} ON eh.manager_id = e.employee_id
       |)
       |SELECT employee_id, employee_name,
       |       manager_chain AS full_manager_hierarchy, hierarchy_level
       |FROM eh
       |WHERE manager_id IS NULL
       |ORDER BY employee_id, hierarchy_level DESC""".stripMargin

  /** NOT EXISTS anti-join (sql_definitions.sql:133-139) over the fixture
    * star schema — Orders ≙ customer base, Payments ≙ fulfilled ('F')
    * orders: customers who never had an order fulfilled. `left_anti`
    * matches NOT EXISTS null-key semantics exactly (SURVEY.md §2.4 J6).
    * At 100 TB the filter on the build side is pushed into the parquet
    * scan before the join, and Catalyst plans a hash anti-join. */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer")
    val fulfilled = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "F")
    cust.join(fulfilled, cust("c_custkey") === fulfilled("o_custkey"), "left_anti")
      .select(col("c_custkey").as("customer_id"), col("c_name").as("customer_name"))
      .orderBy("customer_id")
  }

  val customersWithoutOrdersSql: String =
    """SELECT c_custkey AS customer_id, c_name AS customer_name
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |ORDER BY customer_id""".stripMargin

  /** q63 — EXISTS semi-join, the dual of q06's NOT EXISTS (SURVEY.md §2.4
    * lists semi joins as absent from the reference): customers with at
    * least one fulfilled order. `left_semi` emits each probe row at most
    * once regardless of match multiplicity — the probe side never
    * duplicates, and only the probe side's columns survive. At 100 TB the
    * status filter is pushed into the build-side scan and the semi join
    * hashes on the key alone. */
  def customersWithOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer")
    val fulfilled = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "F")
    cust.join(fulfilled, cust("c_custkey") === fulfilled("o_custkey"), "left_semi")
      .select(col("c_custkey").as("customer_id"), col("c_name").as("customer_name"))
      .orderBy("customer_id")
  }

  val customersWithOrdersSql: String =
    """SELECT c_custkey AS customer_id, c_name AS customer_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |ORDER BY customer_id""".stripMargin
}
