package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decision-support join/subquery shapes beyond the reference's three BI
  * queries (BI_Questions.sql:3-37) — the classic TPC-H patterns the
  * reference's warehouse would grow into, adapted to the fixture columns
  * (no l_commitdate/l_receiptdate/l_shipmode/c_phone: "late" is defined
  * against o_orderdate, and Q22's country code becomes the nation dim).
  *
  * Scale notes (100 TB fact):
  *  - q187/q190 are correlated-EXISTS shapes; both plan as semi/anti hash
  *    joins on l_orderkey — ONE shuffle key shared by every branch of the
  *    self-join, so the sort/partition is reusable, never a subquery-per-row.
  *  - q188's fact×fact join shuffles on orderkey once; the delay CASE
  *    classification is a map-side expression.
  *  - q189's OR-of-ANDs predicate stays a single scan + broadcast part
  *    join: the disjunction references join-side columns, so it evaluates
  *    post-join, while the p_brand IN (...) prefilter is pushed to the
  *    part scan and l_quantity bounds to the lineitem scan.
  *  - q191's scalar threshold is a 1-row broadcast; the "no recent
  *    orders" test is a broadcast anti join against the date-pruned
  *    orders scan.
  *
  * Determinism: money stays DECIMAL(18,2) until the final cast; the q191
  * above-average test cross-multiplies (bal * n > sum) so no engine ever
  * divides; every output carries a total ORDER BY.
  */
object Decision {

  /** q187 — order-priority check (the TPC-H Q4 shape): of the orders
    * placed in 1997H1, how many per priority had at least one line item
    * shipped more than 30 days after the order date (a late-fulfilment
    * EXISTS probe).
    */
  def orderPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1997-07-01").cast("timestamp")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    // prune the probe side before the shuffle: a line shipped before
    // window-start + 30d can never satisfy the correlated condition
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-31").cast("timestamp"))
      .select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > date_add(ord("o_orderdate"), 30),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val orderPrioritySql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey
      |      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q188 — late-line classification (the TPC-H Q12 shape): among 1997
    * line items shipped more than 60 days after their order date, count
    * per linestatus how many belong to critical (URGENT/HIGH) vs other
    * priorities — the fact×fact join with CASE-sum classification.
    */
  def lateLines(spark: SparkSession, sfDir: String): DataFrame = {
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1998-01-01").cast("timestamp")
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lo)
      .select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate"))
    val ord = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val crit = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .filter(col("l_shipdate") > date_add(col("o_orderdate"), 60) &&
        col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .groupBy("l_linestatus")
      .agg(sum(when(crit, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(crit, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  val lateLinesSql: String =
    """SELECT l_linestatus,
      |       SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |                THEN 1 ELSE 0 END) AS high_line_count,
      |       SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |                THEN 0 ELSE 1 END) AS low_line_count
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      |  AND l.l_shipdate  >= TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q189 — disjunctive-predicate revenue (the TPC-H Q19 shape): revenue
    * from three OR'd brand/size/quantity bands, reported per band. The
    * brand IN-list prefilter pushes to the part scan and the overall
    * quantity envelope to the lineitem scan; the full OR-of-ANDs
    * (referencing both sides) evaluates after the broadcast join.
    */
  def disjunctiveRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.load(spark, sfDir, "part")
      .filter(col("p_brand").isin("Brand#2", "Brand#4", "Brand#17"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 35)
    val band1 = col("p_brand") === "Brand#2" &&
      col("p_size").between(1, 15) && col("l_quantity").between(1, 20)
    val band2 = col("p_brand") === "Brand#4" &&
      col("p_size").between(10, 30) && col("l_quantity").between(10, 30)
    val band3 = col("p_brand") === "Brand#17" &&
      col("p_size").between(20, 50) && col("l_quantity").between(15, 35)
    val rev = Tables.money(col("l_extendedprice")) *
      (lit(1.0) - col("l_discount")).cast("decimal(4,2)")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .filter(band1 || band2 || band3)
      .select(
        when(band1, "band1").when(band2, "band2").otherwise("band3")
          .as("band"),
        rev.as("rev"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_items"),
        sum(col("rev")).cast("double").as("revenue"))
      .orderBy("band")
  }

  val disjunctiveRevenueSql: String =
    """WITH j AS (
      |  SELECT CASE
      |           WHEN p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 15
      |                AND l_quantity BETWEEN 1 AND 20 THEN 'band1'
      |           WHEN p_brand = 'Brand#4'  AND p_size BETWEEN 10 AND 30
      |                AND l_quantity BETWEEN 10 AND 30 THEN 'band2'
      |           ELSE 'band3' END AS band,
      |         CAST(l_extendedprice AS DECIMAL(18,2))
      |           * CAST(1.0 - l_discount AS DECIMAL(4,2)) AS rev
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 15
      |         AND l_quantity BETWEEN 1 AND 20)
      |     OR (p_brand = 'Brand#4'  AND p_size BETWEEN 10 AND 30
      |         AND l_quantity BETWEEN 10 AND 30)
      |     OR (p_brand = 'Brand#17' AND p_size BETWEEN 20 AND 50
      |         AND l_quantity BETWEEN 15 AND 35)
      |)
      |SELECT band, COUNT(*) AS n_items, CAST(SUM(rev) AS DOUBLE) AS revenue
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  /** q190 — waiting suppliers (the TPC-H Q21 shape): suppliers who were
    * the ONLY late shipper (ship > order date + 60d) in a multi-supplier
    * order. The textbook form is a semi join (another supplier exists)
    * plus an anti join (no OTHER late supplier); that plans the fact join
    * THREE times (no exchange reuse across the differently-projected
    * branches), so this implementation counts instead: per (order,
    * supplier) late flags, then per-order supplier/late-supplier counts —
    * "only late in a multi-supplier order" ⇔ n_supp > 1 ∧ n_late = 1 ∧
    * this supplier late. One explicit repartition on l_orderkey up front
    * co-partitions BOTH aggregates and the self-join (HashPartitioning
    * on orderkey satisfies every downstream clustering), so the fact is
    * scanned once and shuffled once. The oracle keeps the EXISTS/NOT
    * EXISTS formulation, proving the two equivalent.
    */
  def waitingSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val ord = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
    val perSupp = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > date_add(col("o_orderdate"), 60)).as("late"))
      .repartition(col("l_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("late")).as("late"))
      .localCheckpoint() // one fact pass feeds both the per-order rollup
                         // and the re-join below (no exchange reuse
                         // across differently-shaped consumers)
    val perOrder = perSupp.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
      .select(col("l_orderkey"))
    val only = perSupp.filter(col("late"))
      .join(perOrder, "l_orderkey")
    val supp = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_name"))
    only.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  val waitingSuppliersSql: String =
    """WITH per_supp AS (
      |  SELECT l.l_orderkey, l.l_suppkey,
      |         MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |                  THEN 1 ELSE 0 END) AS late
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1, 2
      |)
      |SELECT s_name, COUNT(*) AS numwait
      |FROM per_supp p JOIN supplier s ON p.l_suppkey = s.s_suppkey
      |WHERE p.late = 1
      |  AND EXISTS (SELECT 1 FROM per_supp q
      |              WHERE q.l_orderkey = p.l_orderkey
      |                AND q.l_suppkey <> p.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM per_supp q
      |                  WHERE q.l_orderkey = p.l_orderkey
      |                    AND q.l_suppkey <> p.l_suppkey
      |                    AND q.late = 1)
      |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin

  /** q191 — idle high-balance customers (the TPC-H Q22 shape): customers
    * whose balance exceeds the average positive balance and who placed no
    * order since 1999, counted per nation. The above-average test
    * cross-multiplies (bal * n > total) so neither engine divides — the
    * threshold compare is integer-exact decimal on both sides.
    */
  def idleCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer")
    val bal = Tables.money(col("c_acctbal"))
    val thresh = cust.filter(col("c_acctbal") > 0)
      .agg(sum(bal).as("tot"), count(lit(1)).as("n"))
    val recent = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val nation = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    cust.crossJoin(broadcast(thresh))
      .filter(bal * col("n") > col("tot"))
      .join(recent, cust("c_custkey") === recent("o_custkey"), "left_anti")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"),
        sum(bal).cast("double").as("totacctbal"))
      .orderBy("n_name")
  }

  val idleCustomersSql: String =
    """WITH t AS (
      |  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS tot,
      |         COUNT(*) AS n
      |  FROM customer WHERE c_acctbal > 0
      |)
      |SELECT n_name, COUNT(*) AS numcust,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |         AS totacctbal
      |FROM customer c
      |CROSS JOIN t
      |JOIN nation ON c.c_nationkey = n_nationkey
      |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * t.n > t.tot
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
