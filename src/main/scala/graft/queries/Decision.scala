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
  *  - q186/q189 are correlated-EXISTS shapes; both plan as semi/anti hash
  *    joins on l_orderkey — ONE shuffle key shared by every branch of the
  *    self-join, so the sort/partition is reusable, never a subquery-per-row.
  *  - q187's fact×fact join shuffles on orderkey once; the delay CASE
  *    classification is a map-side expression.
  *  - q188's OR-of-ANDs predicate stays a single scan + broadcast part
  *    join: the disjunction references join-side columns, so it evaluates
  *    post-join, while the p_brand IN (...) prefilter is pushed to the
  *    part scan and l_quantity bounds to the lineitem scan.
  *  - q190's scalar threshold is a 1-row broadcast; the "no recent
  *    orders" test is a broadcast anti join against the date-pruned
  *    orders scan.
  *
  * Determinism: money stays DECIMAL(18,2) until the final cast; the q190
  * above-average test cross-multiplies (bal * n > sum) so no engine ever
  * divides; every output carries a total ORDER BY.
  */
object Decision {

  /** q186 — order-priority check (the TPC-H Q4 shape): of the orders
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

  /** q187 — late-line classification (the TPC-H Q12 shape): among 1997
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
      |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      |  AND l.l_shipdate  >= TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q188 — disjunctive-predicate revenue (the TPC-H Q19 shape): revenue
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

  /** q189 — waiting suppliers (the TPC-H Q21 shape): suppliers who were
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

  /** q190 — idle high-balance customers (the TPC-H Q22 shape): customers
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

  // --------------------------------------------------------------------
  // Round-4 additions: the remaining TPC-H shapes the fixture can
  // express. Q2/Q11/Q16/Q20 need a partsupp table (supply cost /
  // available quantity per supplier×part) that the fixture does not
  // carry, so 18 of the 22 shapes are the complete reachable set.
  // --------------------------------------------------------------------

  /** q201 — pricing summary (the TPC-H Q1 shape): the classic full-scan
    * report over shipped lines. One scan, map-side partial aggregation
    * into six groups — the canonical "is the agg pipeline partial+final"
    * probe. All money stays decimal until the output edge; averages are
    * CAST(exact-sum AS DOUBLE)/count in BOTH engines so the one FP op
    * (the division) is bit-identical.
    */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val price = Tables.money(col("l_extendedprice"))
    val discF = (lit(1.0) - col("l_discount")).cast("decimal(4,2)")
    val taxF = (lit(1.0) + col("l_tax")).cast("decimal(4,2)")
    Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * discF).cast("double").as("sum_disc_price"),
        sum(price * discF * taxF).cast("double").as("sum_charge"),
        (sum(col("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(price).cast("double") / count(lit(1))).as("avg_price"),
        (sum(col("l_discount").cast("decimal(4,2)")).cast("double") /
          count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |         AS sum_base_price,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
      |         AS sum_disc_price,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * CAST(1.0 - l_discount AS DECIMAL(4,2))
      |                * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DOUBLE)
      |         AS sum_charge,
      |       CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*) AS avg_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |         / COUNT(*) AS avg_price,
      |       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
      |         / COUNT(*) AS avg_disc,
      |       COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q202 — bilateral shipping volume (the TPC-H Q7 shape): revenue
    * shipped between the nation-1..5 and nation-6..10 trade blocks
    * (either direction) per year. Two blocks rather than the textbook
    * two nations so the sf0.001 smoke fixture (10 suppliers) still
    * produces rows. Scale shape: both SF-scaled dims (supplier,
    * customer) are prefiltered to their block BEFORE their joins and
    * left UNHINTED — AQE broadcasts them while small, shuffles on the
    * key at scale; the 25-row nation name lookups are the only forced
    * broadcasts. The fact joins shuffle once on l_orderkey and once on
    * o_custkey — the two unavoidable exchanges of this shape.
    */
  def nationVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val blockA = (1L to 5L).toSeq
    val blockB = (6L to 10L).toSeq
    val both = blockA ++ blockB
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
    val supp = Tables.load(spark, sfDir, "supplier")
      .filter(col("s_nationkey").isin(both: _*))
      .select(col("s_suppkey"), col("s_nationkey"))
    val ord = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.load(spark, sfDir, "customer")
      .filter(col("c_nationkey").isin(both: _*))
      .select(col("c_custkey"), col("c_nationkey"))
    val nation = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val sn = broadcast(nation.select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation")))
    val cn = broadcast(nation.select(col("n_nationkey").as("cn_key"),
      col("n_name").as("cust_nation")))
    val rev = Tables.money(col("l_extendedprice")) *
      (lit(1.0) - col("l_discount")).cast("decimal(4,2)")
    val crossBlock =
      (col("s_nationkey") <= 5 && col("c_nationkey") >= 6) ||
        (col("s_nationkey") >= 6 && col("c_nationkey") <= 5)
    li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(crossBlock)
      .join(sn, col("s_nationkey") === col("sn_key"))
      .join(cn, col("c_nationkey") === col("cn_key"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(rev).cast("double").as("volume"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val nationVolumeSql: String =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |       YEAR(l_shipdate) AS l_year,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
      |         AS volume
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN orders o   ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      |JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
      |WHERE s.s_nationkey BETWEEN 1 AND 10
      |  AND c.c_nationkey BETWEEN 1 AND 10
      |  AND ((s.s_nationkey <= 5 AND c.c_nationkey >= 6) OR
      |       (s.s_nationkey >= 6 AND c.c_nationkey <= 5))
      |  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** q203 — product-line profit (the TPC-H Q9 shape, adapted: the
    * fixture has no partsupp/supplycost, so profit is discounted
    * revenue, and the year comes from l_shipdate — no orders join
    * needed). Parts matching '%red%' prefilter 1/8 of the part dim
    * before its UNHINTED join; supplier rides the same pattern; nation
    * names are the only forced broadcast.
    */
  def partProfit(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.load(spark, sfDir, "part")
      .filter(col("p_name").contains("red"))
      .select(col("p_partkey"))
    val supp = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val nation = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val rev = Tables.money(col("l_extendedprice")) *
      (lit(1.0) - col("l_discount")).cast("decimal(4,2)")
    Tables.load(spark, sfDir, "lineitem")
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).as("o_year"))
      .agg(sum(rev).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val partProfitSql: String =
    """SELECT n_name AS nation, YEAR(l_shipdate) AS o_year,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
      |         AS sum_profit
      |FROM lineitem l
      |JOIN part p     ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n   ON s.s_nationkey = n.n_nationkey
      |WHERE p.p_name LIKE '%red%'
      |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin

  /** q204 — returned-item reporting (the TPC-H Q10 shape): the top 20
    * customers by revenue lost to returned ('R') lines on 1997H2
    * orders. The per-customer rollup happens BEFORE the customer-dim
    * join (the aggregate is |customers|-sized, not |lineitem|-sized),
    * and the revenue sort key is decimal-exact on both engines so the
    * top-20 cut is deterministic (custkey tiebreak).
    */
  def returnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val rev = Tables.money(col("l_extendedprice")) *
      (lit(1.0) - col("l_discount")).cast("decimal(4,2)")
    val perCust = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(rev).as("rev"))
    val cust = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_nationkey"))
    val nation = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    perCust.join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"),
        col("rev").cast("double").as("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val returnedItemsSql: String =
    """SELECT c_custkey, c_name,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
      |         AS revenue,
      |       c_acctbal, n_name
      |FROM lineitem l
      |JOIN orders o   ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n   ON c.c_nationkey = n.n_nationkey
      |WHERE l.l_returnflag = 'R'
      |  AND o.o_orderdate >= TIMESTAMP '1997-07-01'
      |  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 4, 5
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** q205 — customer order-count distribution (the TPC-H Q13 shape):
    * how many customers placed exactly k orders, including k = 0 (the
    * LEFT join is the point of the query). Two shuffles — custkey then
    * c_count — both over frames that only ever shrink.
    */
  def orderCountDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer").select(col("c_custkey"))
    val ord = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val orderCountDistributionSql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |  GROUP BY 1
      |)
      |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** q206 — top supplier of the quarter (the TPC-H Q15 shape): the
    * supplier(s) whose 1997Q1 shipped revenue equals the maximum. The
    * textbook view+scalar-subquery becomes a 1-row broadcast cross
    * join compared in EXACT decimal (never a double equality, never an
    * unpartitioned window over the supplier-sized rollup).
    */
  def quarterTopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.money(col("l_extendedprice")) *
      (lit(1.0) - col("l_discount")).cast("decimal(4,2)")
    val perSupp = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(rev).as("total_rev"))
    val top = perSupp.agg(max(col("total_rev")).as("max_rev"))
    val supp = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_name"))
    perSupp.crossJoin(broadcast(top))
      .filter(col("total_rev") === col("max_rev"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  val quarterTopSupplierSql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey,
      |         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |             * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate <  TIMESTAMP '1997-04-01'
      |  GROUP BY 1
      |)
      |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
      |FROM revenue r JOIN supplier s ON r.l_suppkey = s.s_suppkey
      |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** q207 — small-quantity revenue (the TPC-H Q17 shape, adapted to the
    * fixture's brands): per brand, the yearly revenue that would vanish
    * if orders below 20% of that part's average quantity were dropped.
    * The correlated scalar subquery becomes a per-part aggregate joined
    * back on l_partkey (both sides hash-partitioned on the same key);
    * the 0.2×avg comparison cross-multiplies (qty*5*cnt < sum) so no
    * engine divides — quantities are integral doubles, exact.
    */
  def smallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.load(spark, sfDir, "part")
      .filter(col("p_brand").isin("Brand#5", "Brand#12"))
      .select(col("p_partkey"), col("p_brand"))
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(part, col("l_partkey") === col("p_partkey"))
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("cq"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") * lit(5.0) * col("cq") < col("sq"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"),
        (sum(Tables.money(col("l_extendedprice"))).cast("double") / 7.0)
          .as("avg_yearly"))
      .orderBy("p_brand")
  }

  val smallQtyRevenueSql: String =
    """WITH sel AS (
      |  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice, p.p_brand
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE p.p_brand IN ('Brand#5', 'Brand#12')
      |), per_part AS (
      |  SELECT l_partkey AS pk, SUM(l_quantity) AS sq, COUNT(*) AS cq
      |  FROM sel GROUP BY 1
      |)
      |SELECT p_brand, COUNT(*) AS n_lines,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |         / 7.0 AS avg_yearly
      |FROM sel s JOIN per_part t ON s.l_partkey = t.pk
      |WHERE s.l_quantity * 5.0 * t.cq < t.sq
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q208 — large-volume customers (the TPC-H Q18 shape): the top 20
    * orders whose total line quantity exceeds 300 units, with their
    * customers. The HAVING rollup runs on the fact BEFORE any dim
    * join, so the order/customer joins see only the qualifying ~0.3%
    * of orders. o_totalprice DESC + orderkey gives a total sort.
    */
  def volumeCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 300.0)
    val ord = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"))
    val cust = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"))
    big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  val volumeCustomersSql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      |       SUM(l_quantity) AS sum_qty
      |FROM lineitem l
      |JOIN orders o   ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY 1, 2, 3, 4, 5
      |HAVING SUM(l_quantity) > 300.0
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  // --------------------------------------------------------------------
  // Derived partsupp (q247-q250): the fixture ships no partsupp table,
  // so the four TPC-H shapes that need one (Q2/Q11/Q16/Q20) derive it
  // deterministically from part × supplier — ~4 suppliers per part
  // chosen by an md5 hash of (partkey, slot), availqty/supplycost as
  // md5-derived integers (cost kept in integer CENTS so every
  // aggregate over it is exact). Both engines compute the identical
  // expressions, so the derived table is byte-identical and fully
  // oracle-checkable with zero new fixture bytes.
  // --------------------------------------------------------------------

  /** Deterministic partsupp: for each part, slots 0..3 hash to a
    * supplier key (duplicate hits collapse via DISTINCT, so a part has
    * 3-4 distinct suppliers), then availqty ∈ [1, 9999] and
    * supplycost_cents ∈ [100, 100000] hash off the surviving
    * (partkey, suppkey) pair. The supplier COUNT rides a 1-row
    * broadcast anchor (the accepted scalar shape) — the derivation
    * itself is a map-side expression over the part scan, no
    * part × supplier cross ever materializes. */
  def partsupp(spark: SparkSession, sfDir: String): DataFrame = {
    val nSup = Tables.load(spark, sfDir, "supplier")
      .agg(count(lit(1)).as("n_sup"))
    val h = (c: org.apache.spark.sql.Column) => graft.ext.Dedup.hash60(c)
    Tables.load(spark, sfDir, "part").select(col("p_partkey"))
      .crossJoin(broadcast(nSup))
      .select(col("p_partkey"),
        explode(typedlit(Seq(0, 1, 2, 3))).as("k"), col("n_sup"))
      .select(col("p_partkey").as("ps_partkey"),
        // 0-based: the fixture's s_suppkey runs 0..S-1 (verified in the
        // parquet), so the modulus maps straight onto real suppliers —
        // a `% n + 1` here would orphan supplier 0 and fabricate a
        // phantom key S that silently drops out of every supplier join
        (h(concat_ws("|", col("p_partkey"), col("k"))) % col("n_sup"))
          .as("ps_suppkey"))
      .distinct()
      .select(col("ps_partkey"), col("ps_suppkey"),
        (h(concat_ws("|", col("ps_partkey"), col("ps_suppkey"), lit("a")))
          % 9999 + 1).as("ps_availqty"),
        (h(concat_ws("|", col("ps_partkey"), col("ps_suppkey"), lit("c")))
          % 99901 + 100).as("ps_supplycost_cents"))
  }

  /** The same derivation as DuckDB CTEs (prefix for the four oracles).
    *
    * Hardened (round 8): the original embedded a scalar subquery
    * (`% (SELECT COUNT(*) FROM supplier)`) inside a DISTINCT
    * projection — a legitimate per-session replan hazard, now a
    * pre-aggregated 1-row CTE cross-joined in, with `AS MATERIALIZED`
    * barriers pinning both derivation stages (the q253-twin
    * precedent).  NOTE (round 8 adjudication): the driver-gate q248
    * flake PERSISTED after this hardening while 8 single-session
    * sweeps × 257 oracles could not flip it — the flake was
    * adjudicated to the DRIVER's compare path (decimal128 output
    * handling the prime suspect), not to this SQL.  Keep the barriers
    * (they remove a real hazard) but do not chase the flake here; see
    * `tools/flake_repro.py --full` and q248's BIGINT output cast.
    * At fixture SFs the materialized table is ≤ 4·|part| rows, so the
    * barrier costs nothing. */
  val partsuppCte: String = {
    val h = graft.ext.Dedup.hash60Sql
    s"""supcnt AS MATERIALIZED (
      |  SELECT COUNT(*) AS n_sup FROM supplier
      |), pscand AS MATERIALIZED (
      |  SELECT DISTINCT p.p_partkey AS ps_partkey,
      |         ${h("p.p_partkey::VARCHAR||'|'||k.k::VARCHAR")}
      |           % sc.n_sup AS ps_suppkey
      |  FROM part p, (SELECT unnest([0,1,2,3]) AS k) k, supcnt sc
      |), partsupp AS MATERIALIZED (
      |  SELECT ps_partkey, ps_suppkey,
      |         1 + ${h("ps_partkey::VARCHAR||'|'||ps_suppkey::VARCHAR||'|a'")}
      |               % 9999 AS ps_availqty,
      |         100 + ${h("ps_partkey::VARCHAR||'|'||ps_suppkey::VARCHAR||'|c'")}
      |               % 99901 AS ps_supplycost_cents
      |  FROM pscand
      |)""".stripMargin
  }

  /** q247 — min-cost supplier (the TPC-H Q2 shape): for STANDARD
    * size-15 parts, the EUROPE supplier(s) whose supply cost equals
    * the part's regional minimum. The correlated MIN subquery becomes
    * a per-part aggregate equi-joined back on (partkey, cost) — one
    * shuffle on partkey shared by both branches, never a
    * subquery-per-row; dims (supplier/nation/region) broadcast. */
  def minCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val eligible = partsupp(spark, sfDir)
      .join(Tables.load(spark, sfDir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal")),
        col("s_suppkey") === col("ps_suppkey"))
      .join(Tables.load(spark, sfDir, "nation"),
        col("n_nationkey") === col("s_nationkey"))
      .join(Tables.load(spark, sfDir, "region")
        .filter(col("r_name") === "EUROPE"),
        col("r_regionkey") === col("n_regionkey"))
      .select(col("ps_partkey"), col("ps_suppkey"),
        col("ps_supplycost_cents"), col("s_acctbal"), col("s_name"),
        col("n_name"))
    val minCost = eligible.groupBy(col("ps_partkey").as("mk"))
      .agg(min("ps_supplycost_cents").as("mc"))
    eligible
      .join(minCost, col("ps_partkey") === col("mk") &&
        col("ps_supplycost_cents") === col("mc"))
      .join(Tables.load(spark, sfDir, "part")
        .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
        .select(col("p_partkey"), col("p_brand")),
        col("p_partkey") === col("ps_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"), col("ps_suppkey"),
        col("ps_supplycost_cents"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"), col("ps_suppkey"))
      .limit(100)
  }

  val minCostSupplierSql: String =
    s"""WITH $partsuppCte, eligible AS (
       |  SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost_cents,
       |         s.s_acctbal, s.s_name, n.n_name
       |  FROM partsupp ps
       |  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
       |  JOIN nation n ON n.n_nationkey = s.s_nationkey
       |  JOIN region r ON r.r_regionkey = n.n_regionkey
       |  WHERE r.r_name = 'EUROPE'
       |), mincost AS (
       |  SELECT ps_partkey, MIN(ps_supplycost_cents) AS mc
       |  FROM eligible GROUP BY 1
       |)
       |SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_brand,
       |       e.ps_suppkey, e.ps_supplycost_cents
       |FROM eligible e
       |JOIN mincost m ON e.ps_partkey = m.ps_partkey
       |              AND e.ps_supplycost_cents = m.mc
       |JOIN part p ON p.p_partkey = e.ps_partkey
       |WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, ps_suppkey
       |LIMIT 100""".stripMargin

  /** q248 — important stock (the TPC-H Q11 shape): per-part inventory
    * value held by NATION_3 suppliers, keeping parts above 2× the
    * average share. The textbook HAVING-over-scalar-subquery becomes a
    * 1-row (total, group-count) broadcast anchor compared in exact
    * integer cents (value·groups > 2·total ⟺ share > 2/groups) — a
    * scale-invariant threshold where TPC-H's 0.0001/SF fraction would
    * empty out or saturate at fixture sizes. */
  def importantStock(spark: SparkSession, sfDir: String): DataFrame = {
    // per-pair value tops out near 1e9 cents, so the corpus total `t`
    // passes Long.MaxValue around 1e10 pairs — exactly the 100 TB
    // design point. DECIMAL(38,0) folds (HUGEINT in the twin) keep the
    // total and the cross-multiplied threshold compare exact where a
    // BIGINT sum would wrap silently under Spark's non-ANSI mode.
    // The OUTPUT column, however, is per-part: the derivation caps a
    // part at 4 (partkey, suppkey) pairs and each pair's value at
    // 100000 · 9999, so value_cents ≤ 4 · 999 900 000 < 4e9 at ANY
    // scale factor — it leaves as BIGINT (range pinned in
    // DecisionSpec), eliminating decimal128 from the query's output
    // surface (the round-8 flake adjudication's prime suspect in the
    // driver's cross-engine hash).
    val grp = partsupp(spark, sfDir)
      .join(Tables.load(spark, sfDir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey")),
        col("s_suppkey") === col("ps_suppkey"))
      .join(Tables.load(spark, sfDir, "nation")
        .filter(col("n_name") === "NATION_3"),
        col("n_nationkey") === col("s_nationkey"))
      .groupBy("ps_partkey")
      .agg(sum((col("ps_supplycost_cents") * col("ps_availqty"))
        .cast("decimal(38,0)")).as("value_dec"))
    val tot = grp.agg(sum("value_dec").as("t"), count(lit(1)).as("g"))
    grp.crossJoin(broadcast(tot))
      .filter(col("value_dec") * col("g") > col("t") * 2)
      .select(col("ps_partkey"),
        col("value_dec").cast("long").as("value_cents"))
      .orderBy(col("value_cents").desc, col("ps_partkey"))
  }

  val importantStockSql: String =
    s"""WITH $partsuppCte, natps AS (
       |  SELECT ps.ps_partkey,
       |         ps.ps_supplycost_cents * ps.ps_availqty AS v
       |  FROM partsupp ps
       |  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
       |  JOIN nation n ON n.n_nationkey = s.s_nationkey
       |  WHERE n.n_name = 'NATION_3'
       |), grp AS MATERIALIZED (
       |  SELECT ps_partkey,
       |         CAST(SUM(v::HUGEINT) AS DECIMAL(38,0)) AS value_dec
       |  FROM natps GROUP BY 1
       |), tot AS (
       |  SELECT CAST(SUM(value_dec) AS DECIMAL(38,0)) AS t, COUNT(*) AS g
       |  FROM grp
       |)
       |SELECT ps_partkey, CAST(value_dec AS BIGINT) AS value_cents
       |FROM grp, tot
       |WHERE value_dec * g > t * 2
       |ORDER BY value_cents DESC, ps_partkey""".stripMargin

  /** q249 — supplier counts by part attribute (the TPC-H Q16 shape):
    * distinct suppliers per (brand, type, size) over the filtered
    * catalog, excluding flagged suppliers (negative account balance —
    * the fixture's stand-in for Q16's complaint-comment filter) via a
    * null-safe anti-join. One shuffle on partkey for the part join,
    * one on the group key for the distinct count; the tiny flagged
    * list broadcasts. */
  def supplierPartTypes(spark: SparkSession, sfDir: String): DataFrame = {
    val sizes = Seq(1, 5, 9, 15, 22, 28, 35, 42, 49)
    val flagged = Tables.load(spark, sfDir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    partsupp(spark, sfDir)
      .join(flagged, col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .join(Tables.load(spark, sfDir, "part")
        .filter(col("p_brand") =!= "Brand#11" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(sizes: _*))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size")),
        col("p_partkey") === col("ps_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val supplierPartTypesSql: String =
    s"""WITH $partsuppCte
       |SELECT p.p_brand, p.p_type, p.p_size,
       |       CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
       |FROM partsupp ps
       |JOIN part p ON p.p_partkey = ps.ps_partkey
       |WHERE p.p_brand <> 'Brand#11' AND p.p_type <> 'PROMO'
       |  AND p.p_size IN (1,5,9,15,22,28,35,42,49)
       |  AND ps.ps_suppkey NOT IN
       |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** q250 — promotable suppliers (the TPC-H Q20 shape): NATION_8
    * suppliers holding surplus stock (availqty > half the part's 1997
    * shipped quantity) of 'small%' parts — the nested-semi-join
    * pattern. Adapted: the correlated half-sum is per PART (the
    * derived partsupp's (part, supplier) pairs are synthetic, so the
    * TPC-H pair-level correlation would never bind); quantities sum as
    * exact BIGINT so the threshold compare is integer on both engines.
    * Shape: one shuffle on partkey (shipped agg + partsupp probe),
    * then a distinct-suppkey semi-join into the supplier dim. */
  def promotableSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val shipped = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
    val promo = partsupp(spark, sfDir)
      .join(Tables.load(spark, sfDir, "part")
        .filter(col("p_name").startsWith("small"))
        .select(col("p_partkey")),
        col("p_partkey") === col("ps_partkey"))
      .join(shipped, col("l_partkey") === col("ps_partkey"))
      .filter(col("ps_availqty") * 2 > col("qty"))
      .select(col("ps_suppkey")).distinct()
    Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
      .join(Tables.load(spark, sfDir, "nation")
        .filter(col("n_name") === "NATION_8"),
        col("n_nationkey") === col("s_nationkey"))
      .join(promo, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_name", "s_suppkey")
  }

  val promotableSuppliersSql: String =
    s"""WITH $partsuppCte, shipped AS (
       |  SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
       |           AS qty
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |    AND l_shipdate <  TIMESTAMP '1998-01-01'
       |  GROUP BY 1
       |), promo AS (
       |  SELECT DISTINCT ps.ps_suppkey
       |  FROM partsupp ps
       |  JOIN part p ON p.p_partkey = ps.ps_partkey
       |             AND p.p_name LIKE 'small%'
       |  JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
       |  WHERE ps.ps_availqty * 2 > sh.qty
       |)
       |SELECT s.s_suppkey, s.s_name
       |FROM supplier s
       |JOIN nation n ON n.n_nationkey = s.s_nationkey
       |WHERE n.n_name = 'NATION_8'
       |  AND s.s_suppkey IN (SELECT ps_suppkey FROM promo)
       |ORDER BY s_name, s_suppkey""".stripMargin
}
