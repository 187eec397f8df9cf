package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's three BI queries (BI_Questions.sql:3-37), re-expressed
  * over the fixture star schema (FIXTURES.md §B mapping):
  * fact = lineitem/orders, products dim = part, customers dim = customer.
  *
  * Scale notes (100 TB fact):
  *  - q1/q2 join a huge fact to a small dim → `broadcast()` the dim so the
  *    fact never shuffles for the join; the aggregation is a partial+final
  *    hash agg (map-side combine) on the grouping key only.
  *  - q2's RANK window is unpartitioned but sits ABOVE the aggregation, so
  *    it sees one row per customer, not per fact row; still, at extreme
  *    customer cardinality the top-k should be pre-narrowed — Catalyst
  *    plans ORDER+LIMIT as TakeOrderedAndProject, which we rely on.
  *  - q3's date filter is a pushed-down parquet predicate; with a
  *    date-partitioned layout it becomes partition pruning for free.
  *
  * Determinism for the DuckDB oracle: money sums run in DECIMAL(18,2)
  * (exact, order-independent) and cast to double at the end; the q3 anchor
  * date is pinned to the fixture max date instead of current_date()
  * (SURVEY.md §7.4); every output has a total ORDER BY.
  */
object Bi {

  /** Q1 — total revenue per product category (BI_Questions.sql:3-10).
    * scan(fact) ⋈bcast scan(part) → Γ_category SUM(amount) → sort. */
  def revenueByCategory(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy(part("p_type").as("product_category"))
      .agg(sum(Tables.money(li("l_extendedprice"))).as("rev_dec"))
      .select(
        col("product_category"),
        col("rev_dec").cast("double").as("total_sales_revenue"))
      .orderBy(col("total_sales_revenue").desc, col("product_category"))
  }

  val revenueByCategorySql: String =
    """SELECT p_type AS product_category,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales_revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |GROUP BY p_type
      |ORDER BY total_sales_revenue DESC, product_category""".stripMargin

  /** Q2 — top-5 customers by total purchase amount (BI_Questions.sql:15-24).
    * RANK() OVER (ORDER BY SUM(amount) DESC) computed above the agg; the
    * LIMIT 5 becomes rank<=5 so ties at the boundary are deterministic. */
  def topCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
    val cust = Tables.load(spark, sfDir, "customer")
    val spend = orders
      .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
      .groupBy(orders("o_custkey").as("customer_id"), cust("c_name").as("customer_name"))
      .agg(sum(Tables.money(orders("o_totalprice"))).as("spend_dec"))
    spend
      .withColumn("top_rank",
        rank().over(Window.orderBy(col("spend_dec").desc)).cast("long"))
      .filter(col("top_rank") <= 5)
      .select(
        col("customer_id"), col("customer_name"),
        col("spend_dec").cast("double").as("purchase_amount"),
        col("top_rank"))
      .orderBy(col("top_rank"), col("customer_id"))
  }

  val topCustomersSql: String =
    """WITH spend AS (
      |  SELECT o_custkey AS customer_id, c_name AS customer_name,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |), ranked AS (
      |  SELECT customer_id, customer_name,
      |         CAST(spend_dec AS DOUBLE) AS purchase_amount,
      |         CAST(RANK() OVER (ORDER BY spend_dec DESC) AS BIGINT) AS top_rank
      |  FROM spend
      |)
      |SELECT customer_id, customer_name, purchase_amount, top_rank
      |FROM ranked WHERE top_rank <= 5
      |ORDER BY top_rank, customer_id""".stripMargin

  /** Q3 — monthly sales trend, last 12 months (BI_Questions.sql:30-37).
    * The anchor is the fixture's max ship date (not current_date(), which
    * would be oracle-nondeterministic — SURVEY.md §7.4).
    *
    * Two-phase on purpose: the anchor is materialized by a tiny
    * single-column job FIRST so the main scan filters on a LITERAL —
    * that's what reaches parquet PushedFilters (min/max row-group
    * skipping, and partition pruning under a date-partitioned layout).
    * The lazy crossJoin(broadcast(anchor)) variant kept the predicate
    * data-dependent and un-pushable (verified via explain). */
  def monthlyTrend(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    // .get(0), not getTimestamp: the fixture column is TIMESTAMP_NTZ,
    // which surfaces as LocalDateTime; lit() rebuilds the right literal
    // type either way.
    val anchorTs = li
      .agg(date_trunc("month", add_months(max(col("l_shipdate")), -12))
        .as("anchor_ts"))
      .head().get(0)
    li.filter(col("l_shipdate") >= lit(anchorTs))
      .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("sales_month"))
      .agg(sum(Tables.money(col("l_extendedprice"))).as("sales_dec"))
      .select(col("sales_month"), col("sales_dec").cast("double").as("total_sales"))
      .orderBy("sales_month")
  }

  /** q24 — rollup through the GENERATED dates dimension (the reference
    * declares `dates` but never populates it, sql_definitions.sql:185-190;
    * we generate it distributedly and use it): fact ⋈bcast calendar →
    * year/month aggregate. */
  def calendarRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val dates = graft.etl.StarSchema.datesDim(spark, "1995-01-01", "2001-12-31")
    li.join(broadcast(dates), col("l_shipdate").cast("date") === col("date_key"))
      .groupBy(col("year_num"), col("month_num"))
      .agg(count(lit(1)).as("n_items"),
        sum(Tables.money(col("l_extendedprice"))).as("t_dec"))
      .select(col("year_num"), col("month_num"), col("n_items"),
        col("t_dec").cast("double").as("total_sales"))
      .orderBy("year_num", "month_num")
  }

  val calendarRollupSql: String =
    """WITH dates AS (
      |  SELECT CAST(d AS DATE) AS date_key,
      |         CAST(year(d) AS INT) AS year_num,
      |         CAST(month(d) AS INT) AS month_num
      |  FROM generate_series(DATE '1995-01-01', DATE '2001-12-31',
      |                       INTERVAL 1 DAY) t(d)
      |)
      |SELECT year_num, month_num,
      |       CAST(COUNT(*) AS BIGINT) AS n_items,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales
      |FROM lineitem JOIN dates ON CAST(l_shipdate AS DATE) = date_key
      |GROUP BY 1, 2
      |ORDER BY year_num, month_num""".stripMargin

  /** q28 — distinct-cardinality rollup: exact COUNT(DISTINCT) per flag
    * (two-shuffle expand plan Catalyst generates). The HLL sketch twin
    * (approx_count_distinct — one shuffle, mergeable state, the 100 TB
    * choice) is compared against this within tolerance in BiSpec; the
    * oracle checks the exact side only since sketch estimates are
    * engine-specific. */
  def distinctCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  val distinctCountsSql: String =
    """SELECT l_returnflag,
      |       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q42 — hierarchical ROLLUP over (ship_year, return_flag): subtotals
    * per year and a grand total in ONE pass — Catalyst plans rollup as
    * a single Expand + hash aggregate (each input row fans to its 3
    * grouping sets map-side), not three scans. Rollup-null grouping
    * cells are coalesced to sentinels (-1 / 'ALL') so both engines
    * order and hash them identically. */
  def revenueRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.rollup(year(col("l_shipdate")).cast("int").as("ship_year"),
        col("l_returnflag").as("return_flag"))
      .agg(count(lit(1)).as("n_items"),
        sum(Tables.money(col("l_extendedprice"))).as("rev_dec"))
      .select(coalesce(col("ship_year"), lit(-1)).as("ship_year"),
        coalesce(col("return_flag"), lit("ALL")).as("return_flag"),
        col("n_items"), col("rev_dec").cast("double").as("revenue"))
      .orderBy("ship_year", "return_flag")
  }

  val revenueRollupSql: String =
    """WITH r AS (
      |  SELECT CAST(year(l_shipdate) AS INT) AS y, l_returnflag AS f,
      |         CAST(COUNT(*) AS BIGINT) AS n_items,
      |         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
      |  FROM lineitem GROUP BY ROLLUP(y, f)
      |)
      |SELECT COALESCE(y, -1) AS ship_year, COALESCE(f, 'ALL') AS return_flag,
      |       n_items, CAST(rev AS DOUBLE) AS revenue
      |FROM r ORDER BY ship_year, return_flag""".stripMargin

  /** q64 — customer retention via set operations (SURVEY.md §2.8 notes
    * INTERSECT/EXCEPT are absent from the reference). Splits the customer
    * base of the fixture's last two order-years into retained (both
    * years: INTERSECT), churned (prior year only: EXCEPT), and new
    * (latest year only: EXCEPT the other way). Spark's
    * `intersect`/`except` carry set (DISTINCT) semantics and plan as
    * Left{Semi,Anti} hash joins over pre-distincted inputs — no
    * cartesian, no sort. The year anchor is a one-row driver lookup
    * (same pinning as q03) so the oracle never sees wall-clock. */
  def retentionSets(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
    val maxY = orders.agg(max(year(col("o_orderdate")))).head().getInt(0)
    def custsIn(y: Int) = orders.filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey").as("customer_id")).distinct()
    val cur = custsIn(maxY)
    val prev = custsIn(maxY - 1)
    cur.intersect(prev).select(lit("retained").as("status"), col("customer_id"))
      .union(prev.except(cur).select(lit("churned").as("status"), col("customer_id")))
      .union(cur.except(prev).select(lit("new").as("status"), col("customer_id")))
      .orderBy("status", "customer_id")
  }

  val retentionSetsSql: String =
    """WITH yr AS (SELECT CAST(MAX(year(o_orderdate)) AS INT) AS y FROM orders),
      |cur AS (SELECT DISTINCT o_custkey AS customer_id FROM orders, yr
      |        WHERE year(o_orderdate) = y),
      |prev AS (SELECT DISTINCT o_custkey AS customer_id FROM orders, yr
      |         WHERE year(o_orderdate) = y - 1)
      |SELECT 'retained' AS status, customer_id
      |FROM (SELECT customer_id FROM cur INTERSECT SELECT customer_id FROM prev)
      |UNION ALL
      |SELECT 'churned' AS status, customer_id
      |FROM (SELECT customer_id FROM prev EXCEPT SELECT customer_id FROM cur)
      |UNION ALL
      |SELECT 'new' AS status, customer_id
      |FROM (SELECT customer_id FROM cur EXCEPT SELECT customer_id FROM prev)
      |ORDER BY status, customer_id""".stripMargin

  /** q65 — per-nation customer spend quartiles: NTILE(4) + PERCENT_RANK
    * over a PARTITION BY window (SURVEY.md §2.6: the reference has no
    * partitioned windows, no NTILE). The window sits above the per-
    * customer aggregation and is partitioned by nation, so state per
    * window task is one nation's customer list — scale-safe, unlike a
    * global ORDER BY window. The window order carries an id tiebreaker
    * to make tile assignment total; spend sums are exact DECIMAL so both
    * engines agree on the order. */
  def spendQuartiles(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
    val cust = Tables.load(spark, sfDir, "customer")
    val spend = orders
      .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
      .groupBy(cust("c_nationkey").cast("int").as("nation_id"),
        orders("o_custkey").as("customer_id"))
      .agg(sum(Tables.money(col("o_totalprice"))).as("sp_dec"))
    val w = Window.partitionBy("nation_id")
      .orderBy(col("sp_dec").desc, col("customer_id"))
    spend.select(col("nation_id"), col("customer_id"),
        col("sp_dec").cast("double").as("spend"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"))
      .orderBy("nation_id", "customer_id")
  }

  val spendQuartilesSql: String =
    """WITH spend AS (
      |  SELECT CAST(c_nationkey AS INT) AS nation_id, o_custkey AS customer_id,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2)
      |SELECT nation_id, customer_id, CAST(sp AS DOUBLE) AS spend,
      |       CAST(ntile(4) OVER w AS INT) AS quartile,
      |       ROUND(percent_rank() OVER w, 6) AS pct_rank
      |FROM spend
      |WINDOW w AS (PARTITION BY nation_id ORDER BY sp DESC, customer_id)
      |ORDER BY nation_id, customer_id""".stripMargin

  /** q68 — AVG/MIN/MAX/STDDEV per order priority (SURVEY.md §2.5: the
    * reference aggregates with SUM only). Dispersion is computed from
    * exact DECIMAL moments (n, Σx, Σx²) so the shuffle carries three
    * order-independent numbers per group; stddev derives in double at
    * the output edge with the identical formula on both engines —
    * native `stddev()` would accumulate in double and make the result
    * depend on row order. */
  def priorityStats(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.money(col("o_totalprice"))
    val st = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(p).as("s1"), sum(p * p).as("s2"),
        min(p).as("mn"), max(p).as("mx"))
    val s1d = col("s1").cast("double")
    val s2d = col("s2").cast("double")
    // clamp the radicand at 0 (double cancellation on near-constant
    // groups can drive it epsilon-negative, where the two engines
    // diverge: NaN here, an error in DuckDB) and pin the undefined
    // n=1 sample stddev to NULL on both sides (IEEE 0/0 otherwise)
    val variance = greatest(lit(0.0),
      (s2d - s1d * s1d / col("n_orders")) / (col("n_orders") - 1))
    st.select(col("priority"), col("n_orders"),
        round(s1d / col("n_orders"), 6).as("avg_price"),
        col("mn").cast("double").as("min_price"),
        col("mx").cast("double").as("max_price"),
        when(col("n_orders") > 1, round(sqrt(variance), 6))
          .as("stddev_price"))
      .orderBy("priority")
  }

  val priorityStatsSql: String =
    """WITH st AS (
      |  SELECT o_orderpriority AS priority, COUNT(*) AS n,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s1,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2))
      |             * CAST(o_totalprice AS DECIMAL(18,2))) AS s2,
      |         MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS mn,
      |         MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS mx
      |  FROM orders GROUP BY 1)
      |SELECT priority, CAST(n AS BIGINT) AS n_orders,
      |       ROUND(CAST(s1 AS DOUBLE) / n, 6) AS avg_price,
      |       CAST(mn AS DOUBLE) AS min_price,
      |       CAST(mx AS DOUBLE) AS max_price,
      |       CASE WHEN n > 1 THEN
      |         ROUND(sqrt(greatest(0.0,
      |           (CAST(s2 AS DOUBLE)
      |            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
      |           / (n - 1))), 6)
      |       END AS stddev_price
      |FROM st ORDER BY priority""".stripMargin

  val monthlyTrendSql: String =
    """SELECT CAST(DATE_TRUNC('month', l_shipdate) AS DATE) AS sales_month,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales
      |FROM lineitem
      |WHERE l_shipdate >= DATE_TRUNC('month',
      |        (SELECT MAX(l_shipdate) FROM lineitem) - INTERVAL 12 MONTH)
      |GROUP BY 1
      |ORDER BY sales_month""".stripMargin

  /** q83 — the TPC-H Q5 shape: local-supplier revenue by region and
    * nation over an order-date year. Six tables in one query — the
    * multi-way star join the 2-way BI queries don't exercise: lineitem
    * ⋈ orders is the one big-big join (shuffle on the order key, the
    * unavoidable floor), while customer / supplier / nation / region
    * all broadcast; Catalyst orders the tree and AQE re-plans at
    * runtime. The `c_nationkey = s_nationkey` condition ("revenue that
    * stayed local") is the classic cross-dimension predicate that
    * defeats naive snowflake denormalization. Money math is exact
    * decimal end to end: both discount factors cast per-row before the
    * product, so the shuffle-order-independent sum is oracle-exact. */
  def regionalRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val cust = Tables.load(spark, sfDir, "customer")
    val supp = Tables.load(spark, sfDir, "supplier")
    val nat = Tables.load(spark, sfDir, "nation")
    val reg = Tables.load(spark, sfDir, "region")
    val rev = Tables.money(col("l_extendedprice")) *
      (lit(1.0) - col("l_discount")).cast("decimal(4,2)")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey") &&
        cust("c_nationkey") === supp("s_nationkey"))
      .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_lineitems"),
        sum(rev).cast("double").as("revenue"))
      .orderBy("region", "nation")
  }

  val regionalRevenueSql: String =
    """SELECT r.r_name AS region, n.n_name AS nation,
      |       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
      |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
      |             * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE)
      |         AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |             AND c.c_nationkey = s.s_nationkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1, 2
      |ORDER BY region, nation""".stripMargin

  /** q84 — correlated scalar subqueries, run as SQL TEXT on purpose:
    * "orders at least 1.5× their customer's average" exercises
    * Catalyst's RewriteCorrelatedScalarSubquery decorrelation (the
    * subqueries become an aggregate + join — no per-row re-execution,
    * which is the only shape that survives 100 TB). The threshold
    * compare is algebraic — price·count ≥ 1.5·total — so it stays in
    * EXACT decimal/integer arithmetic: no division, no FP cliff at
    * the boundary, and the identical text runs on DuckDB. */
  val aboveAvgOrdersSql: String =
    """SELECT o.o_orderkey, o.o_custkey,
      |       CAST(o.o_totalprice AS DOUBLE) AS total_price
      |FROM orders o
      |WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) *
      |      (SELECT COUNT(*) FROM orders o2
      |       WHERE o2.o_custkey = o.o_custkey)
      |      >= 1.5 * (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(18,2)))
      |                FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
      |ORDER BY o.o_orderkey""".stripMargin

  def aboveAvgOrders(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(aboveAvgOrdersSql)
  }

  /** Bloom pre-filter sizing: fixed params keep the filter's bit layout
    * a pure function of the inserted key set. */
  val BloomExpectedKeys = 100000L
  val BloomFpp = 0.01

  /** q94 — bloom-filter semi-join reduction: revenue per nation for
    * BUILDING-segment customers, with the fact side pre-filtered by a
    * Bloom filter built on the qualifying customer keys BEFORE the join.
    *
    * This is the runtime-filter pattern (Spark's InjectRuntimeFilter /
    * the classic semi-join reduction) made explicit: at 100 TB the
    * filtered dim is too big to broadcast as a hash relation with its
    * payload, but its Bloom filter is ~1.2 bytes/key and broadcasts
    * fine — the fact scan then drops ~4/5 of its rows map-side, before
    * paying the shuffle. False positives are harmless (the real join
    * removes them), false negatives can't happen, so the result is
    * byte-identical to the plain join the oracle runs. The probe is
    * Spark's own runtime-filter expression (`might_contain`) shipped
    * as a plan literal — codegen'd, not a UDF. */
  def bloomPrefilterRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_nationkey"))
    val bf = graft.functions.Bloom.serialize(
      cust.stat.bloomFilter("c_custkey", BloomExpectedKeys, BloomFpp))

    val nation = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val orders = Tables.load(spark, sfDir, "orders")
      .filter(graft.functions.Bloom.mightContainLong(bf, col("o_custkey")))
    orders
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Tables.money(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy("n_name")
  }

  /** q96 — explicit GROUPING SETS: ((year, priority), (year),
    * (priority)) — the general form q42's ROLLUP and q66's CUBE are
    * special cases of, and one NEITHER can express (a rollup never
    * keeps (priority) without (year, priority)'s parent chain ending
    * in (); a cube would add () and nothing here wants the grand
    * total). Catalyst plans it as ONE Expand (3 replicas per row,
    * only the requested sets) + a single hash aggregate — same
    * one-pass shape as rollup, no third scan. Aggregated-away cells
    * coalesce to sentinels (-1 / 'ALL'); both grouping columns are
    * non-null in the fixture, so no GROUPING() disambiguation is
    * needed (q66 shows that form). Runs as the IDENTICAL SQL text on
    * both engines. */
  def prioritySets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(prioritySetsSql)
  }

  val prioritySetsSql: String =
    """WITH g AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS y, o_orderpriority AS p,
      |         CAST(COUNT(*) AS BIGINT) AS n_orders,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders
      |  GROUP BY GROUPING SETS ((y, p), (y), (p))
      |)
      |SELECT COALESCE(y, -1) AS order_year, COALESCE(p, 'ALL') AS priority,
      |       n_orders, CAST(rev AS DOUBLE) AS revenue
      |FROM g ORDER BY order_year, priority""".stripMargin

  /** q103 — LATERAL correlated subquery: for every nation, its top-2
    * customers by account balance, written as `FROM nation, LATERAL
    * (SELECT … WHERE correlated ORDER BY … LIMIT 2)`. Catalyst
    * decorrelates the lateral into WindowGroupLimit + one hash join
    * (PlanSpec pins it) — no per-nation re-execution — and the
    * IDENTICAL text runs on DuckDB, which plans its own lateral join:
    * two engines, two algorithms, one result. The per-group-limit
    * semantics q101 builds with window functions, expressed in the
    * SQL-standard form. */
  def lateralTopCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(lateralTopCustomersSql)
  }

  val lateralTopCustomersSql: String =
    """SELECT n.n_name, t.c_name, CAST(t.c_acctbal AS DOUBLE) AS acctbal
      |FROM nation n,
      |LATERAL (SELECT c_name, c_acctbal FROM customer c
      |         WHERE c.c_nationkey = n.n_nationkey
      |         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      |ORDER BY n.n_name, acctbal DESC, c_name""".stripMargin

  val bloomPrefilterRevenueSql: String =
    """SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |         AS revenue
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin

  /** q144 cutoff: orders placed before, line items shipped after. */
  val ShipCutoff = "1998-06-01"

  /** q144 — shipping-priority top-k (the TPC-H Q3 shape): revenue of
    * still-shipping BUILDING-segment orders placed before the cutoff,
    * top 10 — the canonical fact×fact join (lineitem×orders, the two
    * biggest fixtures) with a selective dimension semi-filter.
    *
    * Scale shape: the customer filter broadcasts into the orders
    * scan; both date filters push to parquet (scan-level pruning on
    * the BIGGEST tables — `PushedFilters` in the plan); the
    * lineitem×orders join shuffles on orderkey, the one unavoidable
    * shuffle; the per-order aggregate is exact DECIMAL(18,2), so the
    * descending-revenue top-10 is a deterministic
    * TakeOrderedAndProject over EXACT values (decimal ties break on
    * l_orderkey), never a float knife edge. */
  def shippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cut = lit(ShipCutoff).cast("timestamp")
    val cust = Tables.load(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") < cut)
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") > cut)
    val rev = Tables.money(col("l_extendedprice")) *
      (lit(1.0) - col("l_discount")).cast("decimal(4,2)")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(rev).as("rev_dec"))
      .orderBy(col("rev_dec").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        col("rev_dec").cast("double").as("revenue"))
  }

  val shippingPrioritySql: String =
    s"""WITH agg AS (
       |  SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
       |         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
       |             * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS rev_dec
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  WHERE c.c_mktsegment = 'BUILDING'
       |    AND o.o_orderdate < TIMESTAMP '$ShipCutoff'
       |    AND l.l_shipdate > TIMESTAMP '$ShipCutoff'
       |  GROUP BY 1, 2, 3
       |)
       |SELECT l_orderkey,
       |       make_timestamp(epoch_us(o_orderdate)) AS o_orderdate,
       |       o_orderpriority, CAST(rev_dec AS DOUBLE) AS revenue
       |FROM agg
       |ORDER BY rev_dec DESC, l_orderkey LIMIT 10""".stripMargin

  /** q154 — fulfillment SLA by priority: per order-priority class, how
    * many orders are fully shipped by the q144 cutoff, the fill rate,
    * and the median days from order to FINAL shipment — the
    * operations twin of q144's revenue view, and a second fact×fact
    * composition over the two biggest fixtures.
    *
    * Scale shape: lineitem collapses to per-order (max shipdate, all
    * shipped?) FIRST — a map-side-combinable orderkey agg that
    * shrinks the fact×fact join's left side to one row per order
    * before it meets orders; the priority rollup is then |classes|
    * rows. The median rides the q92-pinned exact percentile over
    * integer day diffs. */
  def fillRate(spark: SparkSession, sfDir: String): DataFrame = {
    val cut = lit(ShipCutoff).cast("timestamp")
    val li = Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey").as("okey"))
      .agg(max(col("l_shipdate")).as("last_ship"),
        max(when(col("l_shipdate") > cut, 1L).otherwise(0L)).as("open"))
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") < cut)
    ord.join(li, ord("o_orderkey") === li("okey"))
      .select(col("o_orderpriority").as("priority"),
        (lit(1L) - col("open")).as("filled"),
        datediff(col("last_ship"), col("o_orderdate")).cast("long").as("days"))
      .groupBy("priority")
      .agg(count(lit(1)).as("n_orders"),
        sum("filled").as("n_filled"),
        round(sum("filled").cast("double") / count(lit(1)).cast("double"), 6)
          .as("fill_rate"),
        round(percentile(col("days"), lit(0.5)), 2).as("median_ship_days"))
      .orderBy("priority")
  }

  val fillRateSql: String =
    s"""WITH li AS (
       |  SELECT l_orderkey AS okey, MAX(l_shipdate) AS last_ship,
       |         MAX(CASE WHEN l_shipdate > TIMESTAMP '$ShipCutoff'
       |                  THEN 1 ELSE 0 END) AS open
       |  FROM lineitem GROUP BY 1
       |)
       |SELECT o.o_orderpriority AS priority,
       |       CAST(COUNT(*) AS BIGINT) AS n_orders,
       |       CAST(SUM(1 - li.open) AS BIGINT) AS n_filled,
       |       round(SUM(1 - li.open)::DOUBLE / COUNT(*)::DOUBLE, 6)
       |         AS fill_rate,
       |       round(quantile_cont(date_diff('day', o.o_orderdate::DATE,
       |         li.last_ship::DATE), 0.5), 2) AS median_ship_days
       |FROM orders o JOIN li ON o.o_orderkey = li.okey
       |WHERE o.o_orderdate < TIMESTAMP '$ShipCutoff'
       |GROUP BY 1 ORDER BY priority""".stripMargin

  /** q159 — market share (the TPC-H Q8 shape): each supplier nation's
    * share of its region's lineitem revenue per order year — the
    * share-of-denominator pattern where the ratio's numerator is one
    * group and the denominator a SUPER-group, computed with a
    * partitioned window over the already-aggregated (region, year,
    * nation) table instead of a second scan-and-join pass.
    *
    * Scale shape: one lineitem×orders shuffle join (the q144 spine);
    * supplier/nation/region broadcast; revenue aggregates in exact
    * DECIMAL before any division, and the share window runs over
    * |regions|·|years|·|nations| rows — model-sized, never
    * fact-sized. */
  def marketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
    val supp = Tables.load(spark, sfDir, "supplier")
    val nat = Tables.load(spark, sfDir, "nation")
    val reg = Tables.load(spark, sfDir, "region")
    val rev = Tables.money(col("l_extendedprice")) *
      (lit(1.0) - col("l_discount")).cast("decimal(4,2)")
    val agg = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name").as("region"),
        year(col("o_orderdate")).as("o_year"),
        col("n_name").as("nation"))
      .agg(sum(rev).as("rev_dec"))
    val w = Window.partitionBy("region", "o_year")
    agg.withColumn("mkt_dec", sum("rev_dec").over(w))
      .select(col("region"), col("o_year"), col("nation"),
        col("rev_dec").cast("double").as("revenue"),
        round(col("rev_dec").cast("double") /
          col("mkt_dec").cast("double"), 6).as("mkt_share"))
      .orderBy("region", "o_year", "nation")
  }

  val marketShareSql: String =
    """WITH agg AS (
      |  SELECT r.r_name AS region, year(o.o_orderdate) AS o_year,
      |         n.n_name AS nation,
      |         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
      |             * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS rev_dec
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  GROUP BY 1, 2, 3
      |)
      |SELECT region, CAST(o_year AS INT) AS o_year, nation,
      |       CAST(rev_dec AS DOUBLE) AS revenue,
      |       round(rev_dec::DOUBLE /
      |         (SUM(rev_dec) OVER (PARTITION BY region, o_year))::DOUBLE, 6)
      |         AS mkt_share
      |FROM agg
      |ORDER BY region, o_year, nation""".stripMargin

  /** q161 — backlog aging: open orders (any line still unshipped at
    * the cutoff) bucketed by how long they have been waiting — the
    * 30/60/90-day aging report an operations dashboard tracks, per
    * priority. Reuses q154's per-order collapse; the bucket edge is
    * integer day arithmetic, so rows land identically on both
    * engines. One fact×fact join against one-row-per-order, then a
    * |priorities|×|buckets| rollup. */
  def backlogAging(spark: SparkSession, sfDir: String): DataFrame = {
    val cut = lit(ShipCutoff).cast("timestamp")
    val li = Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey").as("okey"))
      .agg(max(when(col("l_shipdate") > cut, 1L).otherwise(0L)).as("open"))
      .filter(col("open") === 1L)
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") < cut)
    val age = datediff(cut, col("o_orderdate")).cast("long")
    val bucket = when(age <= 30, "0-30")
      .when(age <= 60, "31-60")
      .when(age <= 90, "61-90").otherwise("90+")
    ord.join(li, ord("o_orderkey") === li("okey"))
      .select(col("o_orderpriority").as("priority"), bucket.as("age_bucket"),
        Tables.money(col("o_totalprice")).as("v"))
      .groupBy("priority", "age_bucket")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("v")).cast("double").as("open_value"))
      .orderBy("priority", "age_bucket")
  }

  val backlogAgingSql: String =
    s"""WITH li AS (
       |  SELECT l_orderkey AS okey
       |  FROM lineitem GROUP BY 1
       |  HAVING MAX(CASE WHEN l_shipdate > TIMESTAMP '$ShipCutoff'
       |                  THEN 1 ELSE 0 END) = 1
       |), aged AS (
       |  SELECT o.o_orderpriority AS priority,
       |         CASE WHEN date_diff('day', o.o_orderdate::DATE,
       |                     DATE '$ShipCutoff') <= 30 THEN '0-30'
       |              WHEN date_diff('day', o.o_orderdate::DATE,
       |                     DATE '$ShipCutoff') <= 60 THEN '31-60'
       |              WHEN date_diff('day', o.o_orderdate::DATE,
       |                     DATE '$ShipCutoff') <= 90 THEN '61-90'
       |              ELSE '90+' END AS age_bucket,
       |         CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
       |  FROM orders o JOIN li ON o.o_orderkey = li.okey
       |  WHERE o.o_orderdate < TIMESTAMP '$ShipCutoff'
       |)
       |SELECT priority, age_bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
       |       CAST(SUM(v) AS DOUBLE) AS open_value
       |FROM aged GROUP BY 1, 2 ORDER BY priority, age_bucket""".stripMargin

  /** q162 — supplier concentration (HHI) per part type: the
    * Herfindahl–Hirschman index Σ shareᵢ² of suppliers' revenue
    * within each part type — the procurement-risk statistic (HHI →
    * 1 means one supplier owns the category). Third distinct fact
    * spine: lineitem joins PART (brand/type dims) and supplier.
    *
    * Scale shape: one (type, supplier) revenue agg off the
    * lineitem×part broadcast join, then shares square-and-sum inside
    * a (type)-keyed agg — the HHI folds from exact decimal sums with
    * the two divisions at the very end. */
  def supplierHhi(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
    val rev = Tables.money(col("l_extendedprice")) *
      (lit(1.0) - col("l_discount")).cast("decimal(4,2)")
    val ts = li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy(col("p_type").as("p_type"), col("l_suppkey").as("supp"))
      .agg(sum(rev).as("r"))
    // squares stay exact DECIMAL(37,4) so the cross-supplier sum is
    // order-independent; the two divisions happen once, on doubles
    val rd = col("r").cast("decimal(18,2)")
    ts.groupBy("p_type")
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("r")).as("tot"),
        sum(rd * rd).as("sq"))
      .select(col("p_type"), col("n_suppliers"),
        col("tot").cast("double").as("type_revenue"),
        round(col("sq").cast("double") / (col("tot").cast("double") *
          col("tot").cast("double")), 6).as("hhi"))
      .orderBy("p_type")
  }

  val supplierHhiSql: String =
    """WITH ts AS (
      |  SELECT p.p_type, l.l_suppkey AS supp,
      |         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
      |             * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS r
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1, 2
      |)
      |SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
      |       CAST(SUM(r) AS DOUBLE) AS type_revenue,
      |       round(SUM(r::DECIMAL(18,2) * r::DECIMAL(18,2))::DOUBLE /
      |             (SUM(r)::DOUBLE * SUM(r)::DOUBLE), 6) AS hhi
      |FROM ts GROUP BY 1 ORDER BY p_type""".stripMargin

  /** q163 — return rates by brand: the share of lineitems (and of
    * revenue) flagged returned per part brand — the product-quality
    * readout merchandising watches. One broadcast dim join, one
    * brand-keyed agg; rates are ratios of exact integers/decimals
    * with the division at the edge. */
  def returnRates(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
    val rev = Tables.money(col("l_extendedprice")) *
      (lit(1.0) - col("l_discount")).cast("decimal(4,2)")
    val isRet = col("l_returnflag") === "R"
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(isRet, 1L).otherwise(0L)).as("n_returned"),
        sum(rev).as("rev_dec"),
        sum(when(isRet, rev).otherwise(lit(0).cast("decimal(23,4)")))
          .as("ret_dec"))
      .select(col("brand"), col("n_lines"), col("n_returned"),
        round(col("n_returned").cast("double") /
          col("n_lines").cast("double"), 6).as("return_rate"),
        round(col("ret_dec").cast("double") /
          col("rev_dec").cast("double"), 6).as("revenue_return_share"))
      .orderBy("brand")
  }

  val returnRatesSql: String =
    """WITH j AS (
      |  SELECT p.p_brand AS brand, l.l_returnflag,
      |         CAST(l.l_extendedprice AS DECIMAL(18,2))
      |           * CAST(1.0 - l.l_discount AS DECIMAL(4,2)) AS rev
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |)
      |SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
      |       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_returned,
      |       round(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |             ::DOUBLE / COUNT(*)::DOUBLE, 6) AS return_rate,
      |       round(SUM(CASE WHEN l_returnflag = 'R' THEN rev
      |                      ELSE 0 END)::DOUBLE / SUM(rev)::DOUBLE, 6)
      |         AS revenue_return_share
      |FROM j GROUP BY 1 ORDER BY brand""".stripMargin

  /** q164 — the TPC-H Q6 revenue-forecast aggregate: what additional
    * revenue would appear if discounts in a band were eliminated —
    * SUM(extendedprice · discount) over one year, a discount band,
    * and a quantity cap. The iconic scan-only query: every predicate
    * pushes to parquet, no join, no shuffle beyond one partial-agg
    * combine — at 100 TB this is a pure I/O-bound columnar scan, the
    * query that measures scan efficiency itself. Discounts compare as
    * integer basis points (the IEEE-safe form of BETWEEN 0.05 AND
    * 0.07 over binary doubles). */
  def revenueForecast(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val bp = round(col("l_discount") * 100, 0).cast("int")
    li.filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp") &&
        bp >= 5 && bp <= 7 && col("l_quantity") < 24)
      .agg(count(lit(1)).as("n_lines"),
        sum(Tables.money(col("l_extendedprice")) *
          Tables.money(col("l_discount"))).cast("double").as("forecast"))
      .orderBy("n_lines")
  }

  val revenueForecastSql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |             * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
      |         AS forecast
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      |  AND l_shipdate < TIMESTAMP '1999-01-01'
      |  AND round(l_discount * 100)::INT BETWEEN 5 AND 7
      |  AND l_quantity < 24
      |ORDER BY n_lines""".stripMargin

  /** q166 — top supplier per nation, TIES KEPT: RANK (not row_number)
    * over exact decimal revenue within each supplier nation, keeping
    * every rank-1 supplier — the tie-correct form of "who leads each
    * market" (row_number would silently drop co-leaders; exact
    * decimal ordering means ties are REAL ties, not float accidents).
    * The rank filter sits directly over the aggregate, so Catalyst
    * plans WindowGroupLimit — partial top-1-with-ties per map task
    * before the |nations|-partitioned window. */
  def topSupplierPerNation(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val supp = Tables.load(spark, sfDir, "supplier")
    val nat = Tables.load(spark, sfDir, "nation")
    val rev = Tables.money(col("l_extendedprice")) *
      (lit(1.0) - col("l_discount")).cast("decimal(4,2)")
    val agg = li.join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("s_name").as("supplier"))
      .agg(sum(rev).as("rev_dec"))
    val w = Window.partitionBy("nation").orderBy(col("rev_dec").desc)
    agg.withColumn("rk", rank().over(w))
      .filter(col("rk") === 1)
      .select(col("nation"), col("supplier"),
        col("rev_dec").cast("double").as("revenue"))
      .orderBy("nation", "supplier")
  }

  val topSupplierPerNationSql: String =
    """WITH agg AS (
      |  SELECT n.n_name AS nation, s.s_name AS supplier,
      |         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
      |             * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS rev_dec
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  GROUP BY 1, 2
      |), ranked AS (
      |  SELECT nation, supplier, rev_dec,
      |         rank() OVER (PARTITION BY nation ORDER BY rev_dec DESC)
      |           AS rk
      |  FROM agg
      |)
      |SELECT nation, supplier, CAST(rev_dec AS DOUBLE) AS revenue
      |FROM ranked WHERE rk = 1
      |ORDER BY nation, supplier""".stripMargin

  /** q167 — month-over-month revenue growth: monthly order revenue
    * with LAG deltas and growth rate. The window is GLOBAL but over
    * one row per CALENDAR MONTH (the q58 argument — input grows with
    * elapsed time, never data volume), which is the admissible form
    * of a global window; revenue aggregates in exact decimal before
    * the one growth division. */
  def momGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.load(spark, sfDir, "orders")
    val monthly = ord.groupBy(
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Tables.money(col("o_totalprice"))).as("rev_dec"))
    val w = Window.orderBy("month")
    monthly.withColumn("prev_dec", lag(col("rev_dec"), 1).over(w))
      .select(col("month"), col("n_orders"),
        col("rev_dec").cast("double").as("revenue"),
        round((col("rev_dec") - col("prev_dec")).cast("double") /
          col("prev_dec").cast("double"), 6).as("mom_growth"))
      .orderBy("month")
  }

  val momGrowthSql: String =
    """WITH m AS (
      |  SELECT date_trunc('month', o_orderdate) AS month,
      |         CAST(COUNT(*) AS BIGINT) AS n_orders,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      |  FROM orders GROUP BY 1
      |)
      |SELECT make_timestamp(epoch_us(month)) AS month, n_orders,
      |       CAST(rev_dec AS DOUBLE) AS revenue,
      |       round((rev_dec - lag(rev_dec) OVER (ORDER BY month))::DOUBLE
      |             / (lag(rev_dec) OVER (ORDER BY month))::DOUBLE, 6)
      |         AS mom_growth
      |FROM m ORDER BY month""".stripMargin

  /** q174 — explicit GROUPING SETS: the asymmetric aggregation set
    * {(status, priority), (status), ()} — deliberately NOT the
    * rollup/cube lattice (q42/q66 cover those): per-priority totals
    * within status, status totals, and the grand total, WITHOUT the
    * (priority)-only cut a cube would force. One scan, one Expand (3
    * projections per row), one hash aggregate — the same single-pass
    * plan shape PlanSpec pins for rollup, on an arbitrary set list. */
  def orderGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |       COALESCE(o_orderpriority, 'ALL') AS priority,
        |       CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), ())
        |ORDER BY status, priority""".stripMargin)
  }

  /** q177 — new-vs-returning revenue mix by month: each month's order
    * revenue split by whether the customer had ordered before — THE
    * growth-accounting read (is revenue expansion acquisition or
    * retention?). A customer's first order date is ONE keyed min-agg
    * broadcast back; the repeat flag is a timestamp compare; the
    * monthly rollup keeps revenue in exact decimal until the one
    * share division. No window, no self-join over orders. */
  def repeatRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.load(spark, sfDir, "orders")
    val firsts = ord.groupBy(col("o_custkey").as("ck"))
      .agg(min("o_orderdate").as("first_d"))
    val j = ord.join(broadcast(firsts), ord("o_custkey") === col("ck"))
      .select(date_trunc("month", col("o_orderdate")).as("month"),
        (col("o_orderdate") > col("first_d")).as("repeat"),
        Tables.money(col("o_totalprice")).as("v"))
    j.groupBy("month")
      .agg(count(lit(1)).as("n_orders"),
        sum("v").as("tot_dec"),
        sum(when(col("repeat"), col("v"))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("rep_dec"))
      .select(col("month"), col("n_orders"),
        col("tot_dec").cast("double").as("revenue"),
        round(col("rep_dec").cast("double") /
          col("tot_dec").cast("double"), 6).as("returning_share"))
      .orderBy("month")
  }

  val repeatRevenueSql: String =
    """WITH firsts AS (
      |  SELECT o_custkey AS ck, MIN(o_orderdate) AS first_d
      |  FROM orders GROUP BY 1
      |), j AS (
      |  SELECT date_trunc('month', o.o_orderdate) AS month,
      |         o.o_orderdate > f.first_d AS repeat,
      |         CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
      |  FROM orders o JOIN firsts f ON o.o_custkey = f.ck
      |)
      |SELECT make_timestamp(epoch_us(month)) AS month,
      |       CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(SUM(v) AS DOUBLE) AS revenue,
      |       round(SUM(CASE WHEN repeat THEN v ELSE 0 END)::DOUBLE
      |             / SUM(v)::DOUBLE, 6) AS returning_share
      |FROM j GROUP BY month ORDER BY month""".stripMargin

  val orderGroupingSetsSql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |       COALESCE(o_orderpriority, 'ALL') AS priority,
      |       CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |         AS revenue
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderstatus), ())
      |ORDER BY status, priority""".stripMargin

  /** q184 — monthly promo revenue share (the TPC-H Q14 shape, rolled
    * across the calendar): per ship month, the fraction of discounted
    * revenue from PROMO-type parts — the conditional-aggregation-
    * inside-a-join pattern (one pass computes both the conditional
    * numerator and the total, no second scan or self-join).
    *
    * Scale shape: fact × part equi-join with the dim broadcast (the
    * q01 pin), then one (month)-keyed aggregate with map-side combine;
    * decimal money math until the output edge (the q144 discipline). */
  def promoShare(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_type"))
    val rev = Tables.money(col("l_extendedprice")) *
      (lit(1.0) - col("l_discount")).cast("decimal(4,2)")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .select(date_trunc("month", col("l_shipdate")).as("month"),
        col("p_type"), rev.as("rev"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("p_type") === "PROMO", col("rev"))).as("promo_dec"),
        sum(col("rev")).as("tot_dec"))
      .select(col("month"), col("n_items"),
        coalesce(col("promo_dec"), lit(0)).cast("double").as("promo_revenue"),
        col("tot_dec").cast("double").as("total_revenue"),
        round(lit(100.0) * coalesce(col("promo_dec"), lit(0)).cast("double") /
          col("tot_dec").cast("double"), 6).as("promo_share"))
      .orderBy("month")
  }

  val promoShareSql: String =
    """WITH agg AS (
      |  SELECT date_trunc('month', l_shipdate) AS m,
      |         COUNT(*) AS n_items,
      |         SUM(CASE WHEN p_type = 'PROMO'
      |             THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |                  * CAST(1.0 - l_discount AS DECIMAL(4,2)) END) AS promo_dec,
      |         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |             * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS tot_dec
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1
      |)
      |SELECT make_timestamp(epoch_us(m)) AS month,
      |       CAST(n_items AS BIGINT) AS n_items,
      |       CAST(COALESCE(promo_dec, 0) AS DOUBLE) AS promo_revenue,
      |       CAST(tot_dec AS DOUBLE) AS total_revenue,
      |       round(100.0 * CAST(COALESCE(promo_dec, 0) AS DOUBLE)
      |             / CAST(tot_dec AS DOUBLE), 6) AS promo_share
      |FROM agg ORDER BY month""".stripMargin

  /** q221 — inter-purchase gap mix by market segment: consecutive
    * orders per customer (orderdate, orderkey-tiebroken LAG), the gap
    * binned into lifecycle bands (≤7d, ≤30d, ≤90d, >90d), counted per
    * segment with each band's share of the segment. Exact integer day
    * arithmetic end to end; the share divides once per output row.
    * Scale shape: one per-customer partitioned window over orders,
    * a |segments×4|-group aggregate, and a |segments|-partitioned
    * share window over that bounded frame.
    */
  def interPurchaseMix(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
    val gaps = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("gap_days",
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)))
      .filter(col("gap_days").isNotNull)
    val band = when(col("gap_days") <= 7, "a_week")
      .when(col("gap_days") <= 30, "b_month")
      .when(col("gap_days") <= 90, "c_quarter")
      .otherwise("d_longer")
    val cust = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val agg = gaps.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), band.as("gap_band"))
      .agg(count(lit(1)).as("n_gaps"))
    val ws = Window.partitionBy("segment")
    agg
      .withColumn("segment_share", round(col("n_gaps").cast("double") /
        sum(col("n_gaps")).over(ws).cast("double"), 6))
      .orderBy("segment", "gap_band")
  }

  val interPurchaseMixSql: String =
    """WITH gaps AS (
      |  SELECT o_custkey,
      |         date_diff('day', LAG(o_orderdate) OVER (
      |             PARTITION BY o_custkey
      |             ORDER BY o_orderdate, o_orderkey), o_orderdate)
      |           AS gap_days
      |  FROM orders
      |), banded AS (
      |  SELECT c.c_mktsegment AS segment,
      |         CASE WHEN gap_days <= 7 THEN 'a_week'
      |              WHEN gap_days <= 30 THEN 'b_month'
      |              WHEN gap_days <= 90 THEN 'c_quarter'
      |              ELSE 'd_longer' END AS gap_band
      |  FROM gaps g JOIN customer c ON g.o_custkey = c.c_custkey
      |  WHERE g.gap_days IS NOT NULL
      |), agg AS (
      |  SELECT segment, gap_band, COUNT(*) AS n_gaps
      |  FROM banded GROUP BY 1, 2
      |)
      |SELECT segment, gap_band, n_gaps,
      |       round(CAST(n_gaps AS DOUBLE) /
      |             CAST(SUM(n_gaps) OVER (PARTITION BY segment)
      |                  AS DOUBLE), 6) AS segment_share
      |FROM agg ORDER BY segment, gap_band""".stripMargin
}
