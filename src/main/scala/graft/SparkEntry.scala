package graft

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Bi, Etl, Hierarchy}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator family (SURVEY.md §2)
  * to a `(spark, sfDir) => DataFrame` builder; `oracleSql` carries the
  * DuckDB-runnable twin used by the driver's correctness gate. Keys are
  * ListMap-ordered to keep reports readable.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Bi.revenueByCategory(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    // Reference BI queries (BI_Questions.sql)
    "q01_revenue_by_category" -> (Bi.revenueByCategory _),
    "q02_top_customers" -> (Bi.topCustomers _),
    "q03_monthly_trend" -> (Bi.monthlyTrend _),
    // Recursive hierarchy + anti-join (sql_definitions.sql)
    "q04_org_closure" -> (Hierarchy.orgClosure _),
    "q05_manager_chains" -> (Hierarchy.managerChains _),
    "q06_customers_without_orders" -> (Hierarchy.customersWithoutOrders _),
    // ETL pipeline operators (ETL_DAG.py)
    "q07_etl_clean_sales" -> (Etl.cleanSales _),
    "q08_quality_report" -> (Etl.qualityReport _),
    "q09_country_resolution" -> (Etl.countryResolution _)
  )

  def oracleSql: Map[String, String] = ListMap(
    "q01_revenue_by_category" -> Bi.revenueByCategorySql,
    "q02_top_customers" -> Bi.topCustomersSql,
    "q03_monthly_trend" -> Bi.monthlyTrendSql,
    "q04_org_closure" -> Hierarchy.orgClosureSql,
    "q05_manager_chains" -> Hierarchy.managerChainsSql,
    "q06_customers_without_orders" -> Hierarchy.customersWithoutOrdersSql,
    "q07_etl_clean_sales" -> Etl.cleanSalesSql,
    "q08_quality_report" -> Etl.qualityReportSql,
    "q09_country_resolution" -> Etl.countryResolutionSql
  )
}
