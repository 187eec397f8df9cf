package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Star-schema DDL parity (reference S9-S10, sql_definitions.sql:149-190):
  * the fact/dim CREATE TABLEs against the Spark catalog, and the `dates`
  * dimension the reference declares but never populates — generated here
  * via sequence+explode (SURVEY.md §7.3 step 5).
  */
object StarSchema {

  /** Reference DDL re-expressed for the Spark catalog (PRIMARY KEY has no
    * Spark enforcement — uniqueness lives in the quality gate instead). */
  val ddl: Seq[String] = Seq(
    """CREATE TABLE IF NOT EXISTS fact_table (
      |  transaction_id INT NOT NULL,
      |  transaction_date DATE NOT NULL,
      |  customer_id INT NOT NULL,
      |  product_id INT NOT NULL,
      |  amount DECIMAL(10, 2) NOT NULL
      |) USING parquet PARTITIONED BY (transaction_date)""".stripMargin,
    """CREATE TABLE IF NOT EXISTS customers (
      |  customer_id INT NOT NULL, name STRING NOT NULL,
      |  email STRING, country STRING
      |) USING parquet""".stripMargin,
    """CREATE TABLE IF NOT EXISTS products (
      |  product_id INT NOT NULL, product_name STRING NOT NULL,
      |  category STRING, price DECIMAL(10, 2) NOT NULL
      |) USING parquet""".stripMargin,
    """CREATE TABLE IF NOT EXISTS dates (
      |  date_key DATE NOT NULL, year_num INT, month_num INT, day_num INT
      |) USING parquet""".stripMargin)

  def createAll(spark: SparkSession): Unit = ddl.foreach(spark.sql(_))

  /** Populate the dates dim for a date range — a distributed sequence
    * explode, no driver-side loop. The reference never fills this table;
    * cheap completeness (SURVEY.md §1.1). */
  def datesDim(spark: SparkSession, from: String, to: String): DataFrame =
    spark.range(1).select(explode(sequence(
        to_date(lit(from)), to_date(lit(to)), expr("INTERVAL 1 DAY")))
        .as("date_key"))
      .select(col("date_key"),
        year(col("date_key")).as("year_num"),
        month(col("date_key")).as("month_num"),
        dayofmonth(col("date_key")).as("day_num"))

  /** The 10-row employees fixture insert (S10) as catalog DDL + DML. */
  def seedEmployees(spark: SparkSession): Unit = {
    spark.sql(
      """CREATE TABLE IF NOT EXISTS employees (
        |  employee_id INT, name STRING, manager_id INT) USING parquet""".stripMargin)
    if (spark.table("employees").isEmpty) {
      graft.queries.Hierarchy.employees(spark)
        .write.mode("append").saveAsTable("employees")
    }
  }
}
