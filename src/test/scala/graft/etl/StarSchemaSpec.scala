package graft.etl

import graft.SparkSpec
import java.nio.file.Files

class StarSchemaSpec extends SparkSpec {

  test("dates dim generates a full calendar with derived parts") {
    val d = StarSchema.datesDim(spark, "2024-01-01", "2024-12-31").collect()
    assert(d.length == 366) // 2024 is a leap year
    val jan31 = d.find(_.getAs[java.sql.Date]("date_key").toString == "2024-01-31").get
    assert(jan31.getAs[Int]("year_num") == 2024)
    assert(jan31.getAs[Int]("month_num") == 1)
    assert(jan31.getAs[Int]("day_num") == 31)
  }

  test("DDL creates the star schema in the catalog") {
    val s2 = spark.newSession() // warehouse dir set by TestSession
    StarSchema.createAll(s2)
    val tables = s2.sql("SHOW TABLES").collect().map(_.getString(1)).toSet
    assert(Set("fact_table", "customers", "products", "dates").subsetOf(tables))
    val fact = s2.table("fact_table")
    assert(fact.schema("amount").dataType.typeName == "decimal(10,2)")
    StarSchema.seedEmployees(s2)
    assert(s2.table("employees").count() == 10)
  }
}
