package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BiSpec extends SparkSpec {

  test("HLL sketch distinct stays within 5% of exact (the 100 TB path)") {
    val li = Tables.load(spark, sf001, "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("approx"))
      .collect()
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"flag ${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
