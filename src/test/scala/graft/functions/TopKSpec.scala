package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("typed top-k aggregator equals the window-rank answer without a global sort") {
    val orders = Tables.load(spark, sf001, "orders")
    // top-5 customers by total spend, via bounded-buffer aggregation
    val spend = orders.groupBy(col("o_custkey"))
      .agg(sum(Tables.money(col("o_totalprice"))).cast("double").as("total"))
      .as[(Long, Double)]
    val viaAgg = spend
      .select(new TopK(5).toColumn.name("ids"))
      .head().asInstanceOf[Seq[Long]]

    val viaSort = spend.toDF("id", "total")
      .orderBy(col("total").desc, col("id")).limit(5)
      .collect().map(_.getLong(0)).toSeq

    assert(viaAgg == viaSort)
  }

  test("merge is associative across partitions") {
    val data = (1L to 1000L).map(i => (i, (i % 97).toDouble))
    val viaAgg = data.toDF("id", "score").repartition(13).as[(Long, Double)]
      .select(new TopK(3).toColumn.name("ids"))
      .head().asInstanceOf[Seq[Long]]
    val expected = data.sortBy { case (id, s) => (-s, id) }.take(3).map(_._1)
    assert(viaAgg == expected)
  }
}
