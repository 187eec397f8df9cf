package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-design intent the reference encodes only as comments
  * (SURVEY.md §4: "cluster by product_id", "partition by
  * TRANSACTION_DATE") made real:
  *
  *  - date partitioning → Catalyst partition-prunes range filters for
  *    free (the 100 TB q03 reads ~12 of N month directories);
  *  - bucketing on the join key → co-located joins with NO shuffle on
  *    either side (the "cluster by" hint; verified in LayoutSpec by
  *    asserting the join plan has no Exchange).
  */
object Layout {

  /** Write a fact partitioned by month of `dateCol` (directory-level
    * pruning; low cardinality keeps file counts sane at scale). */
  def writeDatePartitioned(df: DataFrame, dateCol: String, path: String): Unit =
    df.withColumn("part_month",
        date_format(col(dateCol), "yyyy-MM"))
      .write.mode("overwrite")
      .partitionBy("part_month")
      .parquet(path)

  /** ORC sink beside the parquet one: both formats keep the min/max
    * statistics and dictionary encodings that make pushdown work, so
    * format choice is a storage-policy decision, not a plan change. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Persist a table bucketed (and sorted) by the join key — Spark's
    * durable equivalent of the reference's CLUSTER BY. Joins between
    * tables bucketed the same way skip the shuffle entirely. */
  def writeBucketed(df: DataFrame, key: String, buckets: Int,
      table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
