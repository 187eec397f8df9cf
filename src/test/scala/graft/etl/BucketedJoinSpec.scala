package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffle: two tables bucketed the same way on the
  * join key co-locate matching rows at WRITE time, so every later join
  * between them plans with ZERO Exchange — the 100 TB lever for fact ×
  * fact joins that repeat daily (pay the shuffle once when the data
  * lands, never again). This spec proves the plan property end-to-end
  * through a real catalog round-trip, not by assertion on intent:
  * write documents + a per-doc stats frame bucketed by doc_id, join
  * them back, and require the executed plan to contain no shuffle at
  * all. */
class BucketedJoinSpec extends SparkSpec {

  test("same-bucketed tables join with zero Exchange in the plan") {
    val docs = Tables.load(spark, sf001, "documents")
    val stats = docs.select(col("doc_id"),
      length(col("text")).as("n_chars2"))
    try {
      docs.write.mode("overwrite")
        .bucketBy(8, "doc_id").sortBy("doc_id")
        .saveAsTable("bkt_documents")
      stats.write.mode("overwrite")
        .bucketBy(8, "doc_id").sortBy("doc_id")
        .saveAsTable("bkt_doc_stats")
      // force the join path (broadcast would also be exchange-free, but
      // we are proving the BUCKETED SMJ shape that survives any size)
      val joined = spark.sql(
        """SELECT /*+ MERGE(a) */ a.doc_id, a.source, b.n_chars2
          |FROM bkt_documents a JOIN bkt_doc_stats b ON a.doc_id = b.doc_id
          |""".stripMargin)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() == docs.count())
      // and the bucket metadata actually survived the catalog round-trip
      val desc = spark.sql("DESCRIBE EXTENDED bkt_documents")
        .collect().map(_.mkString(" ")).mkString("\n")
      assert(desc.contains("doc_id") && desc.toLowerCase.contains("bucket"))
    } finally {
      // the catalog tables are persistent (spark-warehouse on disk) —
      // drop them so repeated test runs leave no residue in the workdir
      spark.sql("DROP TABLE IF EXISTS bkt_documents")
      spark.sql("DROP TABLE IF EXISTS bkt_doc_stats")
    }
  }
}
