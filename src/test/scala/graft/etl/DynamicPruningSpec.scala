package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Dynamic partition pruning = the runtime twin of static pushdown: a
  * fact table PARTITIONED on the join key gets its partitions pruned
  * by the dim side's filter AT EXECUTION TIME, so a selective dim
  * predicate reads only the matching fact partitions — at 100 TB the
  * difference between scanning a year and scanning a week. This spec
  * proves the plan property end-to-end through a real partitioned
  * write: orders partitioned by priority, joined to a filtered
  * one-priority dim, must plan a `dynamicpruning` subquery on the
  * partition column and return exactly that partition's rows. */
class DynamicPruningSpec extends SparkSpec {

  /** Recursive delete for the spec's temp parquet dirs — leaving them
    * under /tmp accumulates residue across test runs. */
  private def rmTree(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root))
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("selective dim filter prunes fact partitions at runtime") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim")
      .toString
    try { runPruningChecks(dir, dimDir) }
    finally { rmTree(dir); rmTree(dimDir) }
  }

  private def runPruningChecks(dir: String, dimDir: String): Unit = {
    val ord = Tables.load(spark, sf001, "orders")
    ord.write.mode("overwrite")
      .partitionBy("o_orderpriority").parquet(dir)
    val fact = spark.read.parquet(dir)
    // DPP needs a FILTERED relation on the dim side (the optimizer
    // derives the pruning subquery from that filter), so the dim is a
    // real parquet table too
    ord.select(col("o_orderpriority").as("p")).distinct()
      .withColumn("dim_payload", length(col("p")).cast("long"))
      .write.mode("overwrite").parquet(dimDir)
    // the filter must NOT be on the join key itself — a literal key
    // equality constant-propagates into a STATIC PartitionFilter (also
    // asserted below, it is the even-cheaper path); a payload predicate
    // keeps the matching key unknown until runtime, which is what
    // forces the dynamic pruning subquery
    val dim = spark.read.parquet(dimDir).filter(col("dim_payload") === 6L)
    val joined = fact.join(broadcast(dim),
      fact("o_orderpriority") === dim("p"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"partition-column join must plan a dynamicpruning subquery:\n$plan")
    val expected = ord.filter(col("o_orderpriority") === "2-HIGH").count()
    assert(joined.count() == expected)

    // and the static twin: a literal join-key filter propagates into a
    // compile-time PartitionFilter, no subquery needed
    val staticJoin = fact.join(
      broadcast(spark.read.parquet(dimDir).filter(col("p") === "1-URGENT")),
      fact("o_orderpriority") === col("p"))
    val staticPlan = staticJoin.queryExecution.executedPlan.toString
    assert(staticPlan.contains("PartitionFilters: [(o_orderpriority"),
      s"literal key filter must become a static partition filter:\n$staticPlan")
  }
}
