package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Small-file compaction — the table-maintenance pass every
    * long-running ingest needs: streaming/incremental writers leave
    * thousands of KB-sized files per partition, and at 100 TB the
    * resulting task-per-file scheduling + footer reads dominate scan
    * cost. Rewrites the input to ⌈bytes/target⌉ near-equal files via a
    * round-robin repartition (balanced regardless of input skew).
    * Input size comes from the relation's own statistics (sum of file
    * sizes for a parquet scan), so no extra pass over the data; the
    * default 256 MB target matches `Tuning.TargetPartitionBytes`.
    * Returns the output file count so callers can assert/log the
    * compaction ratio. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 256L << 20): Long = {
    val df = spark.read.parquet(inPath)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = ((bytes + targetFileBytes - 1) / targetFileBytes)
      .max(1).toLong
    df.repartition(nFiles.toInt).write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Partitioned compaction — the maintenance pass that folds a
    * streaming/incremental sink's per-micro-batch appends into a
    * SERVING layout: read the flat append files, hash-cluster on the
    * partition column so each key's rows land in one task, and
    * rewrite `partitionBy(key)` — one file per populated partition
    * directory (the directory-pruned layout q282's serve reads). At
    * larger per-key volumes set spark.sql.files.maxRecordsPerFile to
    * split hot keys; the clustering keeps every file single-key
    * either way. Returns the output data-file count so callers can
    * audit the compaction ratio. */
  def compactPartitioned(spark: SparkSession, inPath: String,
      outPath: String, partCol: String): Long = {
    spark.read.parquet(inPath)
      .repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(outPath)
    parquetFileCount(outPath)
  }

  /** Count the parquet data files under a directory tree (hidden
    * marker/temporary files excluded). */
  def parquetFileCount(path: String): Long = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) 0L
    else {
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().asScala.count(f =>
        f.toString.endsWith(".parquet") &&
          !f.getFileName.toString.startsWith(".")).toLong
      finally walk.close()
    }
  }

  /** Bits per dimension for the Z-order curve (2·ZBits-bit z-value). */
  val ZBits = 8

  /** Morton/Z-order interleave of two ZBits-wide ints — the multi-
    * dimensional clustering key date-partitioning (one dim) can't give:
    * sorting by z keeps BOTH dimensions locally dense, so per-file
    * min/max stats stay tight on either column and row-group skipping
    * works for predicates on x, on y, or both. Pure codegen'd bit ops. */
  def zValue(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  private def zValueSql(x: String, y: String): String =
    (0 until ZBits).map(i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) | (((($y) >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")

  /** Cluster a frame along the Z-curve of (x, y) — the write-side
    * layout step: range-partition by z so each output file covers one
    * compact z-run (a small rectangle in (x, y) space), then sort
    * within partitions for row-group-level stats. */
  def clusterByZ(df: DataFrame, x: Column, y: Column,
      partitions: Int): DataFrame = {
    val z = zValue(x, y)
    df.repartitionByRange(partitions, z).sortWithinPartitions(z)
  }

  /** q88 — the skipping-bounds report that PROVES the z-layout works:
    * bucket lineitem rows by the top 6 z-bits of
    * (l_partkey mod 256, l_suppkey mod 256) — exactly the file grain
    * clusterByZ produces — and report each bucket's (x, y) envelope.
    * Every bucket spans at most 1/8 of EACH dimension's domain (a
    * 32×32 tile), so a predicate on either column prunes ~7/8 of the
    * files from min/max stats alone; a single-column sort would give
    * tight x bounds but full-domain y bounds. LayoutSpec asserts the
    * envelope bound; the oracle re-derives the same interleave. */
  def zorderStats(spark: SparkSession, sfDir: String): DataFrame = {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select((col("l_partkey") % 256).as("x"), (col("l_suppkey") % 256).as("y"))
    li.select(col("x"), col("y"),
        shiftright(zValue(col("x"), col("y")), 10).as("zbucket"))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .orderBy("zbucket")
  }

  val zorderStatsSql: String =
    s"""WITH xy AS (
       |  SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem
       |), z AS (
       |  SELECT x, y, (${zValueSql("x", "y")}) >> 10 AS zbucket FROM xy
       |)
       |SELECT zbucket, CAST(COUNT(*) AS BIGINT) AS n,
       |       MIN(x) AS min_x, MAX(x) AS max_x,
       |       MIN(y) AS min_y, MAX(y) AS max_y
       |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin
}
