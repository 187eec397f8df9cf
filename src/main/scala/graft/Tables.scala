package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver-shipped parquet fixtures (TESTDATA.md).
  *
  * Every query receives `(spark, sfDir)` and loads what it needs through
  * here, so the parquet scans stay lazy and Catalyst can push filters and
  * prune columns into the scan. Temp views are registered on demand so the
  * same queries can also run as `spark.sql` text against the identical
  * table names the DuckDB oracle uses.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** NO loader-level scan widening — tried THREE ways this round and
    * reverted on measurement (OPTIMIZATION_r14.md "lineitem widen
    * calibration"). Every fixture table is one parquet split, so
    * scan-rooted stages run as one task — but anchored against the
    * round-12-close SCALING steady times, the no-widen loader is the
    * fastest shape for the whole lineitem family (23.9 s vs 31.3
    * hash-repartition vs 38.8 round-robin over the 34 fact queries):
    * most consumers are one cheap scan+partial-agg pass where a
    * full-table exchange costs more than the fan-out buys, round-robin
    * additionally pays sortBeforeRepartition's local sort inside the
    * single input task, and hash-by-key defeats column pruning
    * (PlanSpec pins q201). The round-open numbers that motivated the
    * widen (q07 "3.25 s") were cold-box artifacts of the open bench —
    * steady is 1.14 s on the identical code. At production scale a
    * fact scan has many splits and parallelizes natively; operators
    * whose per-row work is genuinely heavy (band generation, the
    * similarity family) widen at their own call sites via
    * Similarity.widen, which stays a no-op at scale. documents/events
    * widening also tried/reverted: their token/property aggregation
    * consumers inflate the map-side combine ~|partitions|×. */
  /** The FilePartition.maxSplitBytes split-count formula for a scan of
    * `bytes0` total input (Similarity.widen's file-scan leaf
    * estimate). */
  private[graft] def splitsForBytes(spark: SparkSession, bytes0: Long): Int = {
    val bytes = bytes0.max(1L)
    val openCost = 4L << 20
    val maxPartition = spark.conf
      .get("spark.sql.files.maxPartitionBytes", s"${128L << 20}") match {
        case s if s.forall(_.isDigit) => s.toLong
        case _ => 128L << 20
      }
    val cores = spark.sparkContext.defaultParallelism.max(1)
    val bytesPerCore = (bytes + openCost) / cores
    val maxSplit = math.min(maxPartition, math.max(openCost, bytesPerCore))
    ((bytes + maxSplit - 1) / maxSplit).toInt
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // the events fixture is parquet TIMESTAMP(NANOS), which Spark only
    // reads behind this flag; set it here so NO caller depends on some
    // earlier query having set it session-wide (Events.loadEvents then
    // converts the long to a µs timestamp)
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register all fixture tables as temp views (names as in TESTDATA.md). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Money arithmetic: the fixtures store money as double, but the
    * reference schema is DECIMAL(10,2) (sql_definitions.sql:164,181) and —
    * more importantly — summing doubles is order-dependent, which would
    * break hash comparison against the DuckDB oracle. Sums are therefore
    * done in exact decimal and only the final result is cast back.
    */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))
}
