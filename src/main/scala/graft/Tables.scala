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

  /** Fact tables whose fixture collapses to ONE parquet split (every
    * testdata file is a single row group), mapped to a deterministic
    * high-cardinality key: a single-split scan runs every downstream
    * map stage as ONE task while the other cores idle — the guide
    * §2.5 "input skew: one file" case (measured 0.5–1.0s single-task
    * scan stages across the BI/text/event families at sf0.1). The
    * loader repartitions these by HASH of the key (a keyless
    * round-robin would pay `sortBeforeRepartition`'s local sort of
    * the whole file inside the same single task) — and ONLY when the
    * scan would plan fewer splits than the session's parallelism, so
    * at production scale (many splits per table) the widen is a
    * no-op and no extra exchange exists. Dims (region…part) and the
    * plan-pinned embeddings (q264/q266 map-only whitening: ≤1/≤2
    * exchanges; the Similarity family widens selectively via
    * Similarity.widen) are deliberately absent. */
  /** Measured at sf0.1 (OPTIMIZATION_r14.md): widening lineitem cut
    * q42 2.11→0.84s, q45 2.95→1.31s, q01/q66/q159/q201/q84 20-30%
    * each. documents/events widening was tried and REVERTED: their
    * consumers are dominated by high-cardinality token/property
    * aggregations whose map-side combine inflates ~|partitions|× when
    * the scan fans out (each partition sees most of the vocab), a net
    * 1.3-1.5× regression across ~10 measured queries. Heavy per-row
    * document passes widen surgically at their own call sites
    * instead. */
  private val widenKeys: Map[String, String] = Map(
    "lineitem" -> "l_orderkey")

  /** Spark's own split count for one file (FilePartition.maxSplitBytes
    * math), derived from the file length — no RDD instantiation, no
    * extra planning pass. */
  private def scanSplits(spark: SparkSession, path: String): Int =
    splitsForBytes(spark,
      new java.io.File(path.stripPrefix("file:")).length())

  /** The FilePartition.maxSplitBytes split-count formula for a scan of
    * `bytes0` total input (also Similarity.widen's file-scan leaf
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
    val path = s"$sfDir/$name.parquet"
    val df = spark.read.parquet(path)
    widenKeys.get(name) match {
      case Some(_)
          if scanSplits(spark, path) <
            spark.sparkContext.defaultParallelism =>
        df.repartition(spark.sparkContext.defaultParallelism)
      case _ => df
    }
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
