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
