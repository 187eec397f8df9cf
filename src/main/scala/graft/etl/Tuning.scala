package graft.etl

import org.apache.spark.sql.SparkSession

/** Cluster-sizing arithmetic for running this engine at the 100 TB /
  * 1000-executor scale the design targets (ARCHITECTURE.md "Scale
  * design"). The rules are the standard Spark capacity model, kept as
  * code so deployment scripts and tests share one source of truth
  * instead of re-deriving magic numbers:
  *
  *  - shuffle partitions sized so each post-shuffle partition lands
  *    near a target size (default 256 MB — large enough to amortize
  *    task overhead, small enough to aggregate in executor memory
  *    without spill), clamped below by total cores (no idle slots) —
  *    AQE then coalesces small partitions at runtime;
  *  - scan split size (`files.maxPartitionBytes`) follows the same
  *    target so map tasks are uniform;
  *  - broadcast threshold stays at the built-in default unless the
  *    driver has headroom: broadcasting is per-executor memory, so the
  *    cap scales with executor memory, not data size.
  */
object Tuning {

  val TargetPartitionBytes: Long = 256L << 20

  /** Shuffle partition count for `inputBytes` of post-filter data:
    * ceil(bytes / target), at least one task per core, at most
    * `maxPartitions` (file-count / scheduler-pressure backstop). */
  def shufflePartitionsFor(inputBytes: Long, totalCores: Int,
      targetBytes: Long = TargetPartitionBytes,
      maxPartitions: Int = 200000): Int = {
    require(inputBytes >= 0 && totalCores > 0 && targetBytes > 0)
    val bySize = (inputBytes + targetBytes - 1) / targetBytes
    math.min(maxPartitions.toLong, math.max(bySize, totalCores.toLong)).toInt
  }

  /** Apply the sizing to a session: shuffle partitions from the
    * expected shuffle volume, matching scan splits, AQE left on to
    * coalesce/split at runtime (the static number is a ceiling, not a
    * promise). */
  def configure(spark: SparkSession, expectedShuffleBytes: Long,
      totalCores: Int): Unit = {
    val parts = shufflePartitionsFor(expectedShuffleBytes, totalCores)
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    spark.conf.set("spark.sql.files.maxPartitionBytes",
      TargetPartitionBytes.toString)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
  }
}
