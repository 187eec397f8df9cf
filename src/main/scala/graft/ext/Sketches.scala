package graft.ext

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Portable probabilistic sketches — the 100 TB answer to "how many
  * distinct X" when an exact distinct would shuffle every key.
  *
  * The HyperLogLog here is implemented from its published definition
  * (Flajolet et al. 2007) directly in relational algebra, on both
  * engines, from the same md5-derived bits:
  *
  *   bucket = first 8 hash bits, rho = leading-zero count of the next
  *   32 bits + 1, register = MAX(rho) per bucket, estimate =
  *   alpha·m² / Σ 2^(-register), with the small-range linear-counting
  *   correction when the estimate is under 2.5·m.
  *
  * Because every step is a deterministic function of md5, the DuckDB
  * oracle reproduces the estimate EXACTLY (the Σ 2^(-M) sum spans 33
  * bits < the 53-bit mantissa, so even the double addition is
  * order-independent) — a sketch with a hash-matching oracle, unlike
  * engine-native `approx_count_distinct` whose sketch is opaque.
  *
  * Scale shape: one scan, partial MAX per (group, bucket) map-side, one
  * shuffle of at most |groups|·m tiny register rows. Registers merge by
  * MAX, so shards/days can be sketched independently and unioned — the
  * property that makes HLL the standard distinct-counter at 100 TB.
  */
object Sketches {

  /** m = 256 registers (b = 8 bucket bits): ±6.5% standard error. */
  val HllBuckets = 256

  /** alpha_256 from the HLL paper: 0.7213 / (1 + 1.079/m). */
  val HllAlpha: Double = 0.7213 / (1.0 + 1.079 / HllBuckets)

  /** rho over the 32-bit value v: leading zeros + 1; v = 0 → 33.
    * Exact integer threshold chain — no float log2 edge cases. */
  private def rhoCol(v: Column): Column =
    (30 to 0 by -1).foldLeft(when(v >= (1L << 31), lit(1))) {
      (acc, k) => acc.when(v >= (1L << k), lit(32 - k))
    }.otherwise(lit(33))

  private val rhoSql: String = {
    val cases = (31 to 0 by -1)
      .map(k => s"WHEN v >= ${1L << k} THEN ${32 - k}").mkString(" ")
    s"CASE $cases ELSE 33 END"
  }

  /** q87 — distinct users per event_type, exact vs the portable HLL,
    * with the relative error the 6.5%-rse sketch actually achieved. */
  def hllDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val m = HllBuckets
    // loadEvents, not Tables.load: the events parquet is TIMESTAMP(NANOS)
    // and needs the legacy nanosAsLong conf even when ts isn't selected
    val ev = Events.loadEvents(spark, sfDir)
      .select(col("event_type"), col("user_id"))
    val h = md5(col("user_id").cast("string"))
    val hashed = ev.select(col("event_type"),
      conv(substring(h, 1, 2), 16, 10).cast("int").as("bucket"),
      conv(substring(h, 3, 8), 16, 10).cast("long").as("v"))
    val regs = hashed.groupBy("event_type", "bucket")
      .agg(max(rhoCol(col("v"))).as("reg"))
    val raw = lit(HllAlpha * m * m) /
      (col("s") + (lit(m) - col("b")).cast("double"))
    val est = regs.groupBy("event_type")
      .agg(sum(pow(lit(2.0), -col("reg"))).as("s"), count(lit(1)).as("b"))
      .select(col("event_type"),
        when(raw <= lit(2.5 * m) && col("b") < m,
          lit(m.toDouble) * log(lit(m.toDouble) /
            (lit(m) - col("b")).cast("double")))
          .otherwise(raw).as("est"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    exact.join(est, Seq("event_type"))
      .select(col("event_type"), col("n_exact"),
        round(col("est"), 4).as("n_hll"),
        round(abs(col("est") - col("n_exact")) / col("n_exact"), 6)
          .as("rel_err"))
      .orderBy("event_type")
  }

  /** DuckDB twin, generated from the same constants (m, alpha, the rho
    * threshold chain) so sketch geometry can never drift. */
  val hllDistinctSql: String = {
    val m = HllBuckets
    s"""WITH hashed AS (
       |  SELECT event_type,
       |         ('0x'||substr(md5(user_id::VARCHAR),1,2))::INT AS bucket,
       |         ('0x'||substr(md5(user_id::VARCHAR),3,8))::BIGINT AS v
       |  FROM events
       |), regs AS (
       |  SELECT event_type, bucket, MAX($rhoSql) AS reg
       |  FROM hashed GROUP BY 1, 2
       |), agg AS (
       |  SELECT event_type, SUM(power(2.0, -reg)) AS s, COUNT(*) AS b
       |  FROM regs GROUP BY 1
       |), est AS (
       |  SELECT event_type,
       |         CASE WHEN ${HllAlpha * m * m}::DOUBLE / (s + ($m - b)) <= ${2.5 * m}
       |                   AND b < $m
       |              THEN $m * ln($m::DOUBLE / ($m - b))
       |              ELSE ${HllAlpha * m * m}::DOUBLE / (s + ($m - b)) END AS est
       |  FROM agg
       |), ex AS (
       |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
       |  FROM events GROUP BY 1
       |)
       |SELECT x.event_type, x.n_exact, round(e.est, 4) AS n_hll,
       |       round(abs(e.est - x.n_exact) / x.n_exact, 6) AS rel_err
       |FROM ex x JOIN est e ON x.event_type = e.event_type
       |ORDER BY x.event_type""".stripMargin
  }
}
