package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the "data mixing" step of a
  * training-corpus pipeline: take an exact per-stratum quota from every
  * (lang, source) cell so the mixture is controlled, reproducibly.
  *
  * Determinism: rows are ranked inside each stratum by
  * (md5(doc_id), doc_id) — a pseudo-random but engine-portable order —
  * and the first ⌈frac·|stratum|⌉ survive. No RNG, so Spark and the
  * DuckDB oracle pick the SAME sample, and re-runs are stable (the
  * property a curator actually needs for ablations).
  *
  * Scale: one shuffle keyed by (lang, source). `row_number` serializes
  * each stratum through one partition — fine while strata stay under
  * ~10M rows; for 100 TB mega-strata, swap to the two-pass form (count
  * per stratum, broadcast quotas, keep rows whose md5 rank-hash falls
  * under the per-stratum threshold) which trades exact quotas for
  * fully-parallel selection within each stratum.
  */
object Sampling {

  val SampleFrac = 0.2

  /** q31 — exact-quota stratified sample over (lang, source). */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val stratum = Window.partitionBy(col("lang"), col("source"))
    val order = stratum.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"), col("source"),
        row_number().over(order).as("rk"),
        count(lit(1)).over(stratum).as("cnt"))
      .filter(col("rk") <= ceil(col("cnt") * SampleFrac))
      .select(col("doc_id"), col("lang"), col("source"),
        col("rk").cast("long").as("stratum_rank"),
        col("cnt").as("stratum_size"))
      .orderBy("doc_id")
  }

  val stratifiedSampleSql: String =
    s"""WITH r AS (
       |  SELECT doc_id, lang, source,
       |         row_number() OVER (PARTITION BY lang, source
       |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
       |         count(*) OVER (PARTITION BY lang, source) AS cnt
       |  FROM documents)
       |SELECT doc_id, lang, source,
       |       CAST(rk AS BIGINT) AS stratum_rank,
       |       CAST(cnt AS BIGINT) AS stratum_size
       |FROM r WHERE rk <= ceil(cnt * $SampleFrac)
       |ORDER BY doc_id""".stripMargin
}
