package graft.functions

import graft.SparkSpec
import graft.functions.RollingFingerprint.rolling_fingerprint
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class FingerprintSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: min over all k-windows of the polynomial hash. */
  private def reference(s: String, k: Int): Long = {
    val M = BigInt(Fingerprints.Mod)
    val B = BigInt(Fingerprints.Base)
    val n = s.length
    if (n == 0) return 0L
    val kk = math.min(k, n)
    (0 to n - kk).map { i =>
      s.substring(i, i + kk).foldLeft(BigInt(0))((h, c) => (h * B + c.toInt) mod M)
    }.min.toLong
  }

  test("expression matches the naive reference implementation") {
    val samples = Seq("hello world", "a", "", "the quick brown fox",
      "aaaaaaaaaaaa", "unicode: äöü ß € 你好")
    samples.foreach { s =>
      val fast = Fingerprints.minRollingHash(UTF8String.fromString(s), 8)
      assert(fast == reference(s, 8), s"mismatch for '$s'")
    }
  }

  test("runs inside a DataFrame plan (codegen path)") {
    val df = Seq("spark", "spark", "flink").toDF("t")
      .select(rolling_fingerprint(col("t"), 4).as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("plan stays in whole-stage codegen over a real scan") {
    // a local relation would be constant-folded by ConvertToLocalRelation,
    // so probe with a parquet scan; '*' prefixes WSCG stages
    val df = spark.read.parquet(s"$sf001/documents.parquet")
      .select(rolling_fingerprint(col("text")).as("fp"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"plan fell back:\n$plan")
    assert(df.count() == 500)
  }
}
