package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    (1, 10.0, "a@b.com"),
    (2, -5.0, "bad-email"),
    (3, 0.0, null),
    (4, 7.5, "x@y.org")
  ).toDF("id", "amount", "email")

  test("report counts violations per rule in one pass") {
    val checks = Seq(
      Check("amount_positive", col("amount") > 0, "amount > 0"),
      Check("email_format", col("email").rlike(LoadJob.emailRegex), "email"))
    val got = Quality.report(frame, checks).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("amount_positive" -> 2L, "email_format" -> 2L))
  }

  test("null predicate result counts as violation (na=False semantics)") {
    val checks = Seq(Check("email_format",
      col("email").rlike(LoadJob.emailRegex), "email"))
    // row 3 has NULL email -> rlike yields NULL -> must count as violation
    assert(Quality.violations(frame, checks.head).count() == 2)
  }

  test("gate aggregates ALL failed rules into one error") {
    val checks = Seq(
      Check("amount_positive", col("amount") > 0, "amount must be positive"),
      Check("email_format", col("email").rlike(LoadJob.emailRegex), "bad email"),
      Check("id_present", col("id").isNotNull, "id required"))
    val e = intercept[ValidationError] {
      Quality.gate(frame, checks, "t")
    }
    assert(e.getMessage.contains("2 rule(s)"))
    assert(e.getMessage.contains("amount must be positive"))
    assert(e.getMessage.contains("bad email"))
    assert(!e.getMessage.contains("id required"))
  }

  test("gate passes on clean data") {
    Quality.gate(frame, Seq(Check("id_present", col("id").isNotNull, "id")), "t")
  }

  test("requireColumns lists every missing column") {
    val e = intercept[ValidationError] {
      Quality.requireColumns(frame, Seq("id", "nope1", "nope2"))
    }
    assert(e.getMessage.contains("nope1") && e.getMessage.contains("nope2"))
  }

  test("observed gate: counters ride the consuming action, same counts as report") {
    val checks = Seq(
      Check("amount_positive", col("amount") > 0, "amount must be positive"),
      Check("email_format", col("email").rlike(LoadJob.emailRegex), "bad email"))
    val (instrumented, obs) = Quality.observed(frame, checks, "t")
    assert(instrumented.columns.sameElements(frame.columns),
      "observe must not change the frame's schema")
    instrumented.write.mode("overwrite")
      .parquet(java.nio.file.Files.createTempDirectory("graft-obs").toString + "/t")
    // counters are available from the WRITE action alone — no second scan
    val e = intercept[ValidationError] {
      Quality.assertObserved(obs, checks, "t")
    }
    assert(e.getMessage.contains("2 rule(s)"))
    assert(e.getMessage.contains("amount must be positive: 2 invalid rows"))
    assert(e.getMessage.contains("bad email: 2 invalid rows"))
  }

  test("writeValidated promotes clean data and removes staging") {
    val base = java.nio.file.Files.createTempDirectory("graft-wv").toString
    val path = s"$base/clean"
    val r = LoadJob.writeValidated(frame,
      Seq(Check("id_present", col("id").isNotNull, "id")), path, "clean")
    assert(r.rows == 4)
    assert(spark.read.parquet(path).count() == 4)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path.staging")),
      "staging dir must be renamed away on success")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path.old")),
      "retired dir must be cleaned up after the swap")
    // second load over the same path exercises the retire-and-swap branch
    val r2 = LoadJob.writeValidated(frame,
      Seq(Check("id_present", col("id").isNotNull, "id")), path, "clean")
    assert(r2.rows == 4 && spark.read.parquet(path).count() == 4)
  }

  test("writeValidated never publishes a failing table") {
    val base = java.nio.file.Files.createTempDirectory("graft-wv2").toString
    val path = s"$base/dirty"
    intercept[ValidationError] {
      LoadJob.writeValidated(frame,
        Seq(Check("amount_positive", col("amount") > 0, "amount")), path, "dirty")
    }
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path)),
      "published path must not exist after a gate failure")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path.staging")),
      "failed staging dir must be cleaned up")
  }
}
