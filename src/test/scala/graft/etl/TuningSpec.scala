package graft.etl

import graft.SparkSpec

class TuningSpec extends SparkSpec {

  test("partition count scales with bytes and floors at core count") {
    // tiny input: one task per core, never fewer
    assert(Tuning.shufflePartitionsFor(1L << 20, totalCores = 32) == 32)
    // 100 TB at 256 MB target = 409600 partitions, capped by backstop
    assert(Tuning.shufflePartitionsFor(100L << 40, totalCores = 32000) == 200000)
    // 1 TB at 256 MB = 4096, above a 1000-core floor
    assert(Tuning.shufflePartitionsFor(1L << 40, totalCores = 1000) == 4096)
    // exact multiples don't round up an extra partition
    assert(Tuning.shufflePartitionsFor(
      512L << 20, totalCores = 1, targetBytes = 256L << 20) == 2)
  }

  test("configure applies the sizing and leaves AQE on") {
    val s = spark.newSession()
    Tuning.configure(s, expectedShuffleBytes = 1L << 40, totalCores = 1000)
    assert(s.conf.get("spark.sql.shuffle.partitions") == "4096")
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(s.conf.get("spark.sql.files.maxPartitionBytes") ==
      (256L << 20).toString)
  }
}
