package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LayoutSpec extends SparkSpec {

  test("date partitioning gives partition pruning on range filters") {
    val out = Files.createTempDirectory("graft-layout").toString + "/li"
    Layout.writeDatePartitioned(
      Tables.load(spark, sf001, "lineitem"), "l_shipdate", out)
    val pruned = spark.read.parquet(out)
      .filter(col("part_month") === "1997-03")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part_month"),
      s"no partition filter in:\n$plan")
    // execute THIS Dataset (count() would build a separate plan whose
    // metrics we can't see) then read the scan's numFiles metric
    assert(pruned.collect().nonEmpty)
    val filesRead = pruned.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles").map(_.value).getOrElse(-1L)
    // pruning must skip most of the ~83 month partitions
    assert(filesRead >= 1 && filesRead <= 4,
      s"expected a handful of files after pruning, read $filesRead")
  }

  test("schema evolution: mergeSchema unifies old and new shards") {
    // the lake reality at 100 TB: yesterday's shards lack today's new
    // column. mergeSchema reconciles by NAME (SURVEY §1.3's rename
    // discipline) — old rows read null for the added column, nothing
    // is rewritten.
    val out = Files.createTempDirectory("graft-evolve").toString + "/t"
    val s = spark
    import s.implicits._
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$out/day=1")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.parquet(s"$out/day=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.columns.toSet == Set("id", "v", "score", "day"))
    val byId = merged.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).isNullAt(merged.columns.indexOf("score")),
      "pre-evolution rows must read null for the added column")
    assert(byId(2L).getAs[Double]("score") == 9.5)
  }

  test("orc round-trips losslessly and pushes filters to the scan") {
    val out = Files.createTempDirectory("graft-orc").toString + "/cust"
    val cust = Tables.load(spark, sf001, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    Layout.writeOrc(cust, out)
    val back = Ingest.readOrc(spark, out, cust.schema)
    assert(back.schema == cust.schema)
    assert(back.count() == cust.count())
    val filtered = back.filter(col("c_custkey") === 42L)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,42)"),
      s"filter not pushed to ORC scan:\n$scan")
    assert(filtered.count() == 1)
  }

  test("bucketed tables join without any shuffle") {
    val s2 = spark.newSession()
    // disable auto-broadcast: on fixture-sized tables the planner would
    // broadcast and skip bucketing; at 100 TB neither side broadcasts —
    // the bucketed sort-merge join is exactly the plan under test
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    Layout.writeBucketed(Tables.load(s2, sf001, "lineitem")
      .select("l_orderkey", "l_extendedprice"), "l_orderkey", 8, "li_bucketed")
    Layout.writeBucketed(Tables.load(s2, sf001, "orders")
      .select("o_orderkey", "o_custkey"), "o_orderkey", 8, "ord_bucketed")
    val joined = s2.table("li_bucketed")
      .join(s2.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("compaction collapses a small-file shard forest losslessly") {
    val tmp = java.nio.file.Files.createTempDirectory("compact").toString
    val in = s"$tmp/in"; val out = s"$tmp/out"
    val src = Tables.load(spark, sf001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    src.repartition(64).write.parquet(in) // the pathological writer
    def parquetFiles(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles(in) == 64)
    // tiny target -> multiple output files, sized from the scan stats
    val n = Layout.compact(spark, in, out, targetFileBytes = 24L * 1024)
    assert(parquetFiles(out) == n, "planned and written file counts differ")
    assert(n < 64 && n > 1, s"expected a real compaction ratio, got $n")
    // lossless: same multiset of rows
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "compaction must preserve the row multiset")
  }
}
