package graft
// Temporary optimization-round experiment harness (not part of the
// query surface; removed before close).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val e0 = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("tv"))
    val e = e0.repartition(32).localCheckpoint()
    // literal codebook like ivfCodebook round-1
    val seed = e.orderBy("vec_id").limit(16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).sortBy(_._1)
    def scores(v: org.apache.spark.sql.Column) =
      array(seed.toSeq.map { case (cid, cv) =>
        struct(graft.functions.CosineSimilarity.cosine_sim(v, typedlit(cv))
          .as("cos"), lit(-cid).as("ncid"))
      }: _*)
    val cidExpr = -sort_array(scores(col("tv")), asc = false)(0)("ncid")

    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    // A: current shape — cid + posexplode in ONE select
    time("A cid+posexplode one select") {
      e.select(cidExpr.as("cid"), posexplode(col("tv")).as(Seq("i", "x")))
        .groupBy("cid", "i")
        .agg(sum(round(col("x") * 1e6, 0).cast("long")), count(lit(1)))
        .collect()
    }
    // B: staged — cid in its own projection, then explode
    time("B staged cid then posexplode") {
      e.select(cidExpr.as("cid"), col("tv"))
        .select(col("cid"), posexplode(col("tv")).as(Seq("i", "x")))
        .groupBy("cid", "i")
        .agg(sum(round(col("x") * 1e6, 0).cast("long")), count(lit(1)))
        .collect()
    }
    // C: cid only, no explode (assignment cost alone)
    time("C cid only") {
      e.select(cidExpr.as("cid")).groupBy("cid").count().collect()
    }
    // D: explode only
    time("D posexplode only") {
      e.select(posexplode(col("tv")).as(Seq("i", "x")))
        .groupBy("i").agg(sum(round(col("x") * 1e6, 0).cast("long")))
        .collect()
    }
    // E: sort_array cost vs aggregate-free argmax
    time("E scores array only") {
      e.select(scores(col("tv")).as("s")).selectExpr("s[0].cos as c")
        .agg(sum("c")).collect()
    }
    // F: cid only over RAW SCAN (no repartition, no checkpoint)
    time("F cid only, raw scan") {
      e0.select(cidExpr.as("cid")).groupBy("cid").count().collect()
    }
    // G: cid only over repartition, NO checkpoint
    time("G cid only, repartition no ckpt") {
      e0.repartition(32).select(cidExpr.as("cid"))
        .groupBy("cid").count().collect()
    }
    // H: full stats staged over raw scan
    time("H staged stats, raw scan") {
      e0.select(cidExpr.as("cid"), col("tv"))
        .select(col("cid"), posexplode(col("tv")).as(Seq("i", "x")))
        .groupBy("cid", "i")
        .agg(sum(round(col("x") * 1e6, 0).cast("long")), count(lit(1)))
        .collect()
    }
    // q42-like rollup over lineitem: raw vs widened
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    def rollup(d: org.apache.spark.sql.DataFrame) =
      d.select(col("l_returnflag"), col("l_linestatus"),
          col("l_extendedprice").cast("decimal(18,2)").as("m"),
          col("l_quantity"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(col("m")), sum(col("l_quantity")), count(lit(1)))
    time("I rollup raw") { rollup(li).collect() }
    time("J rollup widened") { rollup(li.repartition(32)).collect() }
    val doc = spark.read.parquet(s"$sf/documents.parquet")
    def scrubish(d: org.apache.spark.sql.DataFrame) =
      d.select(col("doc_id"),
        length(regexp_replace(lower(col("text")), "[0-9]+", "#")).as("l"))
       .agg(sum("l"))
    time("K scrub-ish raw") { scrubish(doc).collect() }
    time("L scrub-ish widened") { scrubish(doc.repartition(32)).collect() }
    println(e.select(cidExpr.as("cid"),
      posexplode(col("tv")).as(Seq("i", "x"))).queryExecution.executedPlan
      .toString.take(2500))
    spark.stop()
  }
}
