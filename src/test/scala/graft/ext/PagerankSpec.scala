package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PagerankSpec extends SparkSpec {
  import spark.implicits._

  /** Run the production loop body over an explicit pair list. */
  private def pagerank(pairsSeq: Seq[(Long, Long)]): Map[Long, Double] = {
    val pairs = pairsSeq.toDF("doc_a", "doc_b")
    val edges = pairs
      .union(pairs.select(col("doc_b"), col("doc_a"))).toDF("src", "dst")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val n = deg.count()
    var pr = deg.select(col("src").as("id"), lit(1.0 / n).as("pr"))
    (1 to Dedup.PageRankIters).foreach { _ =>
      val contribs = edges
        .join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"), (col("pr") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("in_pr"))
      pr = pr.select(col("id")).join(contribs, Seq("id"), "left")
        .select(col("id"), (lit((1 - Dedup.Damping) / n) +
          lit(Dedup.Damping) * coalesce(col("in_pr"), lit(0.0))).as("pr"))
    }
    pr.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("star graph: the hub outranks every leaf") {
    val star = (2L to 6L).map(l => (1L, l))
    val pr = pagerank(star)
    val hub = pr(1L)
    (2L to 6L).foreach(l => assert(hub > pr(l), s"hub $hub <= leaf ${pr(l)}"))
    // probability mass is conserved (undirected graph, no dangling nodes)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, s"mass ${pr.values.sum}")
  }

  test("symmetric pair graph: equal ranks, mass conserved") {
    val pr = pagerank(Seq((10L, 20L), (30L, 40L)))
    assert(math.abs(pr(10L) - pr(20L)) < 1e-15)
    assert(math.abs(pr(10L) - pr(30L)) < 1e-15)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
  }

  test("fixture pagerank: every node ranked, positive, mass conserved") {
    val rows = Dedup.dupPagerank(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(rows.nonEmpty)
    rows.foreach { case (id, p) => assert(p > 0, s"doc $id rank $p") }
    // rounded to 8dp, so conservation holds to ~n*5e-9
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-5)
  }
}
