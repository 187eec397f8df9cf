package graft.functions

import graft.SparkSpec

/** The packed Gram buffer must agree with the brute-force triangle on
  * hand data — the q210 oracle was written against the exploded
  * formulation, so the kernel's packing order (i asc, j >= i asc),
  * sums block, and count slot are load-bearing. */
class GramMatrixSpec extends SparkSpec {

  test("packed layout matches brute force and merges associatively") {
    val dim = 3
    val agg = new GramMatrix(dim)
    val vs = Seq(Seq(1L, 2L, 3L), Seq(-4L, 0L, 5L), Seq(7L, 7L, 7L))
    val folded = vs.foldLeft(agg.zero)(agg.reduce)
    // brute force: triangle k=(0,0)(0,1)(0,2)(1,1)(1,2)(2,2), sums, n
    def brute(rows: Seq[Seq[Long]]): Seq[Long] = {
      val t = for { i <- 0 until dim; j <- i until dim }
        yield rows.map(v => v(i) * v(j)).sum
      val s = (0 until dim).map(i => rows.map(_(i)).sum)
      t ++ s ++ Seq(rows.size.toLong)
    }
    assert(folded.toSeq == brute(vs))
    // merge(prefix, suffix) == fold(all): partials combine exactly
    val a = vs.take(1).foldLeft(agg.zero)(agg.reduce)
    val b = vs.drop(1).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(a, b).toSeq == brute(vs))
    assert(agg.zero.toSeq == Seq.fill(dim * (dim + 1) / 2 + dim + 1)(0L))
  }

  test("q210 through the aggregator equals the exploded brute force") {
    import org.apache.spark.sql.functions._
    val got = graft.ext.Similarity.embeddingCovariance(spark, sf001)
    // brute-force twin over the same quantization, exploded pairs
    val q = graft.Tables.load(spark, sf001, "embeddings")
      .select(transform(col("embedding"),
        e => round(e.cast("double") * graft.ext.Similarity.CovScale)
          .cast("long")).as("qv"))
    val brute = q
      .select(posexplode(col("qv")).as(Seq("i", "x")), col("qv"))
      .select(col("i").cast("long").as("i"), col("x"),
        posexplode(col("qv")).as(Seq("j", "y")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j").cast("long").as("j"))
      .agg(sum(col("x") * col("y")).as("sxy"))
    val diff = got.select("i", "j", "sxy").as("a")
      .join(brute.as("b"), Seq("i", "j"))
      .filter(col("a.sxy") =!= col("b.sxy")).count()
    assert(diff == 0, "packed co-moments must equal the exploded ones")
    assert(got.count() == 64L * 65 / 2)
  }
}
