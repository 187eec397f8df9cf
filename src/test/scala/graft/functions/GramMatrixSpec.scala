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

  test("overflow headroom: worst-case cell bound from (CovScale, Dim)") {
    // The kernel's exact-long claim rests on the worst-case triangle
    // cell N · CovScale² staying far inside Long.MaxValue at the
    // 100 TB design point (~1e10 vectors). Pin that bound in BigInt
    // so a CovScale bump (e.g. 1024 → 2^20 for finer quantization)
    // fails HERE instead of wrapping silently in production folds.
    val scale = graft.ext.Similarity.CovScale
    assert(scale == scale.toLong.toDouble && scale > 0,
      "CovScale must be a positive integer-valued scale")
    val designVectors = BigInt(10).pow(10)   // ~100 TB of embeddings
    val worstCell = designVectors * BigInt(scale.toLong).pow(2)
    val margin = BigInt(Long.MaxValue) / worstCell
    assert(margin >= 100,
      s"worst-case Gram cell $worstCell leaves only ${margin}x headroom " +
        s"under Long.MaxValue at $designVectors vectors — shrink CovScale " +
        s"or move the fold to DECIMAL before shipping")
    // the bound's premise: quantized components actually stay within
    // ±CovScale, i.e. the fixture's embeddings are unit-bounded
    import org.apache.spark.sql.functions._
    val maxQ = graft.Tables.load(spark, sf001, "embeddings")
      .select(array_max(transform(col("embedding"),
        e => abs(round(e.cast("double") * scale).cast("long")))).as("m"))
      .agg(max("m")).head().getLong(0)
    assert(maxQ <= scale.toLong,
      s"fixture component quantizes to $maxQ > $scale — the N·CovScale² " +
        s"bound no longer holds; re-derive it from the real component range")
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
