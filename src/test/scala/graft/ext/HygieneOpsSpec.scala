package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for IQR outlier gating (q77), embedding hygiene (q78), and
  * the source duplication matrix (q79). */
class HygieneOpsSpec extends SparkSpec {
  import spark.implicits._

  test("iqr gate flags a planted outlier and nothing else when tight") {
    // 99 values in [0,1), one at 1000: fences must catch exactly it
    val ev = ((0 until 99).map(i => ("click", i / 100.0)) :+ ("click", 1000.0))
      .toDF("event_type", "value")
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("cents"))
    val b = ev.groupBy("event_type")
      .agg(percentile(col("cents"), array(lit(0.25), lit(0.75))).as("q"))
      .select(col("q")(0).as("q1"), col("q")(1).as("q3")).collect().head
    val (q1, q3) = (b.getDouble(0), b.getDouble(1))
    val hi = q3 + Events.OutlierWhisker * (q3 - q1)
    val n = ev.filter(col("cents") > hi).count()
    assert(n == 1L, s"fences [$q1,$q3] hi=$hi must flag exactly the plant")
    // fixture: bounds ordered, counts consistent
    val fix = Events.valueOutliers(spark, sf001).collect()
    assert(fix.nonEmpty)
    fix.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3), "q1 <= q3")
      assert(r.getLong(4) + r.getLong(5) <= r.getLong(1))
    }
  }

  test("embedding stats: fixture dims are uniform, norms positive") {
    val rows = Similarity.embeddingStats(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) == r.getInt(3), "ragged dims in fixture")
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= r.getDouble(5))
      assert(r.getDouble(6) >= r.getDouble(4) && r.getDouble(6) <= r.getDouble(5),
        "mean norm inside [min,max]")
      assert(r.getLong(7) == 0L, "fixture has no degenerate vectors")
    }
    // total vectors conserved across labels
    assert(rows.map(_.getLong(1)).sum ==
      graft.Tables.load(spark, sf001, "embeddings").count())
  }

  test("source dup matrix is upper-triangular and conserves pairs") {
    val nPairs = Dedup.ngramJaccardPairs(spark, sf001).count()
    val m = Dedup.sourceDupMatrix(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    m.foreach { case (x, y, _) => assert(x <= y, s"($x,$y) not ordered") }
    assert(m.map(_._3).sum == nPairs, "every pair lands in one cell")
  }

  test("ann recall: one row per query, bounded, consistent with hits") {
    val rows = Similarity.annRecall(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == Similarity.NQueries)
    rows.foreach { case (q, hits, rec) =>
      assert(hits >= 0 && hits <= Similarity.TopK, s"query $q hits $hits")
      assert(math.abs(rec - hits.toDouble / Similarity.TopK) < 1e-15)
    }
    // the LSH index must be doing SOMETHING: nonzero recall overall.
    // (Absolute recall at sf0.001 is genuinely low — ~0.16 with this
    // 4-table/6-plane geometry over 64-dim vectors — which is exactly
    // the kind of fact this operator exists to surface.)
    val avg = rows.map(_._3).sum / rows.length
    assert(avg > 0.0, s"LSH found no true neighbors at all: $avg")
  }
}
