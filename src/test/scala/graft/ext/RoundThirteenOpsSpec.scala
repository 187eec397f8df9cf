package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 operator invariants the row-hash oracle can't express:
  * the q283 retrain-trigger policy must FIRE on a drifted ingest
  * batch and stay quiet on same-distribution traffic (the q276
  * drifted-fixture discipline applied to the decision layer). */
class RoundThirteenOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dim = Similarity.Dim

  /** The RoundElevenOpsSpec q276 fixtures: batches 0-6 on a busy
    * axis-0-dominant distribution; the drifted variant's batch 7 is a
    * new axis-1 region with four well-separated subclusters the
    * frozen books never saw. */
  private def standingRows(n: Int) = (0 until n).map { i =>
    val v = Array.tabulate(dim)(d =>
      ((((i * 31 + d * 17) % 19) - 9) / 9.0).toFloat)
    v(0) = v(0) * 4.0f
    (i.toLong, v.toSeq)
  }

  private def driftedDf: DataFrame = {
    val arrived = (280 until 320).map { i =>
      val v = Array.tabulate(dim)(d =>
        (0.05 * ((((i * 7 + d * 3) % 11) - 5) / 5.0)).toFloat)
      v(1) = 50.0f
      v(2) = if (i % 2 == 0) 20.0f else -20.0f
      v(3) = if ((i / 2) % 2 == 0) 20.0f else -20.0f
      (i.toLong, v.toSeq)
    }
    (standingRows(280) ++ arrived).toDF("vec_id", "embedding")
  }

  private def collectPolicy(df: DataFrame) =
    df.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getBoolean(9),
        if (r.isNullAt(10)) None else Some(r.getLong(10)))
    }

  test("q283: the retrain trigger fires on the drifted batch and " +
      "records it as first_trigger_batch") {
    val rows = collectPolicy(Similarity.retrainPolicyOn(spark, driftedDf))
    assert(rows.length == Similarity.DriftBatches,
      s"one decision row per ingest batch: ${rows.length}")
    rows.foreach { case (batch, nQ, gtF, hitsF, fPpm, gtR, hitsR, rPpm,
        gap, retrain, _) =>
      assert(batch >= 0 && batch < Similarity.DriftBatches)
      assert(nQ == Similarity.PolicyQueries.toLong)
      assert(hitsF >= 0 && hitsF <= gtF, s"frozen hits out of range")
      assert(hitsR >= 0 && hitsR <= gtR, s"rebuilt hits out of range")
      assert(fPpm == (if (gtF == 0) 0L else hitsF * 1000000L / gtF))
      assert(rPpm == (if (gtR == 0) 0L else hitsR * 1000000L / gtR))
      assert(gap == rPpm - fPpm, "gap must be the recorded difference")
      assert(retrain == (gap > Similarity.RetrainGapPpm),
        "retrain must be exactly the declared threshold test")
    }
    val drifted = rows.find(_._1 == Similarity.DriftBatches - 1).get
    assert(drifted._10,
      s"the drifted arrival batch must trip the retrain threshold: " +
        s"gap=${drifted._9} ppm vs ${Similarity.RetrainGapPpm}")
    val firstTriggered = rows.filter(_._10).map(_._1).min
    rows.foreach { r =>
      assert(r._11.contains(firstTriggered),
        s"every row must carry the first triggered batch: $r")
    }
  }

  test("q283: same-distribution traffic never trips the trigger " +
      "(NULL first_trigger_batch is the don't-retrain answer)") {
    val same = standingRows(320).toDF("vec_id", "embedding")
    val rows = collectPolicy(Similarity.retrainPolicyOn(spark, same))
    assert(rows.length == Similarity.DriftBatches)
    rows.foreach { r =>
      assert(!r._10,
        s"same-distribution batch must not call for a retrain: $r")
      assert(r._11.isEmpty,
        s"no trigger -> first_trigger_batch must be NULL: $r")
    }
  }
}
