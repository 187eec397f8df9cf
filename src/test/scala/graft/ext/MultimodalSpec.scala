package graft.ext

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("binary plumbing: frames, sizes, and stub features are consistent") {
    val res = Multimodal.features(spark, sf001).collect()
    assert(res.length == 500)
    res.foreach { r =>
      val nBytes = r.getAs[Long]("n_bytes")
      val nFrames = r.getAs[Int]("n_frames")
      assert(nFrames == math.ceil(nBytes / 64.0).toInt,
        s"frame count must be ceil(bytes/${Multimodal.StubDecoder.FrameSize})")
      val mean = r.getAs[Double]("mean_byte")
      assert(mean >= 0 && mean <= 255)
    }
  }

  test("stub decode is deterministic across runs") {
    val a = Multimodal.features(spark, sf001).collect().map(_.toString).toSeq
    val b = Multimodal.features(spark, sf001).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("metadata predicates work without touching the blob") {
    val df = Multimodal.assets(spark, sf001)
      .filter(org.apache.spark.sql.functions.col("mime").endsWith("src1"))
    assert(df.count() > 0)
  }
}
