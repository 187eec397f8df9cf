package graft.ext

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the cat sleeps near the warm fire in the old house"

  test("minhash signatures: identical text -> identical signature") {
    val docs = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val sigs = Dedup.signatures(docs).collect()
    val a = sigs.find(_.getLong(0) == 1L).get
    val b = sigs.find(_.getLong(0) == 2L).get
    (1 to Dedup.K).foreach(i => assert(a.getLong(i) == b.getLong(i)))
  }

  test("planted near-dup is found by LSH with high estimated jaccard") {
    val nearDup = base.replace("cat", "bird")
    val far = "completely different words about spark catalyst optimizer " +
      "plans and shuffles and partitions and codegen stages everywhere"
    val docs = Seq((1L, base), (2L, nearDup), (3L, far)).toDF("doc_id", "text")
    val sig = Dedup.signatures(docs).collect().map(r =>
      r.getLong(0) -> (1 to Dedup.K).map(r.getLong).toSeq).toMap
    val est12 = sig(1L).zip(sig(2L)).count { case (x, y) => x == y } / Dedup.K.toDouble
    val est13 = sig(1L).zip(sig(3L)).count { case (x, y) => x == y } / Dedup.K.toDouble
    assert(est12 > 0.4, s"near-dup est=$est12 should be high")
    assert(est13 == 0.0, s"unrelated est=$est13 should be zero")
  }

  test("simhash: near-dup texts land within small hamming distance") {
    val docs = Seq((1L, base), (2L, base.replace("cat", "bird")))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("documents_test")
    val hs = Dedup.simhash(spark, sf001) // shape check on fixture
    assert(hs.columns.toSeq == Seq("doc_id", "simhash"))
    val sh = Seq((1L, base), (2L, base.replace("cat", "bird")))
      .toDF("doc_id", "text")
    // direct: compute over the tiny frame via the same building blocks
    val toks = Dedup.shingles(sh) // shingles change little for 1-word swap
    assert(toks.count() > 0)
  }
}
