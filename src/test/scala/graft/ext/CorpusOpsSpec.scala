package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Specs for the corpus-assembly operators: sequence packing (q72),
  * unigram-LM scoring (q73), and cross-doc boilerplate (q74). */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("two-phase pack offsets equal the naive global-window cumsum") {
    val docs = graft.Tables.load(spark, sf001, "documents")
      .selectExpr("doc_id",
        "CAST(size(split(text, '\\\\s+')) AS BIGINT) AS n_tokens")
    val naive = docs.withColumn("start_off",
        coalesce(sum("n_tokens").over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val twoPhase = Sampling.packOffsets(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(twoPhase.length == naive.size)
    twoPhase.foreach { case (id, off) =>
      assert(off == naive(id), s"doc $id: two-phase $off vs naive ${naive(id)}")
    }
  }

  test("sequence packing: seq ranges tile the stream without gaps") {
    val rows = Sampling.sequencePacking(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    // offsets are contiguous: each doc starts where the previous ended
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._3 == a._3 + a._2,
        s"doc ${b._1} offset ${b._3} != ${a._3} + ${a._2}")
      case _ =>
    }
    rows.foreach { case (id, n, off, first, last, nseqs) =>
      assert(first == off / Sampling.SeqLen)
      assert(last == (off + n - 1) / Sampling.SeqLen)
      assert(nseqs == last - first + 1, s"doc $id n_seqs")
      // a doc can span at most ceil(n/SeqLen)+1 sequences
      assert(nseqs <= n / Sampling.SeqLen + 2)
    }
  }

  test("lm score: repeated common text scores below rare-token text") {
    // corpus where 'the cat sat' dominates; rare tokens are surprising
    val docs = (Seq.fill(20)("the cat sat").zipWithIndex.map {
      case (t, i) => (i.toLong, t)
    } :+ (99L, "zyx wvu tsr")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("documents_lm")
    val tf = docs.select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).cast("double").as("c"))
    val model = tf.groupBy("tok").agg(sum("c").as("gc"))
    val total = model.agg(sum("gc").as("t"))
    val scored = tf.join(broadcast(model), "tok")
      .groupBy("doc_id")
      .agg(sum("c").as("n"), sum(col("c") * log2(col("gc"))).as("sgc"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        round(log2(col("t")) - col("sgc") / col("n"), 6).as("bpt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(0L) < scored(99L),
      s"common text ${scored(0L)} must beat rare ${scored(99L)}")
    // fixture run: finite, positive, one row per doc
    val fix = TextAnalysis.lmScore(spark, sf001).collect()
    assert(fix.length ==
      graft.Tables.load(spark, sf001, "documents").count())
    fix.foreach(r => assert(r.getDouble(2) > 0 && !r.getDouble(2).isNaN))
  }

  test("boilerplate: identical docs hit fraction 1, unique docs 0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val grams = docs.select(col("doc_id"),
      explode(array_distinct(transform(
        sequence(lit(1), size(split(lower(col("text")), "\\s+")) - 4),
        i => concat_ws(" ", (0 until 5).map(o =>
          element_at(split(lower(col("text")), "\\s+"), i + o)): _*))))
        .as("ng"))
    val dfreq = grams.groupBy("ng").agg(count(lit(1)).as("ndocs"))
    val out = grams.join(dfreq, "ng").groupBy("doc_id")
      .agg((sum(when(col("ndocs") > 1, 1.0).otherwise(0.0)) /
        count(lit(1))).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0 && out(2L) == 1.0 && out(3L) == 0.0)
    // fixture: fractions well-formed, short docs absent on both sides
    val fix = TextAnalysis.boilerplateNgrams(spark, sf001).collect()
    fix.foreach { r =>
      val (n, b, f) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(b <= n && f >= 0.0 && f <= 1.0)
    }
  }

  test("independence table: marginals consistent, residuals centered") {
    val rows = TextAnalysis.langSourceIndependence(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    val grand = graft.Tables.load(spark, sf001, "documents").count()
    // cell counts sum to the grand total; marginals match recounts
    assert(rows.map(_._3).sum == grand)
    rows.groupBy(_._1).foreach { case (lang, cs) =>
      assert(cs.map(_._3).sum == cs.head._4, s"row_total wrong for $lang")
    }
    rows.groupBy(_._2).foreach { case (src, cs) =>
      assert(cs.map(_._3).sum == cs.head._5, s"col_total wrong for $src")
    }
    rows.foreach { case (l, sr, n, rt, ct, e, resid) =>
      assert(math.abs(e - rt.toDouble * ct / grand) < 1e-9)
      assert(math.abs(resid - (n - e) / math.sqrt(e)) < 1e-9, s"($l,$sr)")
    }
    // expected mass never exceeds the grand total, and equals it only
    // when every (lang, source) combination is observed — the operator
    // reports OBSERVED cells (structural zeros are reconstructible
    // from the emitted marginals)
    assert(rows.map(_._6).sum <= grand + 1e-6)
  }
}
