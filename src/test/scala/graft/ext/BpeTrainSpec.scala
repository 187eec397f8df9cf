package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** The production loop body over an explicit corpus (mirrors
    * TextAnalysis.bpeTrain, parameterized by a docs frame). */
  private def train(texts: Seq[String], rounds: Int): Seq[(String, String, Long)] = {
    var words = texts.toDF("text")
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(concat(lit("  "), regexp_replace(col("w"), "(.)", "$1  ")).as("s"),
        col("cnt"))
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    (1 to rounds).foreach { _ =>
      val t = split(trim(col("s")), " +")
      val top = words.select(col("cnt"), t.as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("cnt"), explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("a"),
            element_at(col("t"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b")).agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("a"), col("b")).limit(1).collect()
      if (top.nonEmpty) {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((a, b, c))
        words = words.select(
          replace(col("s"), lit(s" $a  $b "), lit(s" $a$b ")).as("s"), col("cnt"))
      }
    }
    out.toSeq
  }

  test("textbook corpus learns the expected first merges") {
    // Sennrich-style toy: 'lower lower lowest' — 'lo' then 'low' dominate
    val merges = train(Seq("lower lower low low low lowest"), 3)
    assert(merges.head._1 == "l" && merges.head._2 == "o",
      s"first merge must be (l,o): $merges")
    assert(merges(1)._1 == "lo" && merges(1)._2 == "w",
      s"second merge must be (lo,w): $merges")
    // counts are word-frequency-weighted: 6 words all start with 'low'
    assert(merges.head._3 == 6L)
  }

  test("overlapping runs merge leftmost non-overlapping") {
    // 'aaaa' -> pair (a,a) count 3 (occurrence count), merged as (aa)(aa)
    val merges = train(Seq("aaaa"), 2)
    assert(merges.head._1 == "a" && merges.head._2 == "a")
    // second round: the dict word is ' aa aa ' -> next merge is (aa,aa)
    assert(merges(1)._1 == "aa" && merges(1)._2 == "aa", s"$merges")
  }

  test("fixture training produces monotone-ish useful merges") {
    val rows = TextAnalysis.bpeTrain(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.length == TextAnalysis.BpeRounds)
    assert(rows.map(_._1).toSeq == (1L to TextAnalysis.BpeRounds))
    rows.foreach { case (_, a, b, c) =>
      assert(a.nonEmpty && b.nonEmpty && c > 0)
      assert(!a.contains(" ") && !b.contains(" "), "symbols never hold spaces")
    }
    // merged symbols compound over rounds: some later merge reuses an
    // earlier merge's output
    val products = rows.map { case (_, a, b, _) => a + b }.toSet
    assert(rows.exists { case (_, a, b, _) =>
      products.contains(a) || products.contains(b) },
      "no merge built on an earlier merge — loop not compounding")
  }
}
