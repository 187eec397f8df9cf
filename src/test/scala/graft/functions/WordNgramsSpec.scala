package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The compiled word-n-gram kernel must be BIT-identical to the HOF
  * formulation it replaces on every guarded input (size >= n) — the
  * query twins' oracles were written against the HOF semantics, so any
  * divergence here is a silent correctness break across the whole gram
  * family, not a perf regression. */
class WordNgramsSpec extends SparkSpec {

  private def hof(n: Int) = {
    val w = col("w")
    transform(sequence(lit(1), size(w) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(d => element_at(w, i + d)): _*))
  }

  test("word_ngrams matches the HOF formulation on fixture text") {
    val docs = graft.Tables.load(spark, sf001, "documents")
      .select(split(lower(col("text")), "\\s+").as("w"))
    Seq(2, 3, 10).foreach { n =>
      val diff = docs.filter(size(col("w")) >= n)
        .select(WordNgrams.word_ngrams(col("w"), n).as("a"), hof(n).as("b"))
        .filter(col("a") =!= col("b"))
        .count()
      assert(diff == 0, s"kernel diverges from HOF at n=$n on $diff rows")
    }
  }

  test("word_ngrams edge semantics: short arrays, exact fit, unicode") {
    import spark.implicits._
    val df = Seq(
      Seq("a"), Seq("a", "b"), Seq("a", "b", "c"),
      Seq("héllo", "wörld", "ünïcode", "日本語"),
      Seq("", "x", "")).toDF("w")
    val got = df.select(WordNgrams.word_ngrams(col("w"), 3).as("g"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(
      Nil, // size < n -> EMPTY (HOF sites pre-filter, kernel is total)
      Nil,
      List("a b c"),
      List("héllo wörld ünïcode", "wörld ünïcode 日本語"),
      List(" x ")))
    // null array -> null out (UnaryExpression null propagation)
    val n = df.select(WordNgrams.word_ngrams(
      when(lit(false), col("w")), 2).as("g")).collect()
    assert(n.forall(_.isNullAt(0)))
  }

  test("word_ngrams and char_pairs are SQL-registered via GraftExtensions") {
    val r = spark.sql(
      "SELECT word_ngrams(array('a','b','c'), 2) AS g," +
        " word_ngrams(array('a','b','c')) AS g2," +
        " char_pairs('abc') AS p").collect().head
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    assert(r.getSeq[String](1) == Seq("a b", "b c"), "n defaults to 2")
    assert(r.getSeq[String](2) == Seq("ab", "bc"))
  }

  test("word_ngrams stays inside whole-stage codegen") {
    val docs = graft.Tables.load(spark, sf001, "documents")
      .select(explode(WordNgrams.word_ngrams(
        split(lower(col("text")), "\\s+"), 2)).as("ng"))
      .groupBy("ng").count()
    docs.collect()
    val plan = docs.queryExecution.executedPlan.toString
    // the AQE tree prints codegen membership as a `*(n)` stage marker
    // on each node; the Generate carrying wordngrams must have one
    assert("\\*\\(\\d+\\) Generate explode\\(wordngrams".r
        .findFirstIn(plan).isDefined,
      s"gram generation must not break codegen:\n$plan")
  }
}
