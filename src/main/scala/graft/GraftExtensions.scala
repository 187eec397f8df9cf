package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{CharPairs, CosineSimilarity, DotProduct, RollingFingerprint, SortedIntersectSize, WordNgrams}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions, so SQL-text users get them too:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT rolling_fingerprint(text, 8) FROM documents
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("rolling_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName,
        "rolling_fingerprint"),
      (exprs: Seq[Expression]) => {
        val k = exprs.lift(1) match {
          case Some(Literal(v: Int, _)) => v
          case None => 8
          case other => throw new IllegalArgumentException(
            s"rolling_fingerprint(str[, k]): k must be an int literal, got $other")
        }
        RollingFingerprint(exprs.head, k)
      }))
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName,
        "sorted_intersect_size"),
      (exprs: Seq[Expression]) => SortedIntersectSize(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("char_pairs"),
      new ExpressionInfo(classOf[CharPairs].getName, "char_pairs"),
      (exprs: Seq[Expression]) => CharPairs(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (exprs: Seq[Expression]) => {
        val n = exprs.lift(1) match {
          case Some(Literal(v: Int, _)) => v
          case None => 2
          case other => throw new IllegalArgumentException(
            s"word_ngrams(arr[, n]): n must be an int literal, got $other")
        }
        WordNgrams(exprs.head, n)
      }))
  }
}
