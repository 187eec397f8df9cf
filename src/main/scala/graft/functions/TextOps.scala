package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-level text kernels, static so generated code can call them
  * and the expressions stay inside whole-stage codegen. */
object TextOps {
  /** All adjacent CODE-POINT pairs of `s` as 2-character strings,
    * skipping pairs that touch a space — the q54 BPE-candidate
    * primitive, one compiled pass per row. The HOF formulation
    * (`transform(sequence(...), i => substr(text, i, 2))`) evaluates an
    * interpreted lambda per character; this kernel replaced it after an
    * A/B at sf0.1 (see PLANS.md round 6). Pairs are cut on code points
    * (surrogate-safe), matching SQL `substr` semantics. */
  def charPairs(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    val out = new java.util.ArrayList[UTF8String]
    var i = 0
    while (i < n) {
      val cp1 = str.codePointAt(i)
      val l1 = Character.charCount(cp1)
      if (i + l1 < n) {
        val cp2 = str.codePointAt(i + l1)
        if (cp1 != ' ' && cp2 != ' ')
          out.add(UTF8String.fromString(
            str.substring(i, i + l1 + Character.charCount(cp2))))
      }
      i += l1
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size())))
  }

  private val Space = UTF8String.fromString(" ")
  private val EmptyArr = new GenericArrayData(Array.empty[UTF8String])

  /** All space-joined word n-grams of `arr` (a pre-split token array),
    * one compiled pass per row — the gram primitive behind the dedup
    * docsets, repetition, decontamination, LM, and novelty pipelines.
    * Replaces the interpreted-per-element HOF formulation
    * (`transform(sequence(1, size-n+1), i => concat_ws(" ", ...))` —
    * the same class the q54 A/B measured ~5× slower, PLANS.md round
    * 6). Joining uses [[UTF8String.concatWs]], so null elements skip
    * exactly as `concat_ws` does; fewer than n words yield an EMPTY
    * array (the HOF sites all pre-filter `size >= n`, where the two
    * semantics agree). */
  def wordNgrams(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    val m = sz - n + 1
    if (m <= 0) return EmptyArr
    val words = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) { words(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[UTF8String](m)
    i = 0
    while (i < m) {
      out(i) = UTF8String.concatWs(Space,
        java.util.Arrays.copyOfRange(words, i, i + n): _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Custom Catalyst expression: the space-free adjacent character pairs
  * of a string (see [[TextOps.charPairs]]). */
case class CharPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TextOps.charPairs(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.charPairs($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharPairs {
  /** Column-API entry point. */
  def char_pairs(c: Column): Column =
    GraftBridge.column(CharPairs(GraftBridge.expression(c)))
}

/** Custom Catalyst expression: space-joined word n-grams of a token
  * array (see [[TextOps.wordNgrams]]); `n` is a plan-time constant, so
  * the generated call site is a direct static invoke. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TextOps.wordNgrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.wordNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {
  /** Column-API entry point: `word_ngrams(split(text, "\\s+"), 3)`. */
  def word_ngrams(c: Column, n: Int): Column =
    GraftBridge.column(WordNgrams(GraftBridge.expression(c), n))
}
