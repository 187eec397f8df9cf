package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared hashing kernels, called from both interpreted eval and the
  * generated code (a static call keeps the expression inside whole-stage
  * codegen instead of falling back to interpretation). */
object Fingerprints {
  final val Base = 257L
  final val Mod = (1L << 61) - 1 // Mersenne prime 2^61-1

  private def mulmod(a: Long, b: Long): Long = {
    // 61-bit operands: split-multiply to stay inside 64-bit signed range
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product mod 2^61-1: (x mod 2^61) + (x >> 61)
    val part = (lo & Mod) + ((hi << 3) | (lo >>> 61))
    if (part >= Mod) part - Mod else part
  }

  /** Min-of-rolling-window polynomial hash: the winnowing-style document
    * fingerprint. Deterministic function of the char window content. */
  def minRollingHash(s: UTF8String, k: Int): Long = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0L
    val kk = math.min(k, n)
    // precompute Base^(kk-1) mod Mod
    var pow = 1L
    var i = 1
    while (i < kk) { pow = mulmod(pow, Base); i += 1 }
    var h = 0L
    i = 0
    while (i < kk) { h = (mulmod(h, Base) + str.charAt(i)) % Mod; i += 1 }
    var minH = h
    i = kk
    while (i < n) {
      h = (h + Mod - mulmod(str.charAt(i - kk), pow)) % Mod
      h = (mulmod(h, Base) + str.charAt(i)) % Mod
      if (h < minH) minH = h
      i += 1
    }
    minH
  }
}

/** Custom Catalyst expression: winnowing-style rolling-hash fingerprint
  * of a string, k-char windows. Whole-stage-codegen'd via a static call —
  * no UDF serialization, no interpreted fallback in the hot path.
  */
case class RollingFingerprint(child: Expression, k: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_fingerprint needs a string child, got ${child.dataType}")
  }

  override def nullSafeEval(v: Any): Any =
    Fingerprints.minRollingHash(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Fingerprints.minRollingHash($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprint {
  import org.apache.spark.sql.GraftBridge
  /** Column-API entry point (Spark 4 Columns wrap ColumnNodes, so the
    * classic bridge converts in both directions). */
  def rolling_fingerprint(c: Column, k: Int = 8): Column =
    GraftBridge.column(RollingFingerprint(GraftBridge.expression(c), k))
}
