package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Vector kernels shared by interpreted eval and generated code. The
  * loop runs in array order (index ascending) so results are bit-equal
  * to the HOF (`zip_with`+`aggregate`) formulation AND to the DuckDB
  * oracle's sequential list functions. */
object VectorKernels {
  /** Dot product in index order (bit-equal to zip_with+aggregate). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Squared L2 distance in index order: acc starts at 0.0 and adds
    * (a_i−b_i)² ascending — bit-equal to the HOF
    * `aggregate(zip_with(a,b,(x,y)=>(x−y)*(x−y)), 0.0, _+_)` fold
    * (squares are non-negative, so the 0.0 seed can never flip a −0.0
    * sign). */
  def sqDist(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Cosine against a plain-array (literal) side — the identical loop
    * as the two-ArrayData kernel, for literal-codebook argmaxes that
    * would otherwise wrap each centroid per row. */
  def cosineLit(a: ArrayData, b: Array[Double]): Double = {
    val n = math.min(a.numElements(), b.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Position-weighted e6 digest (see [[PosE6Digest]]). */
  def posE6Digest(a: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      s += (i + 1L) * Math.round(a.getDouble(i) * 1e6)
      i += 1
    }
    s
  }

  /** The same single-pass kernel over plain arrays — for group-local
    * consumers (q270's greedy rerank) whose pairwise scores must match
    * the expression and the DuckDB oracle bit-for-bit. */
  def cosine(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i)
      val y = b(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Cosine similarity over two double arrays in one pass. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Native cosine similarity: one whole-stage-codegen'd pass over both
  * arrays. The `zip_with`/`aggregate` HOF version allocates an
  * intermediate array and interprets a lambda per element — measured
  * hot in the ANN queries; this is preference-ladder (b): a custom
  * Expression beats a UDF beats interpreted HOFs.
  *
  * NOTE: unlike the HOF formulation (3 passes: dot, |a|, |b|), the
  * kernel is single-pass; per-term double math is identical and
  * summation order per accumulator is identical, so values are
  * bit-equal.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim needs array<double> inputs, got " +
        s"${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Native dot product — same kernel family as CosineSimilarity; used by
  * the SRP sign-bit computation (24 dots per row against literal
  * hyperplanes). */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<double> inputs, got " +
        s"${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dot_product(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Native squared-L2 distance — the PQ nearest-codeword metric. The
  * HOF form (`aggregate(zip_with(...))`) interprets two lambdas per
  * element; with 16 codewords × M subspaces per row the encode pass
  * paid ~2M interpreted evals per 2k-row job (measured ~1s/job in the
  * q276 profile). Same ascending fold, bit-equal values. */
case class SqL2Distance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_l2_dist needs array<double> inputs, got " +
        s"${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.sqDist($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SqL2Distance {
  def sq_l2_dist(a: Column, b: Column): Column =
    GraftBridge.column(SqL2Distance(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Position-weighted e6 content digest: Σ (i+1)·round(x_i·1e6) as one
  * codegen'd pass — the index-artifact staleness fingerprint's
  * per-row term. A DIGEST, not an oracle-compared value: only its
  * sensitivity contract matters (value edits and component
  * permutations flip it; IndexArtifactSpec pins the rebuild), so the
  * kernel is free to use Math.round. The interpreted
  * transform+aggregate form it replaces cost ~240µs/row on the
  * fingerprint scan every serve query pays. */
case class PosE6Digest(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pos_e6_digest needs array<double> input, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    VectorKernels.posE6Digest(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorKernels.posE6Digest($a)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PosE6Digest {
  def pos_e6_digest(a: Column): Column =
    GraftBridge.column(PosE6Digest(GraftBridge.expression(a)))
}

/** Native nearest-centroid argmax over a LITERAL codebook: the cid of
  * the highest-cosine centroid, ties to the SMALLEST cid — exactly the
  * `-sort_array(array(struct(cos, -cid)...), desc)(0)("ncid")` idiom
  * it replaces, but one fused pass instead of K struct allocations +
  * an interpreted struct sort per row (the dominant per-row cost of
  * every assignment/Lloyd/encode stage at K=16).
  *
  * Ordering parity: doubles compare by Spark's SQL total order
  * (NaN greatest, NaN = NaN, -0.0 < 0.0 — `java.lang.Double.compare`
  * with the NaN-first tweak, i.e. `nanSafeCompareDoubles`), and a
  * STRICTLY-greater cosine replaces the incumbent while the scan runs
  * in ascending-cid codebook order — so ties keep the smallest cid,
  * bit-identical to the struct-sort form for every input including
  * NaN cosines (zero vectors) and ±0.0 knife-edges. */
case class NearestCosineCentroid(child: Expression,
    cids: Seq[Long], cents: Seq[Seq[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cos_centroid needs array<double> input, got $t")
  }

  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val centArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  /** NaN greatest, NaN == NaN, else Double.compare (Spark's
    * nanSafeCompareDoubles). */
  private def nanSafeGt(x: Double, y: Double): Boolean = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if (xn && yn) false
    else if (xn) true
    else if (yn) false
    else java.lang.Double.compare(x, y) > 0
  }

  def evalOne(v: ArrayData): Long = {
    var bestCid = cidArr(0)
    var bestCos = VectorKernels.cosineLit(v, centArr(0))
    var k = 1
    while (k < centArr.length) {
      val c = VectorKernels.cosineLit(v, centArr(k))
      if (nanSafeGt(c, bestCos)) { bestCos = c; bestCid = cidArr(k) }
      k += 1
    }
    bestCid
  }

  override def nullSafeEval(a: Any): Any = evalOne(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearest", this,
      classOf[NearestCosineCentroid].getName)
    defineCodeGen(ctx, ev, a => s"$ref.evalOne($a)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NearestCosineCentroid {
  def nearest_cos_centroid(v: Column, code: Seq[(Long, Seq[Double])]): Column =
    GraftBridge.column(NearestCosineCentroid(GraftBridge.expression(v),
      code.map(_._1), code.map(_._2)))
}
