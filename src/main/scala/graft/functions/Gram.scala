package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Gram-matrix aggregator: folds quantized vectors into ONE
  * packed long buffer per partition — the upper triangle of Σ x·xᵀ
  * (row-major, k enumerates (i, j≥i) in ascending order), then the D
  * per-dimension sums Σ xᵢ, then the vector count — so a covariance
  * over D dims needs NO per-vector explode and NO (i, j)-keyed
  * shuffle: the map side reduces everything into D(D+1)/2 + D + 1
  * longs, and merge is element-wise addition (associative, one tiny
  * buffer per partition crosses the wire). This replaced q210's
  * exploded-triangle formulation, whose shuffle grew with
  * vectors × D²/2 rows (PLANS.md round 7).
  *
  * Arithmetic is EXACT long adds of quantized products (the caller
  * quantizes, so both engines fold identical integers); at 1e10
  * vectors × (1024-scaled unit components)² the triangle cells stay
  * ~1e16 ≪ Long.MaxValue. */
class GramMatrix(dim: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  require(dim >= 1)
  private val tri = dim * (dim + 1) / 2

  override def zero: Array[Long] = new Array[Long](tri + dim + 1)

  override def reduce(b: Array[Long], qv: Seq[Long]): Array[Long] = {
    val v = qv.toArray
    require(v.length == dim, s"expected $dim dims, got ${v.length}")
    var k = 0
    var i = 0
    while (i < dim) {
      val xi = v(i)
      var j = i
      while (j < dim) { b(k) += xi * v(j); k += 1; j += 1 }
      b(tri + i) += xi
      i += 1
    }
    b(tri + dim) += 1L
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < a.length) { a(k) += b(k); k += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
