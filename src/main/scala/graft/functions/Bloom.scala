package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Codegen-native Bloom-filter membership probe.
  *
  * `DataFrameStatFunctions.bloomFilter` builds the sketch; this helper
  * ships it into the plan as a foldable binary literal probed by
  * Spark's own runtime-filter expression (`BloomFilterMightContain`,
  * the operator InjectRuntimeFilter plants) instead of a Scala UDF.
  * The probe therefore stays inside whole-stage codegen — the filter
  * deserializes once per codegen instance, not once per row, and the
  * predicate shows up in `explain` as `might_contain` rather than an
  * opaque black-box UDF Catalyst can't reason about.
  *
  * Layout compatibility: `BloomFilter.writeTo` / `readFrom` is the
  * exact round-trip `BloomFilterMightContain.deserialize` performs,
  * and `stat.bloomFilter` inserts integral keys via `putLong` — the
  * same `mightContainLong` path the expression evaluates — so probe
  * semantics are identical to `bf.mightContain(k)` in the old UDF.
  */
object Bloom {

  /** Serialize a built filter for embedding as a plan literal. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Membership predicate over a LongType column. The serialized
    * filter rides the plan (task-binary broadcast — ~1.2 bytes/key),
    * which is fine for the sketch even when the relation it summarizes
    * is far past broadcast-join size. */
  def mightContainLong(filterBytes: Array[Byte], value: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(filterBytes, BinaryType), GraftBridge.expression(value)))
}
