package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md scale notes): when one
  * join key dominates (the classic hot-customer / hot-band problem), a
  * plain hash join sends the whole hot key to one task. Salting splits
  * each key into `salts` sub-keys: the large side gets a per-row salt,
  * the small side is replicated across all salts, and the join runs on
  * (key, salt) — the hot key now spreads over `salts` tasks.
  *
  * AQE's skew-join handling covers sort-merge joins automatically; this
  * utility is for the cases AQE can't split (e.g. aggregation-input
  * skew or pre-4.x compatibility) and as the explicit, plannable form.
  */
object Skew {

  /** Inner equi-join `large ⋈ small` on `key`, salted `salts` ways.
    * Result set is identical to the unsalted join (verified in spec);
    * the small side grows ×salts, so keep salts modest (8-32). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLarge = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
