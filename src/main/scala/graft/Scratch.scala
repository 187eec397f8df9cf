package graft

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped scratch-cache registry.
  *
  * Query builders sometimes must `.cache()` an intermediate that two
  * branches of ONE plan consume (e.g. a term-frequency rollup feeding
  * both a doc-frequency join and a final argmin). Because the builder
  * returns a LAZY frame, it cannot unpersist before returning — the
  * cache only fills during the harness's later action. Left alone,
  * a 100+-query Verify/Bench run accumulates all those block-manager
  * entries in executor storage memory.
  *
  * The contract: builders register every scratch cache here; the
  * harness mains (graft.Verify, graft.Bench) call [[drain]] after each
  * query's final action. Deliberately NOT drained: the memoized
  * session-lifetime artifacts (Dedup's verified pair checkpoints),
  * which are reused across queries by design.
  */
object Scratch {
  // keyed by the session INSTANCE (SparkSession uses identity equality)
  private val pool = TrieMap.empty[SparkSession, List[DataFrame]]

  /** Register a scratch-cached frame for end-of-query cleanup. */
  def register(df: DataFrame): DataFrame = {
    pool.updateWith(df.sparkSession)(l => Some(df :: l.getOrElse(Nil)))
    df
  }

  /** Unpersist (non-blocking) every scratch cache this session
    * registered since the last drain. */
  def drain(spark: SparkSession): Unit =
    pool.remove(spark).foreach(_.foreach(_.unpersist(false)))

  /** Number of currently-registered scratch frames (test hook). */
  def pending(spark: SparkSession): Int =
    pool.get(spark).map(_.size).getOrElse(0)
}
