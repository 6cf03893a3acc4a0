package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for operator-internal persisted frames.
  *
  * Iterative operators (kNN rounds, tile pyramids, dedup signature
  * pipelines) persist intermediates that the RETURNED plan still
  * references — correct, but in a long-lived session those cached
  * partitions accumulate across queries. Operators route such persists
  * through [[persist]]; the harness (Verify/Bench, or any caller) calls
  * [[release]] once the query's result is materialized. Releasing early
  * is safe: Spark recomputes an unpersisted frame from lineage.
  */
object Caches {
  private val reg = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[DataFrame, java.lang.Boolean]())

  /** Persist `df` and track it for a later [[release]]. */
  def persist(df: DataFrame,
              level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    reg.add(df)
    df
  }

  /** Unpersist `df` now and stop tracking it (for frames whose lifecycle
    * the operator manages itself, e.g. a shrinking loop frontier). */
  def drop(df: DataFrame): Unit = {
    reg.remove(df)
    df.unpersist(blocking = false)
  }

  /** Unpersist every tracked frame; returns how many were released. */
  def release(): Int = {
    var n = 0
    val it = reg.iterator()
    while (it.hasNext) {
      it.next().unpersist(blocking = false)
      it.remove()
      n += 1
    }
    n
  }

  /** Number of currently tracked frames (observability/specs). */
  def tracked: Int = reg.size()
}
