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
  *
  * Tracking is scoped: [[scoped]] confines the persists made while
  * building one query to that query, so concurrent query construction in
  * one session cannot drop each other's caches. Callers outside any scope
  * (the sequential Verify/Bench harness) share a default scope — the
  * pre-scope behavior, unchanged.
  */
object Caches {
  /** One query's tracked persists. */
  final class Scope {
    private[Caches] val frames = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[DataFrame, java.lang.Boolean]())

    /** Unpersist every frame tracked by this scope; returns the count. */
    def release(): Int = {
      var n = 0
      val it = frames.iterator()
      while (it.hasNext) {
        val df = it.next()
        df.unpersist(blocking = false)
        owner.remove(df)
        it.remove()
        n += 1
      }
      n
    }

    def tracked: Int = frames.size()
  }

  private val default = new Scope
  private val active = new ThreadLocal[Scope]()
  // frame -> owning scope, so drop() works from any thread
  private val owner = new java.util.concurrent.ConcurrentHashMap[DataFrame, Scope]()

  private def current: Scope = Option(active.get()).getOrElse(default)

  /** Run `body` with a fresh scope installed on this thread; persists made
    * inside are released when it completes (the returned frame's plan
    * still recomputes from lineage if consumed later — callers that need
    * the caches alive should release manually via the scope). */
  def scoped[T](releaseAfter: Boolean = true)(body: => T): (T, Scope) = {
    val s = new Scope
    val prev = active.get()
    active.set(s)
    try {
      val r = body
      if (releaseAfter) s.release()
      (r, s)
    } finally {
      if (prev == null) active.remove() else active.set(prev)
    }
  }

  /** Persist `df` and track it in the current scope for a later
    * [[release]]. */
  def persist(df: DataFrame,
              level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    val s = current
    s.frames.add(df)
    owner.put(df, s)
    df
  }

  /** Unpersist `df` now and stop tracking it (for frames whose lifecycle
    * the operator manages itself, e.g. a shrinking loop frontier). A
    * frame never routed through [[persist]] is left alone. */
  def drop(df: DataFrame): Unit = {
    val s = owner.remove(df)
    if (s != null) {
      s.frames.remove(df)
      df.unpersist(blocking = false)
    }
  }

  /** Release the current scope (the default scope when none is active);
    * returns how many frames were unpersisted. */
  def release(): Int = current.release()

  /** Number of frames tracked by the current scope (observability/specs). */
  def tracked: Int = current.tracked
}
