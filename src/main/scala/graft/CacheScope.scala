package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Scoped lifetime for pipeline-internal persists.
  *
  * Batch pipelines persist intermediates (e.g. the sessionized sounding
  * table feeding three consumers) and release them with the Spark session
  * — the right lifetime for a run-once job. A long-lived streaming loop
  * (foreachBatch over many days) re-enters the pipeline every micro-batch,
  * so session-lifetime caches accrete until LRU eviction starts thrashing
  * the store. This scope gives such loops per-batch lifetime WITHOUT
  * threading cache handles through every pipeline signature: pipelines
  * route persists through [[persist]], and a wrapper brackets each batch
  * in [[withScope]], which unpersists everything registered on that thread
  * when the body finishes (success or failure).
  *
  * Thread-local because a foreachBatch body — plan construction, persist
  * calls, sink action — runs synchronously on the micro-batch thread;
  * scopes nest (inner scope releases only its own persists). Outside any
  * scope, [[persist]] is exactly `df.persist(level)`: batch callers keep
  * session-lifetime caches with zero code change.
  */
object CacheScope {

  private val active = new ThreadLocal[java.util.ArrayDeque[DataFrame]]()

  /** Persist `df` at `level`, registering it with the innermost active
    * scope on this thread (no-op registration if none). */
  def persist(df: DataFrame, level: StorageLevel): DataFrame = {
    val out   = df.persist(level)
    val stack = active.get()
    if (stack != null) stack.push(out)
    out
  }

  /** Run `body`; unpersist (non-blocking) every [[persist]] registered
    * during it on this thread, even on failure. Returns `body`'s value. */
  def withScope[T](body: => T): T = {
    val prev = active.get()
    val mine = new java.util.ArrayDeque[DataFrame]()
    active.set(mine)
    try body
    finally {
      if (prev == null) active.remove() else active.set(prev)
      mine.forEach(df => df.unpersist(blocking = false))
    }
  }
}
