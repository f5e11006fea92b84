package graft.core

import org.apache.spark.sql.Dataset

/** Tracks every DataFrame the library persists mid-operator (signature
  * tables, LSH classes, normalized vectors) so long-lived sessions can
  * release them deterministically instead of waiting for LRU eviction.
  *
  * Contract: operators call [[persisted]] instead of bare `.persist()`;
  * the session owner (Bench/Verify between queries, a service between
  * requests) calls [[unpersistAll]] once the operator's result has been
  * materialized. Unpersisting is safe at any point — Spark recomputes from
  * lineage if a block is still needed — so a too-early release costs time,
  * never correctness.
  */
object CacheRegistry {

  private val refs = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` and register the handle for later release. */
  def persisted[T](ds: Dataset[T]): Dataset[T] = {
    val p = ds.persist()
    refs.add(p)
    p
  }

  /** Release ONE registered cached DataFrame early — for loops that chain
    * persisted generations (e.g. BPE's 128-merge rebases), where waiting
    * for scope-exit unpersistAll would accumulate every superseded
    * generation in storage memory. */
  def release(ds: Dataset[_]): Unit = {
    refs.remove(ds)
    try ds.unpersist(blocking = false) catch { case _: Exception => () }
  }

  /** Release every registered cached DataFrame (non-blocking). */
  def unpersistAll(): Unit = {
    var d = refs.poll()
    while (d != null) {
      try d.unpersist(blocking = false)
      catch { case _: Exception => () } // session may already be stopped
      d = refs.poll()
    }
  }
}
