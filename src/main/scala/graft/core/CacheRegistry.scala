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

  // Per-thread scope frames: a concurrent server must release ONLY the
  // datasets the current request/batch registered — a global drain from a
  // 16-thread HTTP executor (or a foreachBatch) would unpersist another
  // in-flight request's eagerly-materialized :timeout result, whose later
  // collect then silently recomputes OUTSIDE its cancellable job group,
  // defeating the :timeout budget. Operators build and persist their plans
  // on the calling thread, so a thread-local frame captures exactly the
  // request's registrations.
  private val scopes = new ThreadLocal[java.util.ArrayDeque[java.util.ArrayList[Dataset[_]]]] {
    override def initialValue() = new java.util.ArrayDeque[java.util.ArrayList[Dataset[_]]]()
  }

  /** Run `f` in a fresh registration scope on this thread; on exit,
    * unpersist exactly the datasets `f` registered (and no others).
    * Nesting is fine — inner frames release before outer ones. */
  def scoped[A](f: => A): A = {
    val frame = new java.util.ArrayList[Dataset[_]]()
    scopes.get().push(frame)
    try f finally {
      scopes.get().pop()
      val it = frame.iterator()
      while (it.hasNext) {
        try it.next().unpersist(blocking = false)
        catch { case _: Exception => () }
      }
    }
  }

  /** Persist `ds` and register the handle for later release — into the
    * innermost [[scoped]] frame on this thread if one is active, else the
    * process-global registry drained by [[unpersistAll]].
    *
    * SAME-THREAD CONTRACT (ADVICE r15): a [[scoped]] frame captures only
    * registrations made on the scope-owning thread. An operator that
    * persists from a thread it spawned mid-scope registers into the
    * process-global queue instead — which a scoped-only owner (the
    * collector server, the streaming handlers) never drains, silently
    * reintroducing the unbounded cache leak. Operators must build and
    * persist their plans on the calling thread (every current operator
    * does; Spark's job EXECUTION threads are fine — it is the
    * registration call that must not move). If a future operator
    * genuinely needs cross-thread persists, it must hand the handles back
    * to the scope owner for explicit [[release]]. */
  def persisted[T](ds: Dataset[T]): Dataset[T] = {
    val p = ds.persist()
    val st = scopes.get()
    if (!st.isEmpty) st.peek().add(p) else refs.add(p)
    p
  }

  /** Release ONE registered cached DataFrame early — for loops that chain
    * persisted generations (e.g. BPE's 128-merge rebases), where waiting
    * for scope-exit unpersistAll would accumulate every superseded
    * generation in storage memory. */
  def release(ds: Dataset[_]): Unit = {
    val st = scopes.get()
    if (!st.isEmpty) st.peek().remove(ds)
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
