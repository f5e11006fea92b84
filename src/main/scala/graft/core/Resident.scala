package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** A path-keyed cache of RESIDENT artifacts pinned outside
  * [[CacheRegistry]] hygiene — staged indexes/models a long-running
  * consumer (an admission stream, a hot-swapped query) probes every
  * micro-batch. One shared implementation of the subtle lifecycle every
  * resident artifact needs: a cached entry is only valid for the session
  * that built it (cached DataFrames are session-bound — serving session
  * A's plans to session B, or to anyone after A stopped, fails at
  * execution time), the swapped-out value is unpinned, and unpin
  * exceptions are swallowed (the owning session may already be stopped).
  */
final class Resident[T](load: (SparkSession, String) => T, unpin: T => Unit) {
  private val cache = new ConcurrentHashMap[String, (SparkSession, T)]()

  def get(spark: SparkSession, path: String): T = {
    // reloading against a stopped session would discard the entry and then
    // fail opaquely inside `load` (and again on every retry) — fail fast
    // with the actual cause instead
    require(!spark.sparkContext.isStopped,
      s"Resident.get($path): caller's SparkSession is stopped")
    cache.compute(path, (p, cur) => {
      if (cur != null && (cur._1 eq spark)) cur
      else {
        if (cur != null) safeUnpin(cur._2)
        (spark, load(spark, p))
      }
    })._2
  }

  def release(path: String): Unit = {
    val cur = cache.remove(path)
    if (cur != null) safeUnpin(cur._2)
  }

  private def safeUnpin(t: T): Unit =
    try unpin(t) catch { case _: Exception => () }
}
