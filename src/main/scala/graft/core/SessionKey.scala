package graft.core

import org.apache.spark.sql.SparkSession

/** A stable unique key per live SparkSession, for JVM-once caches of
  * session-scoped artifacts (catalog tables, trained gate models). The
  * weak map guarantees two live sessions can never share a key — which
  * `System.identityHashCode` does not — and lets a closed session's
  * entry be collected instead of pinning it forever. */
object SessionKey {
  private val ids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  def of(s: SparkSession): String =
    ids.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)
}
