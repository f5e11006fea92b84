package graft.stream

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-node dropped-rows counters for lossy buffers (T8/T9).
  *
  * The reference's sliding/dropping core.async buffers silently discard
  * items under overflow (`/root/reference/src/dataworks/stream.clj:88-91`);
  * the one observable a user has is "how much did I lose". Topology wraps
  * each lossy buffer in two `observe` nodes (rows in / rows out); this
  * listener receives those observations with every micro-batch progress
  * event and accumulates `in − out` per topology node.
  *
  * Counters live on the driver (a TrieMap, not an accumulator), so re-run
  * batches after a checkpointed restart do not double-count historical
  * drops — each progress event is delivered exactly once per attempt. */
class DropMetrics private () extends StreamingQueryListener {

  private val inRows = TrieMap.empty[(String, Long), Long]
  private val outRows = TrieMap.empty[(String, Long), Long]

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    e.progress.observedMetrics.asScala.foreach { case (name, row) =>
      DropMetrics.parse(name).foreach { case (node, id, isIn) =>
        val rows = row.getAs[Long]("rows")
        val m = if (isIn) inRows else outRows
        m.updateWith((node, id)) { prev => Some(prev.getOrElse(0L) + rows) }
      }
    }
  }

  /** Total rows discarded by `node`'s lossy buffer so far (0 if none). */
  def droppedRows(node: String): Long = {
    val in = inRows.collect { case ((n, _), v) if n == node => v }.sum
    val out = outRows.collect { case ((n, _), v) if n == node => v }.sum
    math.max(0L, in - out)
  }

  /** Forget `node`'s counters — call when a topology discards the node so a
    * later same-named node starts from zero instead of inheriting totals. */
  def reset(node: String): Unit = {
    inRows.filterInPlace { case ((n, _), _) => n != node }
    outRows.filterInPlace { case ((n, _), _) => n != node }
  }
}

object DropMetrics {
  private val Prefix = "graft.buf"

  def inName(node: String, id: Long): String = s"$Prefix:$node:$id:in"
  def outName(node: String, id: Long): String = s"$Prefix:$node:$id:out"

  /** name → (node, observeId, isIn) when it is one of ours. */
  private def parse(name: String): Option[(String, Long, Boolean)] =
    if (!name.startsWith(Prefix + ":")) None
    else name.split(':') match {
      case Array(_, node, id, dir) if dir == "in" || dir == "out" =>
        id.toLongOption.map(i => (node, i, dir == "in"))
      case _ => None
    }

  // Weak keys: a discarded SparkSession must stay collectable — the map
  // must never be the thing pinning a session (and its listener + counters)
  // in a long-lived multi-session process. The value holds no reference to
  // the session (only the session's listener bus refs the value), so a
  // dead session's entry clears on the next GC.
  private val instances =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, DropMetrics]())

  /** The session's (lazily registered) drop-metrics listener. */
  def forSession(spark: SparkSession): DropMetrics =
    instances.synchronized {
      Option(instances.get(spark)).getOrElse {
        val m = new DropMetrics()
        spark.streams.addListener(m)
        instances.put(spark, m)
        m
      }
    }

  /** Eagerly detach the session's listener and drop its counters (the weak
    * map also clears on GC; this is the deterministic path for apps that
    * stop sessions explicitly). */
  def release(spark: SparkSession): Unit =
    instances.synchronized {
      Option(instances.remove(spark)).foreach(spark.streams.removeListener)
    }
}
