package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.store.DocumentStore

/** Streaming ingestion into the document store — the collector data path of
  * SURVEY.md §3.2 without the REST skin: user data arrives on a stream,
  * documents are built and `put` into the bitemporal db. Each micro-batch
  * commits as ONE store transaction (`putAll` → one tx-time, one file),
  * mirroring Crux's batched tx-log writes.
  *
  * Scale note: the batch never touches the driver — the tx-time is
  * assigned under the store's lock (the serialized commit point match/cas
  * requires, SURVEY.md §7.4 risk 1), but the rows append executor-side via
  * `DocumentStore.putBatch`, so a high-rate ingest topology streams
  * cluster→table at data scale. Only match/cas batches (not this sink)
  * need driver-side materialization.
  */
object StoreIngest {

  /** The per-query batch-commit ledger doc id (':' namespace — the sink's
    * input filter makes it unforgeable from stream payloads). */
  private[stream] def commitMarker(queryName: String): String =
    s":ingest/commit/$queryName"

  /** Last batch id the ledger records as committed for `queryName`. */
  private[stream] def committedBatch(store: DocumentStore,
                                     queryName: String): Option[Long] =
    store.entity(commitMarker(queryName))
      .flatMap(d => "\"batch\":(\\d+)".r.findFirstMatchIn(d).map(_.group(1).toLong))

  /** The foreachBatch body, factored out so the crash-replay drill can
    * invoke it directly with a repeated batchId — exactly what Structured
    * Streaming does after a crash BETWEEN the sink write and the offset
    * commit (foreachBatch is documented at-least-once).
    *
    * Delivery semantics (SURVEY §3.3): with `dedupeReplays` the batch rows
    * and a `:ingest/commit/<query>` ledger row carrying the batch id land
    * in ONE `putBatch` transaction (one tx-time, one commit job), and a
    * replayed batch id ≤ the ledger's is a no-op — EFFECTIVELY-ONCE into
    * the store, the residual window being a crash inside the file-commit
    * protocol itself. Without it (no durable checkpoint: batch ids restart
    * at 0 every run, so a ledger would silently DROP the new run's early
    * batches) the sink is plain at-least-once: a replayed batch appends
    * duplicate VERSIONS (same id, same content, later tx-time) — the
    * bitemporal read face stays correct, but history/changes() carry the
    * dup. */
  private[stream] def ingestBatch(store: DocumentStore, idExpr: String,
                                  docCols: Seq[String], queryName: String,
                                  dedupeReplays: Boolean)
                                 (batch: DataFrame, batchId: Long): Unit = {
    if (dedupeReplays && committedBatch(store, queryName).exists(_ >= batchId))
      return // replayed micro-batch: already committed, skip
    val docs = batch
      .select(expr(idExpr).cast("string").as("id"),
        to_json(struct(docCols.map(col): _*)).as("doc"))
      // this is the UNTRUSTED data boundary: stream payloads routinely
      // originate from HTTP (a StreamPush collector feeding this sink),
      // and a ':'-prefixed id would plant a stored-function doc that
      // bootstrap ACTIVATES on restart. Control-plane writes go through
      // FunctionManager/put directly, never through this sink, so
      // routing reserved ids out here loses nothing legitimate.
      .filter(!col("id").startsWith(":"))
    // isEmpty runs a limit-1 probe (cheap) so empty micro-batches don't
    // commit empty transactions / write empty parquet files (a replayed
    // EMPTY batch needs no ledger row either — replaying it is free)
    if (!docs.isEmpty) {
      val withLedger =
        if (!dedupeReplays) docs
        else {
          import batch.sparkSession.implicits._
          // ledger row in the SAME transaction as the data: the two are
          // one parquet append, so "data landed but ledger didn't" only
          // exists inside the commit protocol's own window
          docs.unionByName(Seq(
            (commitMarker(queryName), s"""{"batch":$batchId}""")
          ).toDF("id", "doc"))
        }
      store.putBatch(withLedger)
    }
    ()
  }

  /** Start ingesting a streaming DataFrame: `idExpr` names the document id
    * (SQL expression), remaining `docCols` become the JSON payload.
    *
    * `checkpoint` makes the ingest CRASH-RECOVERABLE: committed offsets
    * (and the state of any stateful admission stage upstream in the same
    * query — quota, TTL dedup) survive an abrupt stop, so a restart
    * resumes at the last committed batch instead of reprocessing or
    * skipping. It also upgrades delivery from at-least-once to
    * effectively-once via the batch-id ledger (see [[ingestBatch]]); the
    * ledger keys on `queryName`, so deleting a checkpoint while keeping
    * the store requires a new query name (batch ids restart at 0).
    * Without a checkpoint, Spark uses a process-scoped temp checkpoint —
    * fine for a drain-and-redeploy, wrong for a production ingest. */
  def ingest(df: DataFrame, store: DocumentStore, idExpr: String,
             docCols: Seq[String], queryName: String,
             checkpoint: Option[String] = None): StreamingQuery = {
    val body = ingestBatch(store, idExpr, docCols, queryName,
      dedupeReplays = checkpoint.isDefined) _
    val w = df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) => body(batch, batchId) }
      .queryName(queryName)
    checkpoint.foreach(w.option("checkpointLocation", _))
    w.start()
  }

  /** Ingest a topology node's output (wire any `stream/…` node into the
    * store — the "document sink" node kind). */
  def ingestNode(topology: Topology, store: DocumentStore, nodeName: String,
                 idExpr: String, docCols: Seq[String],
                 checkpoint: Option[String] = None): StreamingQuery =
    ingest(topology.buildPlan(nodeName), store, idExpr, docCols,
      nodeName.replace('/', '_') + "_store", checkpoint)
}
