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

  /** Start ingesting a streaming DataFrame: `idExpr` names the document id
    * (SQL expression), remaining `docCols` become the JSON payload.
    *
    * `checkpoint` makes the ingest CRASH-RECOVERABLE: committed offsets
    * (and the state of any stateful admission stage upstream in the same
    * query — quota, TTL dedup) survive an abrupt stop, so a restart
    * resumes at the last committed batch instead of reprocessing or
    * skipping. Without one, Spark uses a process-scoped temp checkpoint —
    * fine for a drain-and-redeploy, wrong for a production ingest. */
  def ingest(df: DataFrame, store: DocumentStore, idExpr: String,
             docCols: Seq[String], queryName: String,
             checkpoint: Option[String] = None): StreamingQuery = {
    val w = df.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
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
        // commit empty transactions / write empty parquet files
        if (!docs.isEmpty) store.putBatch(docs)
        ()
      }
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
