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
  * Scale note: this sink collects each micro-batch to the single writer
  * (the store's serialized commit point — required for match/cas semantics,
  * SURVEY.md §7.4 risk 1), so it is sized for document/control-plane
  * streams (the reference's collectors are HTTP-request-scale). Bulk fact
  * ingestion should land as parquet partitions directly and register the
  * table instead.
  */
object StoreIngest {

  /** Start ingesting a streaming DataFrame: `idExpr` names the document id
    * (SQL expression), remaining `docCols` become the JSON payload. */
  def ingest(df: DataFrame, store: DocumentStore, idExpr: String,
             docCols: Seq[String], queryName: String): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch
          .select(expr(idExpr).cast("string").as("id"),
            to_json(struct(docCols.map(col): _*)).as("doc"))
          .collect()
        if (rows.nonEmpty)
          store.putAll(rows.toSeq.map(r => r.getString(0) -> r.getString(1)))
        ()
      }
      .queryName(queryName)
      .start()

  /** Ingest a topology node's output (wire any `stream/…` node into the
    * store — the "document sink" node kind). */
  def ingestNode(topology: Topology, store: DocumentStore, nodeName: String,
                 idExpr: String, docCols: Seq[String]): StreamingQuery =
    ingest(topology.buildPlan(nodeName), store, idExpr, docCols,
      nodeName.replace('/', '_') + "_store")
}
