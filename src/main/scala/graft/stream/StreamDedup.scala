package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Dedup

/** Online near-dup ADMISSION FILTERING: drop documents arriving on a stream
  * that near-match an existing corpus, before they ever land in it — the
  * streaming face of the staged-index lifecycle
  * ([[graft.ext.Dedup.stageShingleIndex]] builds the corpus pass once;
  * every micro-batch pays only batch-proportional probe cost).
  *
  * Spark shape: `foreachBatch`. The probe ends in a per-candidate-pair
  * aggregation (shared-shingle counting) and an anti-join — both illegal
  * mid-stream in append mode without watermark state, and neither is
  * windowed by event time, so per-micro-batch batch execution is the
  * correct (and Spark-documented) spelling, exactly like
  * [[StoreIngest.ingest]]. The index is loaded ONCE at query start and
  * persisted ([[graft.ext.Dedup.loadShingleIndex]]), so steady-state cost
  * per batch is the batch's shingling + a thin hash-keyed probe join.
  *
  * Index freshness is deliberately decoupled from the stream: admitted
  * documents do NOT grow the index mid-query (intra-batch mutual dups are
  * handled by `intraBatch = true`, which additionally runs pair generation
  * WITHIN the batch and keeps the lowest id per duplicate pair). To absorb
  * admitted docs, re-stage the index ([[graft.ext.Dedup.stageShingleIndex]]
  * full rebuild or [[graft.ext.Dedup.appendToShingleIndex]] delta) — the
  * resident pin is resolved PER MICRO-BATCH (a map hit when cached), so the
  * batch after a restage probes the new version with no restart; versioned
  * staging ([[graft.core.Staged]]) keeps the old version's files on disk so
  * the batch racing the restage still reads a consistent snapshot. The
  * hot-swap restart (T15) remains the contract for CONFIG changes
  * (threshold, shingleN, …), same as [[StreamAsOf]] dimension refresh.
  */
object StreamDedup {

  /** Start the admission filter: survivors of each micro-batch are handed to
    * `sink`. Returns the running query (caller owns its lifecycle). */
  def admit(stream: DataFrame, indexPath: String, sink: DataFrame => Unit,
            queryName: String, textCol: String = "text",
            idCol: String = "doc_id", shingleN: Int = 3,
            threshold: Double = 0.5, minCommon: Int = 2,
            intraBatch: Boolean = false): StreamingQuery = {
    val spark = stream.sparkSession
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // resident: pinned OUTSIDE CacheRegistry, so the per-batch hygiene
        // below never evicts it. Resolved INSIDE the batch (a ConcurrentHashMap
        // hit in steady state) so a restage — which releases the pin — is
        // picked up by the very next micro-batch without restarting the query.
        val index = Dedup.residentShingleIndex(spark, indexPath)
        // the batch's shingle table is persisted per micro-batch; without
        // a release a long-running stream accumulates one pinned cache
        // entry per batch until executors OOM. The release is SCOPED to
        // this batch's own registrations — a registry-wide drain from the
        // streaming thread would also unpersist a concurrent REST
        // request's in-flight result (see CacheRegistry.scoped).
        graft.core.CacheRegistry.scoped {
          sink(admitBatch(batch, index, textCol, idCol, shingleN, threshold,
            minCommon, intraBatch))
        }
        ()
      }
      .queryName(queryName)
      .start()
  }

  /** One micro-batch's admission decision — also the batch backfill path
    * (same contract the `dedup_stream_filter` gate oracles). The batch is
    * shingled ONCE; the corpus probe and (with `intraBatch`) the
    * mutual-dup pair pass both consume the same hashed table. */
  def admitBatch(batch: DataFrame, index: Dedup.ShingleIndex,
                 textCol: String = "text", idCol: String = "doc_id",
                 shingleN: Int = 3, threshold: Double = 0.5,
                 minCommon: Int = 2, intraBatch: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    val inSh = graft.core.CacheRegistry.persisted(
      Dedup.hashedShingles(batch, textCol, idCol, shingleN))
    val matched = Dedup.matchesFromShingles(inSh, index, threshold, minCommon)
      .select(col("doc_id").as(idCol)).distinct()
    val vsCorpus = batch.join(matched, Seq(idCol), "left_anti")
    if (!intraBatch) vsCorpus
    else {
      // mutual near-dups inside one batch: keep the lowest id of each pair
      // (pair generation is batch-sized here, not corpus-sized, and reuses
      // the already-persisted hashed shingles of the surviving docs)
      val survivorSh = inSh.join(
        vsCorpus.select(col(idCol).as("id")), Seq("id"), "left_semi")
      val dupIds = Dedup.pairsFromHashedShingles(survivorSh, threshold,
          maxDf = 10, minCommon = minCommon)
        .select(col("id_b").as(idCol)).distinct()
      vsCorpus.join(dupIds, Seq(idCol), "left_anti")
    }
  }
}
