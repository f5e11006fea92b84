package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Corpus

/** Online LM-quality ADMISSION: score documents arriving on a stream
  * against a staged bigram model ([[graft.ext.Corpus.stageLmModel]] — the
  * CCNet recipe's reference LM) and keep only those under a perplexity
  * ceiling, before they ever land in the corpus. The streaming face of
  * the train-once / score-many lifecycle, structured exactly like
  * [[StreamDedup]]: `foreachBatch` (the scoring tail is a per-doc
  * aggregate — illegal mid-stream in append mode and not event-time
  * windowed, so per-micro-batch batch execution is the documented
  * spelling), a resident model pinned outside per-batch cache hygiene,
  * and batch-proportional steady-state cost (the model joins are
  * vocab-bounded broadcasts).
  *
  * Model freshness is decoupled from the stream: to roll a new reference
  * model, re-stage ([[graft.ext.Corpus.stageLmModel]] rebuild or
  * [[graft.ext.Corpus.appendToLmModel]] delta) — the resident pin is
  * resolved per micro-batch, so the next batch scores against the new
  * version without a restart ([[StreamDedup]] has the same contract);
  * hot-swap restart (T15) remains the path for config changes.
  */
object StreamScore {

  /** Start the admission scorer: each micro-batch's surviving documents —
    * those with mean NLL ≤ `maxAvgNllQ6` (q6-scaled nats/bigram) — are
    * handed to `sink` with `nll_q6`/`n_bigrams` columns attached.
    * Documents too short to have a bigram are dropped (no evidence, no
    * admission — matching the batch scorer, which never emits them).
    * Returns the running query (caller owns its lifecycle). */
  def admit(stream: DataFrame, modelPath: String, maxAvgNllQ6: Long,
            sink: DataFrame => Unit, queryName: String,
            textCol: String = "text", idCol: String = "doc_id"): StreamingQuery = {
    val spark = stream.sparkSession
    // resident model resolved per batch (map hit when cached): a restage
    // releases the pin and the next micro-batch scores on the new version
    startAdmission(stream, queryName, sink, idCol, batch =>
      Corpus.lmScoreBatch(batch, Corpus.residentLmModel(spark, modelPath),
        textCol, idCol)
        // integer-exact threshold: nll ≤ maxAvg · n (never a float mean)
        .filter(col("nll_q6") <= lit(maxAvgNllQ6) * col("n_bigrams")))
  }

  /** The DSIR companion: admit documents whose importance weight against a
    * staged ratio table ([[graft.ext.Corpus.stageDsirModel]]) clears
    * `minWeightQ6` — target-likeness filtering at ingest. The ratio table
    * is bucket-bounded (KBs at any corpus size), pinned resident, and
    * broadcast into every micro-batch's scoring join. */
  def admitDsir(stream: DataFrame, modelPath: String, minWeightQ6: Long,
                sink: DataFrame => Unit, queryName: String,
                textCol: String = "text", idCol: String = "doc_id"): StreamingQuery = {
    val spark = stream.sparkSession
    // buckets = 0: dsirScoreBatch derives the count from the staged table
    // itself, so a stage/score mismatch is impossible by construction
    startAdmission(stream, queryName, sink, idCol, batch =>
      Corpus.dsirScoreBatch(batch,
        Corpus.residentDsirModel(spark, modelPath), 0, textCol, idCol)
        .filter(col("dsir_weight_q6") >= minWeightQ6))
  }

  /** The decontamination companion: admit documents whose Bloom-probed
    * contamination against a staged reference filter
    * ([[graft.ext.Corpus.stageBloomFilter]]) stays at or under
    * `maxHitFracQ6` (hits/shingles, q6-scaled). The filter is a FIXED
    * m/8-byte bitmap however large the reference corpus — the admission
    * probe that still broadcasts when the eval side is itself a prior
    * 100 TB training corpus ("have we trained on this before"). The
    * threshold compare is integer-exact (hits·10⁶ ≤ frac_q6·shingles —
    * never a float ratio); the bloom's one-sided error only ever REJECTS
    * extra (false positives inflate hits), never admits contamination. */
  def admitClean(stream: DataFrame, modelPath: String, maxHitFracQ6: Long,
                 sink: DataFrame => Unit, queryName: String,
                 textCol: String = "text", idCol: String = "doc_id"): StreamingQuery = {
    val spark = stream.sparkSession
    startAdmission(stream, queryName, sink, idCol, batch =>
      Corpus.bloomScoreBatch(batch,
        Corpus.residentBloomFilter(spark, modelPath), textCol, idCol)
        .filter(col("n_hit_bloom") * lit(1000000L) <= lit(maxHitFracQ6) * col("n_sh")))
  }

  /** The shared admission scaffold: per-micro-batch score → filter →
    * re-join the survivors to the full batch row (scorers return only
    * id + evidence columns) → hand to `sink`, with per-batch cache
    * hygiene in a finally. Both admission flavors differ ONLY in the
    * scoring tail they pass here. */
  private def startAdmission(stream: DataFrame, queryName: String,
                             sink: DataFrame => Unit, idCol: String,
                             score: DataFrame => DataFrame): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // scoped, not a global drain: this micro-batch releases only its
        // own registrations — a registry-wide drain from the streaming
        // thread would unpersist a concurrent REST request's in-flight
        // :timeout result (see CacheRegistry.scoped)
        graft.core.CacheRegistry.scoped {
          val scored = score(batch)
          sink(batch.join(scored.withColumnRenamed("doc_id", idCol), Seq(idCol)))
        }
        ()
      }
      .queryName(queryName)
      .start()

  /** Forwarder kept for API continuity — the resident ratio now lives in
    * [[graft.ext.Corpus]] so staging can release the pin it invalidates. */
  def releaseDsirModel(path: String): Unit = Corpus.releaseDsirModel(path)
}
