package graft.core

import java.sql.Timestamp

/** Core engine types (SURVEY.md §1.1).
  *
  * A document is an arbitrary map keyed by `:crux.db/id` in the reference
  * (`/root/reference/src/dataworks/db/app_db.clj:45-48`); here: a JSON
  * payload plus a string id, versioned bitemporally.
  */
final case class VersionedDoc(
    id: String,
    validFrom: Timestamp, // Crux valid-time (caller-suppliable; future-dated puts allowed)
    txTime: Timestamp,    // transaction time (engine-assigned, monotonic)
    deleted: Boolean,     // tombstone (S5 delete)
    doc: String)          // JSON payload (open-map escape hatch, SURVEY.md §1.3)

/** Stream-node naming: `kafka/<topic>` is an external Kafka topic node,
  * `stream/<name>` an internal node
  * (`/root/reference/src/dataworks/utils/stream.clj:104-110`). */
sealed trait NodeName { def name: String; def full: String }
object NodeName {
  final case class KafkaTopic(name: String) extends NodeName { def full = s"kafka/$name" }
  final case class Internal(name: String) extends NodeName { def full = s"stream/$name" }

  /** Reserved internal control-plane topic
    * (`/root/reference/src/dataworks/app_graph.clj:13-19`): a user kafka
    * node may not claim it, or control messages would cross-read. */
  val ControlTopic = "dataworks.internal.functions"

  // Kafka's legal topic charset ([a-zA-Z0-9._-], ≤249 chars) for kafka
  // nodes; internal node names additionally ban '.' so the physical-topic
  // mapping `stream/<x>` -> `stream.<x>` stays injective (see
  // KafkaIO.topicName): with '.' banned in <x>, no two distinct node
  // names can meet on one physical topic, and the reserved `stream.`
  // prefix below keeps kafka nodes out of that namespace entirely.
  private val KafkaLegal = "[a-zA-Z0-9._-]{1,249}".r
  private val InternalLegal = "[a-zA-Z0-9_-]{1,240}".r

  def parse(s: String): NodeName = s.split("/", 2) match {
    case Array("kafka", t) =>
      if (!KafkaLegal.matches(t) || t == "." || t == "..")
        throw new IllegalArgumentException(
          s"kafka topic must match [a-zA-Z0-9._-]{1,249} (not '.'/'..'): $t")
      if (t == ControlTopic)
        throw new IllegalArgumentException(
          s"kafka topic '$t' is reserved for the control plane")
      if (t.startsWith("stream."))
        throw new IllegalArgumentException(
          s"kafka topic prefix 'stream.' is reserved for internal nodes: $t")
      KafkaTopic(t)
    case Array("stream", n) =>
      if (!InternalLegal.matches(n))
        throw new IllegalArgumentException(
          s"internal node name must match [a-zA-Z0-9_-]{1,240}: $n")
      Internal(n)
    case _ => throw new IllegalArgumentException(
      s"node name must be kafka/<topic> or stream/<name>: $s")
  }
}

/** Declarative op-spec for stream-node transducers (SURVEY.md §7.4 risk 5):
  * the reference evals arbitrary Clojure transducer strings
  * (`/root/reference/src/dataworks/stream.clj:30-34`); we deliberately
  * narrow to a composable ADT whose `expr` strings are Spark SQL
  * expressions (parsed by Catalyst, no runtime code eval) plus named
  * registered functions (F1 surface).
  */
sealed trait OpSpec
object OpSpec {
  /** map: project value through a SQL expression over column `value`. */
  final case class MapExpr(expr: String) extends OpSpec
  /** filter: keep rows where the SQL predicate holds. */
  final case class FilterExpr(predicate: String) extends OpSpec
  /** select: arbitrary named column expressions (schema reshape). */
  final case class SelectExpr(exprs: Seq[String]) extends OpSpec
  /** invoke a named registered transformer (graft.registry.Functions). */
  final case class Named(name: String, args: Seq[String] = Nil) extends OpSpec
  /** composition — transducer `comp` (T5). */
  final case class Comp(stages: Seq[OpSpec]) extends OpSpec
  /** F7 `->let` (`/root/reference/src/dataworks/utils/common.clj:74-110`):
    * sequential NAMED definitions in scope for everything after them — the
    * reference macroexpands user `defn`s into a `let`; here each binding
    * is a named SQL expression column (later bindings and every `body`
    * stage can reference it, non-linearly), and bindings the body didn't
    * project away are dropped from the output, exactly like let-locals
    * going out of scope. Declarative and eval-free, like every OpSpec. */
  final case class LetExpr(bindings: Seq[(String, String)],
                           body: Seq[OpSpec]) extends OpSpec

  /** Event-time windowed aggregation with a watermark — a capability the
    * reference lacks entirely (its transducers are per-element; time-based
    * behavior is hand-rolled via the alert pattern, SURVEY.md §2.6) but
    * that Structured Streaming provides natively; exposed as a first-class
    * node spec. `aggs` are SQL aggregate expressions (e.g.
    * "count(*) AS n"); empty `slide` = tumbling window. */
  final case class WindowAgg(tsCol: String, windowDuration: String,
                             slide: Option[String], watermark: String,
                             groupBy: Seq[String], aggs: Seq[String]) extends OpSpec

  /** Streaming dedup by key within a watermark — the streaming face of the
    * LLM-pipeline dedup suite (drop exact repeats as they arrive). */
  final case class DedupeKeys(keys: Seq[String], tsCol: String,
                              watermark: String) extends OpSpec

  /** Event-time SESSION windows with a watermark (`session_window`): a
    * key's events merge into one window while gaps stay under `gap` —
    * the third window family (tumbling/sliding are WindowAgg) the
    * reference's per-element transducers cannot express. */
  final case class SessionAgg(tsCol: String, gap: String, watermark: String,
                              groupBy: Seq[String], aggs: Seq[String]) extends OpSpec

  /** Streaming as-of enrichment against a versioned dimension table
    * (parquet at `dimPath`): each event picks up the latest dim version
    * at-or-before its event time — left-outer, null carries when nothing
    * matches (graft.stream.StreamAsOf). The declarative face of the as-of
    * join family for topology nodes. */
  final case class AsOfEnrich(dimPath: String, key: String, eventTs: String,
                              dimTs: String, carry: Seq[String]) extends OpSpec

  /** Time-bounded stream-stream join against ANOTHER NODE's output
    * ([[graft.stream.StreamJoin]] as a declarative stage): each row of
    * this node's input (left) picks up `carry` columns (renamed
    * `right_<col>`) from `right`'s rows sharing `key` whose `ts` lies in
    * [left.ts − lookback, left.ts + lookahead]. STATEFUL — both sides
    * watermark with `watermark` and Spark bounds join state from the
    * interval condition; the right node is a real graph dependency
    * (edges/cycle checks/affected-subgraph/stateful signature all see it). */
  final case class IntervalJoin(right: String, key: String, lookback: String,
                                lookahead: String, watermark: String,
                                carry: Seq[String]) extends OpSpec

  /** PII scrubbing on a text column (graft.ext.TextOps.scrubPii): adds
    * per-class match counts and `text_clean` with typed placeholders.
    * Stateless per-row projection — the redaction-at-ingest stage of a
    * training-data stream. */
  final case class ScrubPii(textCol: String) extends OpSpec

  /** Decontamination at ingest against a staged Bloom filter
    * (graft.ext.Corpus.stageBloomFilter): keep rows whose shingle
    * hit-fraction against the filter stays ≤ `maxHitFracQ6` (q6-scaled;
    * compare is integer-exact hits·10⁶ ≤ frac·shingles). STATELESS — the
    * filter is a fixed m/8-byte bitmap joined stream-static and the probe
    * is a per-row array op, so the stage is legal mid-stream (unlike the
    * per-doc-aggregate admission in graft.stream.StreamScore, whose
    * foreachBatch form this complements). Adds n_sh / n_hit_bloom
    * evidence columns; bloom one-sidedness only ever rejects extra. */
  final case class BloomAdmit(modelPath: String, maxHitFracQ6: Long,
                              textCol: String) extends OpSpec

  /** Quality gate at ingest against a staged trained classifier
    * (graft.ext.Corpus.stageQualityClassifier): keep rows whose q6
    * sigmoid score ≥ `minScoreQ6`. STATELESS — the weight vector is a
    * KB-scale plan literal and the score is a per-row fold (the
    * BloomAdmit pattern); adds a `score_q6` evidence column. Model
    * freshness follows the plan lifecycle (restage → node restart). */
  final case class ClassifierAdmit(modelPath: String, minScoreQ6: Long,
                                   textCol: String) extends OpSpec

  /** Per-key ingestion quota (graft.stream.Stateful.quotaAdmit): the first
    * `cap` rows per quota-key value pass, later ones drop — "at most N
    * docs per domain" at ingest. `key` is a SQL expression over the node
    * row, so the key can be a payload field. STATEFUL (one long per key in
    * the state store), so a spec change rotates the checkpoint.
    * `ttlMillis` bounds the cap in time: the count expires `ttlMillis`
    * after the key's LAST admission, so a key gets at most `cap` rows
    * per admission burst and refills after that much quiet — a coarse
    * rate bound, not a sliding window. */
  final case class QuotaAdmit(key: String, cap: Long,
                              ttlMillis: Option[Long] = None) extends OpSpec
}

/** Buffer policy for a stream node (T7-T9,
  * `/root/reference/src/dataworks/stream.clj:83-95`). Structured Streaming
  * has no per-node bounded channel; fixed buffers map to source rate limits
  * (`maxOffsetsPerTrigger`), sliding/dropping are documented divergences
  * approximated by rate limiting (SURVEY.md §7.3). */
sealed trait BufferSpec
object BufferSpec {
  final case class Fixed(n: Int) extends BufferSpec
  final case class Sliding(n: Int) extends BufferSpec
  final case class Dropping(n: Int) extends BufferSpec
}

/** A stream node (T1): name + upstream edges + transducer + buffer +
  * error-handler sink, mirroring `create-stream!` params
  * (`/root/reference/src/dataworks/stream.clj:117-133`). */
final case class StreamNode(
    name: NodeName,
    upstream: Set[String],
    transducer: Option[OpSpec],
    buffer: Option[BufferSpec],
    errorSink: Option[String],
    format: String = "json")
