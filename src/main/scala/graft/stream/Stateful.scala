package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Arbitrary keyed state over streams via `mapGroupsWithState` /
  * `flatMapGroupsWithState` — the custom-state capability class the
  * reference approximates with hand-rolled channel state and the alert
  * poll loop (SURVEY.md §2.3 T20). State lives in the checkpointed state
  * store (survives restarts/hot-swaps); timeouts bound its lifetime.
  */
object Stateful {

  final case class KeyedEvent(key: String, value: String, ts: Timestamp)
  final case class RunningCount(key: String, n: Long, lastValue: String)
  final case class Session(key: String, nEvents: Long,
                           startTs: Timestamp, endTs: Timestamp)

  /** Running per-key counter (update-mode): emits (key, n, lastValue) on
    * every batch a key appears in; state never expires (a registry-style
    * accumulator). */
  def runningCounts(df: DataFrame): Dataset[RunningCount] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("CAST(key AS STRING) key", "CAST(value AS STRING) value", "ts")
      .as[KeyedEvent]
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, events: Iterator[KeyedEvent], state: GroupState[RunningCount]) =>
          var current = state.getOption.getOrElse(RunningCount(key, 0L, null))
          events.foreach(e => current = RunningCount(key, current.n + 1, e.value))
          state.update(current)
          current
      }
  }

  /** Event-time session windows (append-mode): a key's events group into
    * one session until `gapMillis` of event-time silence; the closed
    * session is emitted when the watermark passes the gap — per-key
    * event-time timers, which the reference could only fake with the 1 s
    * alert poll. (Event-time, not processing-time: deterministic under
    * replay/backfill, and a processing-time timeout livelocks
    * `processAllAvailable`-style draining.) */
  def sessionize(df: DataFrame, gapMillis: Long): Dataset[Session] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("CAST(key AS STRING) key", "CAST(value AS STRING) value", "ts")
      .withWatermark("ts", "0 milliseconds")
      .as[KeyedEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: String, events: Iterator[KeyedEvent], state: GroupState[Session]) =>
          if (state.hasTimedOut) {
            val done = state.get
            state.remove()
            Iterator.single(done)
          } else {
            val evs = events.toSeq
            val prev = state.getOption
            val s = Session(key,
              prev.map(_.nEvents).getOrElse(0L) + evs.size,
              prev.map(_.startTs).getOrElse(evs.map(_.ts).min),
              evs.map(_.ts).max)
            state.update(s)
            state.setTimeoutTimestamp(s.endTs.getTime + gapMillis)
            Iterator.empty
          }
      }
  }

  /** Spark 4 `transformWithState` (state API v2): streaming exact dedup
    * whose per-key state EXPIRES after `ttlMillis` of processing time —
    * the store-native TTL that `dropDuplicatesWithinWatermark` (event-time
    * only) and `mapGroupsWithState` (manual timeout bookkeeping) can't
    * express. At 100 TB/day this is the bound that keeps a forever-running
    * dedup node's RocksDB state proportional to the TTL window, not the
    * stream's lifetime. Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`), which is what
    * backs transformWithState. */
  def dedupKeysTtl(df: DataFrame, ttlMillis: Long): Dataset[KeyedEvent] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("CAST(key AS STRING) key", "CAST(value AS STRING) value", "ts")
      .as[KeyedEvent]
      .groupByKey(_.key)
      .transformWithState(new TtlDedupProcessor(ttlMillis),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Per-key ingestion quota (append-mode): the first `cap` rows for each
    * quota-key value pass, every later row is dropped — the "at most N
    * docs per domain/source" admission stage of a crawl-ingest stream.
    * `keyExpr` is an arbitrary SQL expression over the node row (e.g.
    * `get_json_object(value, '$.source')`), so the quota key can live
    * inside the payload. The running count per key is a single long in
    * the checkpointed state store: admission survives restarts and
    * hot-swaps, state size is #distinct keys × 8 bytes, and the per-batch
    * work materializes at most the remaining quota per key — a batch of a
    * million rows for an exhausted key costs an iterator skip, not a
    * buffer. Batch-equivalent semantics: row_number per key in arrival
    * order ≤ cap (the `stream_quota_admit` oracle). */
  def quotaAdmit(df: DataFrame, keyExpr: String, cap: Long,
                 ttlMillis: Option[Long] = None): Dataset[KeyedEvent] = {
    require(cap > 0, "quotaAdmit: cap must be positive")
    require(ttlMillis.forall(_ > 0), "quotaAdmit: ttlMillis must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr(s"CAST(($keyExpr) AS STRING) key",
        "CAST(value AS STRING) value", "ts")
      .as[KeyedEvent]
      .groupByKey(_.key)
      .transformWithState(new QuotaProcessor(cap, ttlMillis),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}

/** First event per key passes; repeats are dropped until the key's state
  * ages out via the store's TTL. */
class TtlDedupProcessor(ttlMillis: Long)
    extends StatefulProcessor[String, Stateful.KeyedEvent, Stateful.KeyedEvent] {

  @transient private var seen: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean,
      TTLConfig(java.time.Duration.ofMillis(ttlMillis)))

  override def handleInputRows(key: String, rows: Iterator[Stateful.KeyedEvent],
                               timerValues: TimerValues): Iterator[Stateful.KeyedEvent] =
    if (seen.exists()) Iterator.empty
    else { seen.update(true); rows.take(1) }
}

/** Admits rows while the key's running count stays under `cap`. Without a
  * TTL the count never expires (a lifetime quota); with one, the count is
  * forgotten `ttlMillis` after the key's LAST admission (rejected rows
  * never touch state, so they don't extend it) and the budget refills —
  * at most `cap` rows per admission burst, refill after `ttlMillis` of
  * admission quiet. A coarse rate bound, NOT a sliding window ("≤ N in
  * any ttl-length interval" needs per-admission timestamps, cap × 8
  * bytes of state instead of 8). State stays 8 bytes/key. */
class QuotaProcessor(cap: Long, ttlMillis: Option[Long] = None)
    extends StatefulProcessor[String, Stateful.KeyedEvent, Stateful.KeyedEvent] {

  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("n", Encoders.scalaLong,
      ttlMillis.fold(TTLConfig.NONE)(ms => TTLConfig(java.time.Duration.ofMillis(ms))))

  override def handleInputRows(key: String, rows: Iterator[Stateful.KeyedEvent],
                               timerValues: TimerValues): Iterator[Stateful.KeyedEvent] = {
    val already = if (count.exists()) count.get() else 0L
    if (already >= cap) Iterator.empty
    else {
      // materializes at most the REMAINING quota, never the whole batch
      val admitted = rows.take(math.min(cap - already, Int.MaxValue.toLong).toInt).toVector
      count.update(already + admitted.size)
      admitted.iterator
    }
  }
}
