package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bounded (interval) equi-join between two event relations — the
  * enrichment join of the reference's dataflow surface
  * (`/root/reference/src/dataworks/stream.clj` wires transducers between
  * topics; correlating two topics within a time window is the stateful
  * companion the declarative surface needs) expressed once so BATCH and
  * STREAMING share the plan:
  *
  *  - Batch: one shuffle per side on the key, then a sort-merge join with
  *    the range condition applied at the join — the backfill shape.
  *  - Streaming: watermark BOTH inputs (caller does, via `withWatermark`)
  *    and Structured Streaming derives per-side state-eviction watermarks
  *    FROM the interval bounds, so join state is bounded by
  *    watermark-delay + interval width regardless of stream length — the
  *    canonical stream-stream join. StreamJoinSpec pins batch ≡ streaming
  *    on the same data.
  *
  * The time condition is spelled on raw timestamp columns with INTERVAL
  * literals (not unix_micros arithmetic) because that is the exact form
  * Spark's streaming join planner can extract state bounds from. */
object StreamJoin {

  /** `left` rows joined to `right` rows with the same `key` whose `rightTs`
    * falls in [leftTs − lookback, leftTs + lookahead]. Columns stay
    * qualified by the `l`/`r` aliases — select through them. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   lookback: java.time.Duration,
                   lookahead: java.time.Duration = java.time.Duration.ZERO,
                   leftTs: String = "ts", rightTs: String = "ts",
                   joinType: String = "inner"): DataFrame = {
    require(!lookback.isNegative && !lookahead.isNegative,
      "intervalJoin: lookback/lookahead must be non-negative durations")
    val cond: Column = col(s"l.$key") === col(s"r.$key") &&
      col(s"r.$rightTs") >= expr(s"l.$leftTs - INTERVAL '${lookback.getSeconds}' SECOND") &&
      col(s"r.$rightTs") <= expr(s"l.$leftTs + INTERVAL '${lookahead.getSeconds}' SECOND")
    left.alias("l").join(right.alias("r"), cond, joinType)
  }

  /** "<n> seconds|minutes|hours|days" → Duration, for the declarative
    * [[graft.core.OpSpec.IntervalJoin]] spec strings (same dialect as the
    * watermark strings the other stateful specs carry). */
  def parseDuration(s: String): java.time.Duration = {
    val Pat = "([0-9]+)\\s*(second|minute|hour|day)s?".r
    s.trim.toLowerCase match {
      case Pat(n, u) => u match {
        case "second" => java.time.Duration.ofSeconds(n.toLong)
        case "minute" => java.time.Duration.ofMinutes(n.toLong)
        case "hour"   => java.time.Duration.ofHours(n.toLong)
        case "day"    => java.time.Duration.ofDays(n.toLong)
      }
      case other => throw new IllegalArgumentException(
        s"intervalJoin duration '$other' — expected '<n> seconds|minutes|hours|days'")
    }
  }

  /** SparkEntry gate (oracled): per purchase, the count and exact-decimal
    * value sum of the same user's clicks in the preceding 2 hours — the
    * attribution query every event pipeline runs, on the batch path of the
    * shared builder. */
  def intervalJoinQuery(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val ev = graft.core.Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    intervalJoin(purchases, clicks, "user_id", java.time.Duration.ofHours(2))
      .groupBy(col("l.event_id").as("event_id"), col("l.user_id").as("user_id"))
      .agg(count(lit(1)).as("n_clicks"),
        graft.query.Relational.exactSum(col("r.value")).as("click_value"))
  }
}
