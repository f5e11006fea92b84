package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.query.Relational

/** Gap-based sessionization: the batch lag/flag/running-sum form and the
  * Structured Streaming `session_window` built-in must agree on session
  * MEMBERSHIP (start, event count, value sum). They can't agree on the
  * end: the built-in defines session end = last event + gap. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  // user 1: two sessions (gap 5 min; 00:00–00:04 chain, then 00:30);
  // user 2: one session spanning the chain 00:00 → 00:04 → 00:08
  private val events = Seq(
    (1L, ts(0), 10.0), (2L, ts(4), 2.0), (3L, ts(30), 1.0),
    (4L, ts(0), 5.0), (5L, ts(4), 5.0), (6L, ts(8), 5.0)
  ).map { case (id, t, v) => (id, t, if (id <= 3) 1L else 2L, v) }

  private val gapMicros = 5L * 60 * 1000000

  test("batch sessionize: gap chains, per-session bounds and sums") {
    val df = events.toDF("event_id", "ts", "user_id", "value")
    val out = Relational.sessionize(df, gapMicros)
      .select($"user_id", $"session_start", $"n_events", $"sum_value")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, ts(0), 2L, 12.0),  // 00:00 + 00:04 chain
      (1L, ts(30), 1L, 1.0),  // isolated
      (2L, ts(0), 3L, 15.0))) // transitive chain across 8 minutes
  }

  test("streaming session_window agrees with batch sessionize on membership") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val q = in.toDF().toDF("event_id", "ts", "user_id", "value")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window($"ts", "5 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("sum_value"))
      .select($"user_id", $"w.start".as("session_start"), $"n_events", $"sum_value")
      .writeStream.format("memory").queryName("sessionize_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("sessionize_test")
        .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSet
      val batch = Relational.sessionize(
          events.toDF("event_id", "ts", "user_id", "value"), gapMicros)
        .select($"user_id", $"session_start", $"n_events", $"sum_value")
        .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSet
      assert(streamed == batch,
        s"streaming sessions $streamed must match batch $batch")
    } finally q.stop()
  }
}
