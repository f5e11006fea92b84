package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The interval join's two faces must agree: the SAME builder
  * ([[StreamJoin.intervalJoin]]) run over batch frames and over two
  * watermarked MemoryStreams yields the same joined rows — and the
  * streaming run is a real stream-stream join (bounded state from the
  * interval condition), not a re-planned batch. */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 01:$minute%02d:00")

  // purchases at :10 and :40; clicks scattered — the 15-min lookback
  // catches (:10 ← :00,:05) and (:40 ← :30), not :20 (too early for :40)
  private val purchases = Seq((100L, 1L, ts(10)), (101L, 1L, ts(40)), (102L, 2L, ts(10)))
  private val clicks = Seq(
    (1L, ts(0), 1.0), (1L, ts(5), 2.0), (1L, ts(20), 4.0), (1L, ts(30), 8.0),
    (2L, ts(9), 16.0), (3L, ts(10), 32.0))

  private val lookback = java.time.Duration.ofMinutes(15)

  private def joined(l: org.apache.spark.sql.DataFrame,
                     r: org.apache.spark.sql.DataFrame) =
    StreamJoin.intervalJoin(l, r, "user_id", lookback)
      .select(col("l.event_id"), col("l.user_id"), col("r.ts").as("click_ts"),
        col("r.value"))

  private val expected = Set(
    (100L, 1L, ts(0), 1.0), (100L, 1L, ts(5), 2.0), // :10 window [−15, 0]
    (101L, 1L, ts(30), 8.0),                        // :40 window
    (102L, 2L, ts(9), 16.0))

  test("batch interval join: per-purchase trailing-window clicks") {
    val got = joined(purchases.toDF("event_id", "user_id", "ts"),
        clicks.toDF("user_id", "ts", "value"))
      .as[(Long, Long, java.sql.Timestamp, Double)].collect().toSet
    assert(got == expected, s"got $got")
  }

  test("left-outer face: unmatched purchases survive with null clicks, both modes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def outer(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      StreamJoin.intervalJoin(l, r, "user_id", lookback, joinType = "left_outer")
        .select(col("l.event_id"), col("r.value"))
    val batch = outer(purchases.toDF("event_id", "user_id", "ts"),
        clicks.toDF("user_id", "ts", "value"))
      .as[(Long, Option[Double])].collect().toSet
    // 101 only matches :30's click; a user-3-only click never joins; no
    // purchase is lost (the attribution join must not drop zero-click rows)
    assert(batch.map(_._1) == Set(100L, 101L, 102L))
    val lIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val rIn = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = outer(
        lIn.toDF().toDF("event_id", "user_id", "ts").withWatermark("ts", "10 minutes"),
        rIn.toDF().toDF("user_id", "ts", "value").withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("interval_join_outer_test")
      .outputMode(OutputMode.Append()).start()
    try {
      lIn.addData(purchases: _*)
      rIn.addData(clicks: _*)
      q.processAllAvailable()
      // outer results emit only once the watermark passes the join window
      lIn.addData((999L, 99L, ts(59))); rIn.addData((99L, ts(59), 0.0))
      q.processAllAvailable()
      lIn.addData((998L, 98L, java.sql.Timestamp.valueOf("2024-01-01 03:00:00")))
      rIn.addData((98L, java.sql.Timestamp.valueOf("2024-01-01 03:00:00"), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("interval_join_outer_test")
        .filter(col("event_id") < 900L)
        .as[(Long, Option[Double])].collect().toSet
      assert(streamed == batch, s"streaming outer $streamed must match batch $batch")
    } finally q.stop()
  }

  test("checkpointed restart: join state survives, no duplicate or lost rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ij-ckpt").toString
    val lIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val rIn = MemoryStream[(Long, java.sql.Timestamp, Double)]
    // foreachBatch keyed by batchId: the recoverable sink shape — a
    // replayed batch after restart OVERWRITES its slot instead of
    // double-appending (exactly-once lands on sink idempotence)
    val sunk = new java.util.concurrent.ConcurrentHashMap[
      Long, Seq[(Long, Long, java.sql.Timestamp, Double)]]()
    def start() = joined(
        lIn.toDF().toDF("event_id", "user_id", "ts").withWatermark("ts", "10 minutes"),
        rIn.toDF().toDF("user_id", "ts", "value").withWatermark("ts", "10 minutes"))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        sunk.put(id, df.collect().toSeq.map(r =>
          (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3))))
        ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try {
      // batch 1: the user-1 purchase and its older click arrive, join emits
      lIn.addData((100L, 1L, ts(10)))
      rIn.addData((1L, ts(0), 1.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // batch 2 lands while the query is DOWN: the :05 click must still
    // join the :10 purchase, which now lives only in checkpointed state
    lIn.addData((101L, 1L, ts(40)))
    rIn.addData((1L, ts(5), 2.0), (1L, ts(30), 8.0))
    val q2 = start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val got = sunk.values.asScala.toSeq.flatten
      assert(got.size == got.toSet.size, s"restart must not duplicate rows: $got")
      assert(got.toSet == Set(
        (100L, 1L, ts(0), 1.0),   // pre-restart emit
        (100L, 1L, ts(5), 2.0),   // post-restart join vs CHECKPOINTED purchase
        (101L, 1L, ts(30), 8.0)), // post-restart both-new join
        s"got $got")
    } finally q2.stop()
  }

  test("streaming run of the same builder matches batch row-for-row") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val rIn = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = joined(
        lIn.toDF().toDF("event_id", "user_id", "ts").withWatermark("ts", "10 minutes"),
        rIn.toDF().toDF("user_id", "ts", "value").withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("interval_join_test")
      .outputMode(OutputMode.Append()).start()
    try {
      lIn.addData(purchases: _*)
      rIn.addData(clicks: _*)
      q.processAllAvailable()
      // advance both watermarks far past every event so all joins emit
      lIn.addData((999L, 99L, ts(59)))
      rIn.addData((99L, ts(59), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("interval_join_test")
        .filter(col("event_id") =!= 999L)
        .as[(Long, Long, java.sql.Timestamp, Double)].collect().toSet
      assert(streamed == expected, s"streaming got $streamed")
      // and it really ran as a stream-stream join with state
      assert(q.lastProgress.stateOperators.nonEmpty,
        "expected a stateful stream-stream join operator")
    } finally q.stop()
  }
}
