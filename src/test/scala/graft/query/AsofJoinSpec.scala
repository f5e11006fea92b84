package graft.query

import java.sql.Timestamp

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("as-of join picks the latest right row at or before each left ts") {
    val quotes = Seq( // key, ts, price
      ("A", ts(0), 100.0), ("A", ts(10), 110.0), ("B", ts(5), 50.0)
    ).toDF("sym", "qts", "price")
    val trades = Seq(
      ("A", ts(5), 1L),   // → quote@0 (100.0)
      ("A", ts(10), 2L),  // tie: inclusive → quote@10 (110.0)
      ("A", ts(20), 3L),  // → quote@10
      ("B", ts(4), 4L),   // no prior quote → dropped (inner as-of)
      ("B", ts(6), 5L)    // → quote@5
    ).toDF("sym", "tts", "trade_id")
    val got = Relational.asofJoin(trades, quotes, "sym", "tts", "qts", Seq("price"))
      .select("trade_id", "asof_price").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 100.0, 2L -> 110.0, 3L -> 110.0, 5L -> 50.0))
  }

  test("plan shape: exactly one shuffle (no join explosion)") {
    val left = spark.range(100).selectExpr("id % 5 AS k", "id AS lts", "id AS v")
    val right = spark.range(20).selectExpr("id % 5 AS k", "id AS rts", "id * 10 AS payload")
    val df = Relational.asofJoin(left, right, "k", "lts", "rts", Seq("payload"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not produce a join operator:\n$plan")
    // one shuffle stage: each union branch writes to the same key exchange
    // (≤ 2 Exchange operators, never a per-match join explosion)
    assert("Exchange".r.findAllIn(plan).length <= 2,
      s"single shuffle stage on the key:\n$plan")
  }
}
