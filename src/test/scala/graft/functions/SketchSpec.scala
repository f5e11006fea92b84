package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the KMV distinct sketch that the DuckDB oracle can't see:
  * exactness below k, bounded error above it, and partition-layout
  * invariance (the merge path = the update path). */
class SketchSpec extends SparkSpec {
  import SketchExpressions._

  test("KmvBuffer keeps the k smallest distinct values, sorted") {
    val b = new KmvBuffer(4)
    Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 9L, 5L).foreach(b.insert)
    assert(b.n == 4 && b.hs.take(4).toSeq == Seq(1L, 2L, 3L, 5L))
  }

  test("exact below k: the estimate IS the distinct count") {
    import spark.implicits._
    val df = Seq.tabulate(200)(i => (i % 3, (i % 17).toLong)).toDF("g", "v")
    val got = df.groupBy("g").agg(kmv_distinct(col("v"), 64).as("est"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(17L), s"17 distinct per group, got $got")
  }

  test("above k: relative error within the estimator's bounds") {
    import spark.implicits._
    // 10_000 distinct values, k=64 → stderr ≈ 1/√62 ≈ 12.7%; 4σ ≈ 51%
    val df = (1L to 10000L).toDF("v")
    val est = df.agg(kmv_distinct(col("v"), 64).as("est")).collect()(0).getLong(0)
    assert(est > 4900 && est < 20000, s"est=$est for n=10000 is outside 4σ")
    // k=1024 → stderr ≈ 3.1%; 4σ ≈ 12.5%
    val est2 = df.agg(kmv_distinct(col("v"), 1024).as("est")).collect()(0).getLong(0)
    assert(est2 > 8700 && est2 < 11400, s"est=$est2 for n=10000 at k=1024")
  }

  test("partition-layout invariance: merge path equals update path") {
    import spark.implicits._
    val df = (1L to 5000L).map(i => (i % 7, i)).toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("g").agg(kmv_distinct(col("v"), 64).as("est"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run(df.coalesce(1))
    val b = run(df.repartition(13, col("v")))
    assert(a == b, s"sketch must not depend on partitioning: $a vs $b")
  }

  test("streaming windowed sketch equals the batch aggregate") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(d: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val events = (1 to 400).map(i => (ts(1 + i % 3, i % 24), (i % 97).toLong))
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val q = in.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(kmv_distinct(col("user_id"), 32).as("u"))
      .select(col("w.start").as("w_start"), col("u"))
      .writeStream.format("memory").queryName("kmv_stream_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("kmv_stream_test")
        .as[(java.sql.Timestamp, Long)].collect().toMap
      val batch = events.toDF("ts", "user_id")
        .groupBy(window(col("ts"), "1 day").as("w"))
        .agg(kmv_distinct(col("user_id"), 32).as("u"))
        .select(col("w.start").as("w_start"), col("u"))
        .as[(java.sql.Timestamp, Long)].collect().toMap
      assert(streamed == batch,
        s"sketch state must survive the streaming merge path: $streamed vs $batch")
    } finally q.stop()
  }

  test("hash-sampled quantiles: deterministic sample, near-exact ranks") {
    import spark.implicits._
    // uniform values 0..9999 keyed by id — the md5 sample keeps ~1/8 and
    // its p50/p95 must land near the true quantiles
    val df = (0 until 10000).map(i => (i.toLong, (i * 7919 % 10000).toDouble))
      .toDF("event_id", "value")
    val sampled = df.filter(hash60(col("event_id")) < lit((1L << 60) / 8))
    val n = sampled.count()
    assert(n > 800 && n < 1700, s"~1/8 sample expected, got $n of 10000")
    assert(sampled.coalesce(1).collect().map(_.getLong(0)).toSet ==
      df.repartition(13).filter(hash60(col("event_id")) < lit((1L << 60) / 8))
        .collect().map(_.getLong(0)).toSet,
      "the sample is a function of the ids, not the partitioning")
    val p50 = sampled.stat.approxQuantile("value", Array(0.5), 0.0)(0)
    assert(math.abs(p50 - 5000.0) < 500.0, s"sampled median $p50 far from 5000")
  }

  test("nulls are skipped, not counted") {
    import spark.implicits._
    val df = Seq(Some(1L), None, Some(2L), None, Some(1L)).toDF("v")
    val est = df.agg(kmv_distinct_hashed(
      when(col("v").isNotNull, hash60(col("v"))), 8).as("est"))
      .collect()(0).getLong(0)
    assert(est == 2L, s"two distinct non-null values, got $est")
  }
}
