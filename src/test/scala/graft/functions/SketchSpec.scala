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

  // --- count-min sketch ---

  private def cmsProbe(data: Seq[String], probes: Seq[String],
                       depth: Int, width: Int,
                       reshuffle: Boolean = false): Map[String, Long] = {
    import spark.implicits._
    val base = data.toDF("v")
    val df = if (reshuffle) base.repartition(13, col("v")) else base.coalesce(1)
    val sk = df.agg(cms_sketch(col("v"), depth, width).as("sk"))
    probes.toDF("term").crossJoin(broadcast(sk))
      .select(col("term"), cmsEstimate(col("sk"), col("term"), depth, width).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("CMS estimates are one-sided: est >= true count, exact when uncollided") {
    val data = Seq.fill(100)("hot") ++ Seq.fill(10)("warm") ++ Seq("cold")
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = cmsProbe(data, Seq("hot", "warm", "cold", "absent"), 4, 512)
    truth.foreach { case (t, c) =>
      assert(est(t) >= c, s"CMS under-counted $t: ${est(t)} < $c")
    }
    // 3 distinct values in a 512-wide row: collisions need md5("j:a")%512 ==
    // md5("j:b")%512 in EVERY depth row — overwhelmingly absent, so exact
    assert(est("hot") == 100L && est("warm") == 10L && est("cold") == 1L,
      s"uncollided estimates must be exact: $est")
    assert(est("absent") == 0L, s"absent term read collision mass at width 512: $est")
  }

  test("CMS collision inflation is bounded even at tiny width") {
    // width 4, depth 4: heavy collisions guaranteed; the min-over-depth
    // estimate must stay within true + total mass (trivial upper) and
    // still dominate the true count
    val data = (0 until 300).map(i => s"t${i % 30}")
    val est = cmsProbe(data, Seq("t0", "t7", "t29"), 4, 4)
    est.foreach { case (t, e) =>
      assert(e >= 10L, s"$t true count 10, CMS said $e")
      assert(e <= 300L, s"$t estimate $e exceeds the total stream mass")
    }
  }

  test("CMS is partition-layout invariant: merge path equals update path") {
    val data = (0 until 2000).map(i => s"w${i % 53}")
    val probes = Seq("w0", "w13", "w52", "nope")
    val a = cmsProbe(data, probes, 4, 64)
    val b = cmsProbe(data, probes, 4, 64, reshuffle = true)
    assert(a == b, s"sketch must not depend on partitioning: $a vs $b")
  }

  test("CMS per-group sketches stay independent") {
    import spark.implicits._
    val df = (0 until 600).map(i => (i % 2, s"g${i % 2}_tok${i % 5}")).toDF("g", "v")
    val sk = df.groupBy("g").agg(cms_sketch(col("v"), 4, 256).as("sk"))
    val got = sk.select(col("g"),
        cmsEstimate(col("sk"), concat(lit("g0_tok"), lit("0")), 4, 256).as("e"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got(0) == 60L, s"group 0 holds 60 of g0_tok0, got ${got(0)}")
    assert(got(1) == 0L, s"group 1 never saw g0_tok0, got ${got(1)}")
  }

  test("streaming windowed CMS equals the batch aggregate") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(d: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val events = (1 to 300).map(i => (ts(1 + i % 2, i % 24), s"tok${i % 9}"))
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(cms_sketch(col("v"), 4, 64).as("sk"))
      .select(col("w.start").as("w_start"),
        cmsEstimate(col("sk"), lit("tok3"), 4, 64).as("est"))
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val q = agg(in.toDF().toDF("ts", "v").withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("cms_stream_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("cms_stream_test")
        .as[(java.sql.Timestamp, Long)].collect().toMap
      val batch = agg(events.toDF("ts", "v")).as[(java.sql.Timestamp, Long)]
        .collect().toMap
      assert(streamed == batch,
        s"CMS state must survive the streaming merge path: $streamed vs $batch")
      assert(batch.values.sum == events.count(_._2 == "tok3").toLong,
        "per-window estimates must sum to the true tok3 count (uncollided)")
    } finally q.stop()
  }

  test("CMS rejects out-of-range cells loudly") {
    import spark.implicits._
    val df = Seq(1L).toDF("v")
    val bad = org.apache.spark.sql.graft.ColumnBridge.column(
      CmsSketch(org.apache.spark.sql.graft.ColumnBridge.expression(
        array(lit(99L), lit(0L), lit(0L), lit(0L))), 4, 8).toAggregateExpression())
    val e = intercept[Exception](df.agg(bad.as("sk")).collect())
    assert(e.getMessage != null)
  }
}
