package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming as-of enrichment: batch parity with the native left-outer
  * as-of join, end-to-end through a real streaming query, and the
  * binary-search pick expression itself. */
class StreamAsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asof_pick: rightmost version at-or-before t; null when none") {
    // literal-array cases, incl. tie on time (max remaining tuple wins)
    val arr = array(
      struct(lit(10L).as("__t"), lit(100L).as("v")),
      struct(lit(20L).as("__t"), lit(200L).as("v")),
      struct(lit(20L).as("__t"), lit(201L).as("v")),
      struct(lit(30L).as("__t"), lit(300L).as("v")))
    def pickAt(t: Long): Option[Long] =
      Seq(1).toDF("i").select(
        graft.functions.AsOfExpressions.asof_pick(arr, lit(t)).getField("v"))
        .as[Option[Long]].head()
    assert(pickAt(5L).isEmpty, "before every version → null")
    assert(pickAt(10L).contains(100L), "inclusive at-or-before")
    assert(pickAt(25L).contains(201L), "tie on 20 picks the max carry")
    assert(pickAt(99L).contains(300L), "after everything → last version")
    // null ELEMENTS (possible when callers build the array outside
    // enrichAsOf) are skipped, not NPE'd — they sort first like null times
    val withNull = sort_array(array(
      when(lit(false), struct(lit(0L).as("__t"), lit(0L).as("v"))),
      struct(lit(10L).as("__t"), lit(100L).as("v"))))
    def pickNullAt(t: Long): Option[Long] =
      Seq(1).toDF("i").select(
        graft.functions.AsOfExpressions.asof_pick(withNull, lit(t)).getField("v"))
        .as[Option[Long]].head()
    assert(pickNullAt(15L).contains(100L), "null element skipped")
    assert(pickNullAt(5L).isEmpty, "null element never matches")
  }

  test("batch parity with native left-outer as-of join, incl. nulls") {
    val left = spark.range(2000).select(
      (pmod(hash(col("id"), lit(1)), lit(7))).cast("long").as("k"),
      (pmod(hash(col("id"), lit(2)), lit(50))).cast("long").as("lts"),
      col("id").as("lid"))
      .withColumn("k", when(col("lid") % 97 === 0, lit(null)).otherwise(col("k")))
      .withColumn("lts", when(col("lid") % 83 === 0, lit(null)).otherwise(col("lts")))
    val right = spark.range(300).select(
      (pmod(hash(col("id"), lit(3)), lit(7))).cast("long").as("k"),
      (pmod(hash(col("id"), lit(4)), lit(50))).cast("long").as("rts"),
      col("id").as("rid"))
      .groupBy("k", "rts").agg(max("rid").as("rid"))
      .withColumn("rts", when(col("rid") % 89 === 0, lit(null)).otherwise(col("rts")))
      .withColumn("rid", when(col("rid") % 7 === 0, lit(null)).otherwise(col("rid")))
    val viaEnrich = StreamAsOf.enrichAsOf(left, right, "k", "lts", "rts", Seq("rid"))
      .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap
    val viaExec = graft.plans.AsOfJoin
      .asofJoinNative(left, right, "k", "lts", "rts", Seq("rid"), joinType = "left")
      .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(viaEnrich.size == viaExec.size)
    assert(viaEnrich == viaExec)
    assert(viaEnrich.values.exists(_.isEmpty) && viaEnrich.values.exists(_.nonEmpty),
      "fixture should exercise both matched and unmatched rows")
  }

  test("asofEnrich op-spec: declarative node enriches through the topology") {
    import graft.core.{BufferSpec, NodeName, OpSpec, StreamNode}
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dim").toString
    Seq(("A", 0L, 100L), ("A", 10L, 110L), ("B", 5L, 50L))
      .toDF("sym", "vts", "price")
      .write.mode("overwrite").parquet(dimDir)
    val spec = OpSpec.Comp(Seq(
      // source payload (key, value, ts, topic) → (sym, ets, value)
      OpSpec.SelectExpr(Seq("key AS sym", "TRY_CAST(value AS BIGINT) AS ets", "value")),
      OpSpec.AsOfEnrich(dimDir, "sym", "ets", "vts", Seq("price"))))
    // spec survives the stored-doc JSON round-trip (control-plane contract)
    val node = StreamNode(NodeName.parse("stream/enrich"), Set("kafka/ev"),
      Some(spec), Some(BufferSpec.Fixed(100)), None)
    assert(NodeSpec.parse(NodeSpec.toJson(node)).contains(node))
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/ev"), Set.empty,
      None, None, None)).isRight)
    assert(topo.addNode(node).isRight)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/out"),
      Set("stream/enrich"), None, None, None)).isRight)
    val mgr = new StreamManager(topo)
    io.publish("kafka/ev", "A", "12")
    io.publish("kafka/ev", "B", "3")
    mgr.applyGraph()
    mgr.processAllAvailable()
    val got = io.collected("out")
      .map(r => (r.getAs[String]("sym"), Option(r.getAs[java.lang.Long]("asof_price")))).toSet
    assert(got == Set(("A", Some(java.lang.Long.valueOf(110L))), ("B", None)),
      s"A@12 sees version 10; B@3 predates every version: $got")
    mgr.stopAll()
  }

  test("enrichAsOf rejects reserved-name collisions instead of clobbering") {
    val dim = Seq(("A", 0L, 100L)).toDF("sym", "vts", "price")
    def expectReject(stream: org.apache.spark.sql.DataFrame, carry: Seq[String]): Unit =
      intercept[IllegalArgumentException] {
        StreamAsOf.enrichAsOf(stream, dim, "sym", "ts", "vts", carry)
      }
    // stream already carries an internal name → would be silently clobbered
    expectReject(Seq(("A", 5L, 0L)).toDF("sym", "ts", "__versions"), Seq("price"))
    expectReject(Seq(("A", 5L, 0L)).toDF("sym", "ts", "__pick"), Seq("price"))
    // stream already has the output name the carry would be written to
    expectReject(Seq(("A", 5L, 0L)).toDF("sym", "ts", "asof_price"), Seq("price"))
    // a carry named __t duplicates the version struct's time field
    val dimT = Seq(("A", 0L, 100L)).toDF("sym", "vts", "__t")
    intercept[IllegalArgumentException] {
      StreamAsOf.enrichAsOf(Seq(("A", 5L)).toDF("sym", "ts"),
        dimT, "sym", "ts", "vts", Seq("__t"))
    }
  }

  test("streaming: events enrich mid-stream against a static dimension") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq( // key, version time, price
      ("A", 0L, 100L), ("A", 10L, 110L), ("B", 5L, 50L)
    ).toDF("sym", "vts", "price")
    val in = MemoryStream[(String, Long, Long)]
    val events = in.toDF().toDF("sym", "ts", "event_id")
    val enriched = StreamAsOf.enrichAsOf(events, dim, "sym", "ts", "vts", Seq("price"))
    val q = enriched.writeStream.format("memory").queryName("asof_enriched")
      .outputMode("append").start()
    try {
      in.addData(("A", 5L, 1L), ("A", 12L, 2L), ("B", 3L, 3L), ("C", 9L, 4L))
      q.processAllAvailable()
      val got = spark.table("asof_enriched")
        .select("event_id", "asof_price").as[(Long, Option[Long])]
        .collect().toMap
      assert(got == Map(1L -> Some(100L), 2L -> Some(110L),
        3L -> None, 4L -> None),
        "latest version at-or-before each event; unmatched keep null")
    } finally q.stop()
  }
}
