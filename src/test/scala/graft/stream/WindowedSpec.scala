package graft.stream

import java.sql.Timestamp

import graft.SparkSpec
import graft.core.{BufferSpec, NodeName, OpSpec, StreamNode}

/** Event-time windowed aggregation + streaming dedup op-specs — the
  * Structured-Streaming capabilities the reference's per-element transducer
  * model lacks (SURVEY.md §2.6), exposed as first-class node specs. */
class WindowedSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumbling window count with watermark emits finalized windows") {
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    topo.addNode(StreamNode(NodeName.parse("kafka/ev"), Set.empty, None, None, None))
    topo.addNode(StreamNode(NodeName.parse("stream/agg"), Set("kafka/ev"),
      Some(OpSpec.WindowAgg("ts", "10 minutes", None, "5 minutes",
        Seq("key"), Seq("count(*) AS n"))),
      Some(BufferSpec.Fixed(1000)), None))
    topo.addNode(StreamNode(NodeName.parse("kafka/out"), Set("stream/agg"), None, None, None))
    val mgr = new StreamManager(topo)
    io.publishAt("kafka/ev", "a", "1", ts(1))
    io.publishAt("kafka/ev", "a", "2", ts(4))
    io.publishAt("kafka/ev", "b", "3", ts(7))
    mgr.applyGraph()
    mgr.processAllAvailable()
    // watermark pusher: event far past the first window finalizes it
    io.publishAt("kafka/ev", "a", "9", ts(31))
    mgr.processAllAvailable()
    io.publishAt("kafka/ev", "z", "x", ts(55)) // push watermark again
    mgr.processAllAvailable()
    val rows = io.collected("out")
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("n"))).toSet
    assert(rows.contains(("a", 2L)), s"key a had 2 events in 10:00-10:10: $rows")
    assert(rows.contains(("b", 1L)), s"key b had 1 event: $rows")
    mgr.stopAll()
  }

  test("streaming dedupe-by-key drops repeats within the watermark") {
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    topo.addNode(StreamNode(NodeName.parse("kafka/raw"), Set.empty, None, None, None))
    topo.addNode(StreamNode(NodeName.parse("stream/uniq"), Set("kafka/raw"),
      Some(OpSpec.DedupeKeys(Seq("value"), "ts", "10 minutes")),
      Some(BufferSpec.Fixed(1000)), None))
    topo.addNode(StreamNode(NodeName.parse("kafka/clean"), Set("stream/uniq"), None, None, None))
    val mgr = new StreamManager(topo)
    io.publishAt("kafka/raw", "k1", "doc-A", ts(1))
    io.publishAt("kafka/raw", "k2", "doc-A", ts(2)) // exact repeat payload
    io.publishAt("kafka/raw", "k3", "doc-B", ts(3))
    io.publishAt("kafka/raw", "k4", "doc-A", ts(4)) // repeat again
    mgr.applyGraph()
    mgr.processAllAvailable()
    val vals = io.collected("clean").map(_.getAs[String]("value")).sorted
    assert(vals == Seq("doc-A", "doc-B"), s"repeats dropped: $vals")
    mgr.stopAll()
  }

  test("session windows merge while gaps stay under the gap; close on watermark") {
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    topo.addNode(StreamNode(NodeName.parse("kafka/ev"), Set.empty, None, None, None))
    topo.addNode(StreamNode(NodeName.parse("stream/sess"), Set("kafka/ev"),
      Some(OpSpec.SessionAgg("ts", "5 minutes", "1 minute",
        Seq("key"), Seq("count(*) AS n"))),
      Some(BufferSpec.Fixed(1000)), None))
    topo.addNode(StreamNode(NodeName.parse("kafka/out"), Set("stream/sess"), None, None, None))
    val mgr = new StreamManager(topo)
    // key a: events at 1, 4, 7 chain into ONE session (gaps < 5m);
    // the event at 20 starts a second session
    for (m <- Seq(1, 4, 7, 20)) io.publishAt("kafka/ev", "a", s"$m", ts(m))
    mgr.applyGraph()
    mgr.processAllAvailable()
    io.publishAt("kafka/ev", "z", "x", ts(55)) // watermark pusher finalizes
    mgr.processAllAvailable()
    val rows = io.collected("out")
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("n")))
    assert(rows.contains(("a", 3L)), s"chained session of 3 events: $rows")
    assert(rows.contains(("a", 1L)), s"separate later session: $rows")
    mgr.stopAll()
  }

  test("windowAgg + dedupe specs round-trip through NodeSpec JSON") {
    val w = OpSpec.WindowAgg("ts", "10 minutes", Some("5 minutes"), "1 minute",
      Seq("key"), Seq("count(*) AS n", "sum(CAST(value AS DOUBLE)) AS total"))
    val d = OpSpec.DedupeKeys(Seq("value"), "ts", "10 minutes")
    val s = OpSpec.SessionAgg("ts", "5 minutes", "1 minute",
      Seq("key"), Seq("count(*) AS n"))
    for (spec <- Seq(w, d, s)) {
      val n = StreamNode(NodeName.parse("stream/x"), Set("kafka/in"),
        Some(spec), Some(BufferSpec.Fixed(5)), None)
      assert(NodeSpec.parse(NodeSpec.toJson(n)).contains(n), NodeSpec.toJson(n))
    }
    // a sessionAgg without groupBy must fail the parse railway: streaming
    // forbids GLOBAL session-window aggregation, so the node would deploy
    // fine and then die at query start
    val noKeys = """{"name":"stream/x","upstream":["kafka/in"],"buffer":5,
      "transducer":{"sessionAgg":{"ts":"ts","gap":"5 minutes",
      "watermark":"1 minute","aggs":["count(*) AS n"]}}}"""
    assert(NodeSpec.parse(noKeys).isEmpty,
      "keyless sessionAgg must be rejected at parse time")
  }
}
