package graft.stream

import graft.SparkSpec
import graft.core.{BufferSpec, NodeName, OpSpec, StreamNode}
import graft.registry.FunctionRegistry

/** Golden streaming tests (FIXTURES.md §B): the README pipeline
  * `kafka/input → stream/process → kafka/output`
  * (`/root/reference/ReadMe.org:38-64`) incl. hot-swap semantics, fan-in,
  * fan-out, validation railway, and the affected-subgraph computation. */
class TopologySpec extends SparkSpec {

  private def pipeline(io: MemoryIO): (Topology, StreamManager) = {
    val topo = new Topology(io)
    // kafka/input — source topic node (consumer side of handle-topic)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/input"), Set.empty,
      None, None, None)).isRight)
    // stream/process — the README transducer (comp (map :value) (map inc))
    assert(topo.addNode(StreamNode(NodeName.parse("stream/process"),
      Set("kafka/input"),
      Some(OpSpec.MapExpr("TRY_CAST(value AS DOUBLE) + 1")),
      Some(BufferSpec.Fixed(1000)), None)).isRight)
    // kafka/output — sink topic node (producer side)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/output"),
      Set("stream/process"), None, None, None)).isRight)
    (topo, new StreamManager(topo))
  }

  test("README pipeline: map value+1, null-drop, end-to-end") {
    val io = new MemoryIO(spark)
    val (_, mgr) = pipeline(io)
    io.publish("kafka/input", "k1", "1")
    io.publish("kafka/input", "k2", "41")
    io.publish("kafka/input", "k3", "not-a-number") // → null → force-dropped
    mgr.applyGraph()
    mgr.processAllAvailable()
    val vals = io.collected("output").map(_.getAs[Double]("value")).sorted
    assert(vals == Seq(2.0, 42.0))
    mgr.stopAll()
  }

  test("hot-swap: pre-swap messages incremented, post-swap decremented") {
    val io = new MemoryIO(spark)
    val (_, mgr) = pipeline(io)
    mgr.applyGraph()
    io.publish("kafka/input", "a", "10")
    mgr.processAllAvailable()
    // swap inc → dec (update-stream!): only the affected subgraph restarts
    assert(mgr.updateNode(StreamNode(NodeName.parse("stream/process"),
      Set("kafka/input"),
      Some(OpSpec.MapExpr("TRY_CAST(value AS DOUBLE) - 1")),
      Some(BufferSpec.Fixed(1000)), None)).isRight)
    io.publish("kafka/input", "b", "10")
    mgr.processAllAvailable()
    val vals = io.collected("output").map(_.getAs[Double]("value"))
    assert(vals.contains(11.0), s"pre-swap message must be incremented: $vals")
    assert(vals.contains(9.0), s"post-swap message must be decremented: $vals")
    assert(!vals.contains(10.0) && vals.size == 2,
      s"no reprocessing through the new code: $vals")
    mgr.stopAll()
  }

  test("fan-in (multi-upstream union) and fan-out (two sinks off one node)") {
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    topo.addNode(StreamNode(NodeName.parse("kafka/a"), Set.empty, None, None, None))
    topo.addNode(StreamNode(NodeName.parse("kafka/b"), Set.empty, None, None, None))
    topo.addNode(StreamNode(NodeName.parse("stream/merge"), Set("kafka/a", "kafka/b"),
      Some(OpSpec.Comp(Seq(
        OpSpec.MapExpr("upper(value)"),
        OpSpec.FilterExpr("value != 'DROP'")))),
      Some(BufferSpec.Fixed(10)), None))
    topo.addNode(StreamNode(NodeName.parse("kafka/out1"), Set("stream/merge"), None, None, None))
    topo.addNode(StreamNode(NodeName.parse("kafka/out2"), Set("stream/merge"), None, None, None))
    val mgr = new StreamManager(topo)
    io.publish("kafka/a", "k", "hello")
    io.publish("kafka/b", "k", "drop")
    io.publish("kafka/b", "k", "world")
    mgr.applyGraph()
    mgr.processAllAvailable()
    for (out <- Seq("out1", "out2")) {
      val vals = io.collected(out).map(_.getAs[String]("value")).sorted
      assert(vals == Seq("HELLO", "WORLD"), s"$out got $vals")
    }
    mgr.stopAll()
  }

  test("validation railway: error-handler requires transducer requires buffer") {
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    assert(topo.addNode(StreamNode(NodeName.parse("stream/bad1"), Set.empty,
      Some(OpSpec.MapExpr("value")), None, None)).isLeft,
      "transducer without buffer must fail")
    assert(topo.addNode(StreamNode(NodeName.parse("stream/bad2"), Set.empty,
      None, Some(BufferSpec.Fixed(1)), Some("kafka/errs"))).isLeft,
      "error handler without transducer must fail")
  }

  test("query-graph: affected subgraph is downstream-reachable only") {
    val io = new MemoryIO(spark)
    val (topo, _) = pipeline(io)
    topo.addNode(StreamNode(NodeName.parse("stream/unrelated"), Set("kafka/other"),
      None, None, None))
    assert(topo.downstreamOf("stream/process") == Set("kafka/output"))
    assert(topo.downstreamOf("kafka/input") == Set("stream/process", "kafka/output"))
    assert(topo.downstreamOf("kafka/output") == Set.empty)
  }

  test("named transformer stage resolves through the registry (F1)") {
    val io = new MemoryIO(spark)
    val reg = new FunctionRegistry
    reg.registerTransformer("shout",
      df => df.withColumn("value",
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.upper(org.apache.spark.sql.functions.col("value")),
          org.apache.spark.sql.functions.lit("!"))))
    val topo = new Topology(io, reg)
    topo.addNode(StreamNode(NodeName.parse("kafka/in"), Set.empty, None, None, None))
    topo.addNode(StreamNode(NodeName.parse("stream/x"), Set("kafka/in"),
      Some(OpSpec.Named("shout")), Some(BufferSpec.Fixed(10)), None))
    topo.addNode(StreamNode(NodeName.parse("kafka/out"), Set("stream/x"), None, None, None))
    val mgr = new StreamManager(topo)
    io.publish("kafka/in", "k", "hey")
    mgr.applyGraph()
    mgr.processAllAvailable()
    assert(io.collected("out").map(_.getAs[String]("value")) == Seq("HEY!"))
    mgr.stopAll()
  }
}
