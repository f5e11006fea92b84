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

  test("F7 ->let: named definitions scope over the body, locals drop from the output") {
    // the reference's ->let doc example (`utils/common.clj:74-110`):
    //   (->let (defn plus-2 [a] (+ 2 a))
    //          (fn [b] (/ (plus-2 b) 3)))
    // declaratively: bind plus2, use it in the final expression — plus a
    // NON-LINEAR use (the same binding feeding a filter AND the map),
    // which is exactly what a let gives over a pipeline
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/input"), Set.empty,
      None, None, None)).isRight)
    val spec = OpSpec.LetExpr(
      bindings = Seq("plus2" -> "TRY_CAST(value AS DOUBLE) + 2",
        // later bindings see earlier ones (sequential let* scoping)
        "third" -> "plus2 / 3"),
      body = Seq(
        OpSpec.FilterExpr("plus2 > 10"), // non-linear reuse of a binding
        OpSpec.MapExpr("third")))
    val node = StreamNode(NodeName.parse("stream/let"), Set("kafka/input"),
      Some(spec), Some(BufferSpec.Fixed(100)), None)
    // the whole let round-trips through the stored-doc JSON (bindings stay
    // ORDERED — an array, not an object)
    assert(NodeSpec.parse(NodeSpec.toJson(node)).contains(node))
    assert(topo.addNode(node).isRight)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/out"),
      Set("stream/let"), None, None, None)).isRight)
    val mgr = new StreamManager(topo)
    io.publish("kafka/input", "k1", "40") // (40+2)=42 > 10 → 42/3 = 14.0
    io.publish("kafka/input", "k2", "1")  // (1+2)=3 ≤ 10 → filtered
    mgr.applyGraph()
    mgr.processAllAvailable()
    val rows = io.collected("out")
    assert(rows.map(_.getAs[Double]("value")) == Seq(14.0))
    // locals went out of scope: neither binding leaks into the output row
    assert(!rows.head.schema.fieldNames.contains("plus2") &&
      !rows.head.schema.fieldNames.contains("third"),
      s"let locals must not leak: ${rows.head.schema.fieldNames.mkString(",")}")
    mgr.stopAll()

    // shadow detection is case-insensitive like Spark's resolver: a
    // binding "Value" REPLACES input column `value` (withColumn is
    // case-insensitive), so it is a shadow that must SURVIVE — dropping it
    // would delete the input column outright
    import spark.implicits._
    val shadowed = topo.applyOpSpec(Seq("x").toDF("value"),
      OpSpec.LetExpr(Seq("Value" -> "upper(value)"), Seq(OpSpec.FilterExpr("true"))))
    assert(shadowed.columns.exists(_.equalsIgnoreCase("value")),
      s"case-shadowed input column must survive: ${shadowed.columns.mkString(",")}")
    assert(shadowed.as[String].collect().toSeq == Seq("X"))
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

  /** Listener-bus delivery is async: poll until the counter settles. */
  private def awaitDropped(topo: Topology, node: String, want: Long): Long = {
    val deadline = System.currentTimeMillis() + 10000
    while (topo.droppedRows(node) != want && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    topo.droppedRows(node)
  }

  test("dropping buffer keeps first x per batch partition and counts drops (T9)") {
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    topo.addNode(StreamNode(NodeName.parse("kafka/in"), Set.empty, None, None, None))
    topo.addNode(StreamNode(NodeName.parse("stream/tight"), Set("kafka/in"),
      Some(OpSpec.MapExpr("value")), Some(BufferSpec.Dropping(3)), None))
    topo.addNode(StreamNode(NodeName.parse("kafka/out"), Set("stream/tight"), None, None, None))
    val mgr = new StreamManager(topo)
    try {
      // one block = one partition: 10 rows hit a capacity-3 dropping buffer
      io.publishBatch("kafka/in", (1 to 10).map(i => (s"k$i", s"v$i")))
      mgr.applyGraph()
      mgr.processAllAvailable()
      val vals = io.collected("out").map(_.getAs[String]("value"))
      assert(vals == Seq("v1", "v2", "v3"), s"dropping keeps the FIRST x: $vals")
      assert(awaitDropped(topo, "stream/tight", 7L) == 7L)
    } finally mgr.stopAll()
  }

  test("sliding buffer keeps last x per batch partition and counts drops (T8)") {
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    topo.addNode(StreamNode(NodeName.parse("kafka/in"), Set.empty, None, None, None))
    topo.addNode(StreamNode(NodeName.parse("stream/slide"), Set("kafka/in"),
      Some(OpSpec.MapExpr("value")), Some(BufferSpec.Sliding(2)), None))
    topo.addNode(StreamNode(NodeName.parse("kafka/out"), Set("stream/slide"), None, None, None))
    val mgr = new StreamManager(topo)
    try {
      io.publishBatch("kafka/in", (1 to 5).map(i => (s"k$i", s"v$i")))
      mgr.applyGraph()
      mgr.processAllAvailable()
      val vals = io.collected("out").map(_.getAs[String]("value"))
      assert(vals == Seq("v4", "v5"), s"sliding keeps the LAST x: $vals")
      assert(awaitDropped(topo, "stream/slide", 3L) == 3L)
      // reset forgets the node's counters (a re-created same-named node
      // must not inherit a discarded topology's totals)
      DropMetrics.forSession(spark).reset("stream/slide")
      assert(topo.droppedRows("stream/slide") == 0L)
    } finally mgr.stopAll()
  }

  test("DropMetrics.release detaches the session listener deterministically") {
    val before = DropMetrics.forSession(spark)
    assert(DropMetrics.forSession(spark) eq before) // cached per session
    DropMetrics.release(spark)
    val after = DropMetrics.forSession(spark)
    assert(!(after eq before), "release must drop the cached instance")
    DropMetrics.release(spark)
  }

  test("hot-swap of a node WITH an error sink restarts its dead-letter query too") {
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    topo.addNode(StreamNode(NodeName.parse("kafka/in"), Set.empty, None, None, None))
    def procNode(e: String) = StreamNode(NodeName.parse("stream/proc"), Set("kafka/in"),
      Some(OpSpec.MapExpr(e)), Some(BufferSpec.Fixed(100)), Some("errs"))
    topo.addNode(procNode("TRY_CAST(value AS DOUBLE) + 1"))
    topo.addNode(StreamNode(NodeName.parse("kafka/out"), Set("stream/proc"), None, None, None))
    val mgr = new StreamManager(topo)
    try {
      io.publish("kafka/in", "a", "1")
      io.publish("kafka/in", "b", "oops")
      mgr.applyGraph()
      mgr.processAllAvailable()
      assert(io.collected("errs").map(_.getAs[String]("key")) == Seq("b"),
        "failed row lands on the error sink")
      // the swap must stop the companion #errors query as well — otherwise
      // starting the new one fails on the duplicate active query name
      val swapped = mgr.updateNode(procNode("TRY_CAST(value AS DOUBLE) - 1"))
      assert(swapped.isRight, s"hot-swap with errorSink failed: $swapped")
      io.publish("kafka/in", "c", "10")
      io.publish("kafka/in", "d", "bad")
      mgr.processAllAvailable()
      val outVals = io.collected("out").map(_.getAs[Double]("value"))
      assert(outVals.contains(2.0) && outVals.contains(9.0), s"got $outVals")
      assert(io.collected("errs").map(_.getAs[String]("key")).sorted == Seq("b", "d"),
        "post-swap failures keep flowing to the restarted error sink")
    } finally mgr.stopAll()
    assert(mgr.runningQueries.isEmpty, "stopAll must stop companion queries too")
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

  test("validation: non-positive buffer sizes are rejected, not deployed") {
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    for (buf <- Seq(BufferSpec.Fixed(0), BufferSpec.Sliding(0),
                    BufferSpec.Dropping(-1))) {
      assert(topo.addNode(StreamNode(NodeName.parse("stream/bad"), Set.empty,
        Some(OpSpec.MapExpr("value")), Some(buf), None)).isLeft,
        s"$buf must fail validation (it would crash the executor)")
    }
  }

  test("addNode rejects a cycle at registration (bootstrap replay safety)") {
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    assert(topo.addNode(StreamNode(NodeName.parse("stream/a"), Set("stream/b"),
      Some(OpSpec.MapExpr("value")), Some(BufferSpec.Fixed(10)), None)).isRight,
      "missing upstream is fine at registration (create-before-upstream order)")
    // b -> a -> b would close a cycle: rejected by the railway, NOT
    // registered (a later buildPlan must not be the first thing to notice)
    val res = topo.addNode(StreamNode(NodeName.parse("stream/b"), Set("stream/a"),
      Some(OpSpec.MapExpr("value")), Some(BufferSpec.Fixed(10)), None))
    assert(res.isLeft, s"cycle must fail addNode: $res")
    assert(topo.node("stream/b").isEmpty, "the cyclic node is not registered")
  }

  test("streaming quality gate: op-spec filters on text_quality_score") {
    // the SQL surface GraftApp registers at boot, usable from declarative
    // filter specs — a streaming corpus-quality gate in one line of JSON
    graft.GraftExtensions.functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/docs"), Set.empty,
      None, None, None)).isRight)
    assert(topo.addNode(StreamNode(NodeName.parse("stream/gate"), Set("kafka/docs"),
      Some(OpSpec.FilterExpr("text_quality_score(value) >= 0.55")),
      Some(BufferSpec.Fixed(100)), None)).isRight)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/kept"),
      Set("stream/gate"), None, None, None)).isRight)
    val mgr = new StreamManager(topo)
    io.publish("kafka/docs", "good", "the quick brown fox jumps over the " +
      "lazy dog and then runs far away into the deep green forest to hide")
    io.publish("kafka/docs", "junk", "!!! ??? ;;; ::: ,,, (((")
    mgr.applyGraph()
    mgr.processAllAvailable()
    val kept = io.collected("kept").map(_.getAs[String]("key"))
    assert(kept == Seq("good"), s"only the prose passes the gate: $kept")
    mgr.stopAll()
  }

  test("bootstrap rejects stored cyclic nodes loudly instead of crashing startup") {
    val io = new MemoryIO(spark)
    val store = new graft.store.DocumentStore(spark,
      java.nio.file.Files.createTempDirectory("graft-boot").toString + "/db")
    def nodeDoc(name: String, up: String): String = NodeSpec.toJson(
      StreamNode(NodeName.parse(name), Set(up),
        Some(OpSpec.MapExpr("value")), Some(BufferSpec.Fixed(10)), None))
    store.put(":stream/a", nodeDoc("stream/a", "stream/b"))
    store.put(":stream/b", nodeDoc("stream/b", "stream/a")) // closes a cycle
    val topo = new Topology(io)
    val mgr = new StreamManager(topo)
    try {
      mgr.bootstrapFromStore(store) // must not throw
      // exactly one of the pair registered (replay order decides which);
      // the rejected one is logged, startup survives
      val registered = Seq("stream/a", "stream/b").count(topo.node(_).isDefined)
      assert(registered == 1, s"one node of the cycle registers, got $registered")
    } finally mgr.stopAll()
  }

  test("KafkaIO adopts a legacy-escape checkpoint dir exactly once") {
    val root = java.nio.file.Files.createTempDirectory("graft-ckpt-mig")
    val io = new KafkaIO(spark, "broker:9092", root.toString)
    // durable state committed under the old '/'→'_' scheme
    val legacy = root.resolve("kafka_in_a")     // node "kafka/in_a", old escape
    java.nio.file.Files.createDirectories(legacy.resolve("offsets"))
    java.nio.file.Files.write(legacy.resolve("metadata"), "id".getBytes)
    val current = "kafka_sin_ua"                // same node, injective escape
    io.migrateCheckpoint("kafka_in_a", current)
    assert(java.nio.file.Files.exists(root.resolve(current).resolve("metadata")),
      "legacy checkpoint adopted under the current name")
    assert(!java.nio.file.Files.exists(legacy), "legacy dir renamed away")
    // second call (and a fresh legacy dir appearing later) must NOT clobber
    // the adopted checkpoint
    java.nio.file.Files.createDirectories(legacy)
    java.nio.file.Files.write(legacy.resolve("stale"), "x".getBytes)
    io.migrateCheckpoint("kafka_in_a", current)
    assert(java.nio.file.Files.exists(root.resolve(current).resolve("metadata")),
      "existing current checkpoint wins; no second adoption")
  }

  test("legacy checkpoint whose offsets track a FOREIGN topic is refused") {
    val root = java.nio.file.Files.createTempDirectory("graft-ckpt-src")
    val io = new KafkaIO(spark, "broker:9092", root.toString)
    // a prior topology's query committed offsets for kafka/old_feed under a
    // name the CURRENT topology's query also maps to — name-unambiguous,
    // but semantically someone else's offsets
    val legacy = root.resolve("kafka_in_a")
    java.nio.file.Files.createDirectories(legacy.resolve("offsets"))
    java.nio.file.Files.write(legacy.resolve("offsets").resolve("7"),
      """v1 {"kafka/old_feed":{"0":42}}""".getBytes)
    io.migrateCheckpoint("kafka_in_a", "kafka_sin_ua",
      expectedSources = Set("kafka/in_a"))
    assert(java.nio.file.Files.exists(legacy),
      "mismatched-source legacy dir is preserved for audit, not adopted")
    assert(!java.nio.file.Files.exists(root.resolve("kafka_sin_ua")),
      "the adopting query starts from a fresh checkpoint instead")

    // the same dir IS adopted when the offsets really track the query's source
    java.nio.file.Files.write(legacy.resolve("offsets").resolve("8"),
      """v1 {"kafka/in_a":{"0":99}}""".getBytes)
    io.migrateCheckpoint("kafka_in_a", "kafka_sin_ua",
      expectedSources = Set("kafka/in_a"))
    assert(java.nio.file.Files.exists(root.resolve("kafka_sin_ua")),
      "source-matched offsets are safe to resume")

    // no committed offsets at all → nothing to resume wrongly → adopt
    val empty = root.resolve("kafka_empty")
    java.nio.file.Files.createDirectories(empty.resolve("offsets"))
    io.migrateCheckpoint("kafka_empty", "kafka_sempty",
      expectedSources = Set("kafka/whatever"))
    assert(java.nio.file.Files.exists(root.resolve("kafka_sempty")))
  }

  test("ambiguous legacy checkpoint (non-injective collision) is not adopted") {
    val root = java.nio.file.Files.createTempDirectory("graft-ckpt-amb")
    val io = new KafkaIO(spark, "broker:9092", root.toString)
    val topo = new Topology(io)
    // A REAL collision under the old '/'→'_' scheme: sink "kafka/a_errors"
    // commits its main query's checkpoint as "kafka_a_errors", and node
    // "kafka/a" WITH AN ERROR HANDLER commits its dead-letter query under
    // the very same name. Claims are counted per query a node actually
    // runs — a node without an error handler claims no '_errors' dir.
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/in"),
      Set.empty, None, None, None)).isRight)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/a"),
      Set("kafka/in"), Some(OpSpec.MapExpr("value")),
      Some(BufferSpec.Fixed(10)), Some("kafka/dead"))).isRight)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/a_errors"),
      Set("kafka/in"), None, None, None)).isRight)
    val legacy = root.resolve("kafka_a_errors")
    java.nio.file.Files.createDirectories(legacy.resolve("offsets"))
    java.nio.file.Files.write(legacy.resolve("metadata"), "id".getBytes)
    val mgr = new StreamManager(topo)
    mgr.adoptCheckpoint("kafka/a", "_errors")  // ambiguous → skipped
    assert(java.nio.file.Files.exists(legacy.resolve("metadata")),
      "ambiguous legacy dir must be left in place, not claimed by one query")
    assert(!java.nio.file.Files.exists(root.resolve("kafka_sa_errors")) &&
      !java.nio.file.Files.exists(root.resolve("kafka_sa_uerrors")),
      "no current-name dir materializes from an ambiguous adoption")
    mgr.adoptCheckpoint("kafka/a_errors")      // same dir, other claimant
    assert(java.nio.file.Files.exists(legacy.resolve("metadata")),
      "the sink side of the collision must not claim it either")
    // an error-handler-LESS "kafka/b" doesn't run an '_errors' query, so
    // sink "kafka/b_errors" is the ONLY claimant of legacy "kafka_b_errors"
    // and adoption proceeds (the over-counting regression: counting every
    // node for both names refused this one)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/b"),
      Set("kafka/in"), None, None, None)).isRight)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/b_errors"),
      Set("kafka/in"), None, None, None)).isRight)
    val legacyB = root.resolve("kafka_b_errors")
    java.nio.file.Files.createDirectories(legacyB.resolve("offsets"))
    java.nio.file.Files.write(legacyB.resolve("metadata"), "id".getBytes)
    mgr.adoptCheckpoint("kafka/b_errors")
    assert(java.nio.file.Files.exists(root.resolve("kafka_sb_uerrors").resolve("metadata")),
      "unambiguous legacy checkpoint still adopted")
  }

  test("pre-rename stateful checkpoint (_st<hex>) is adopted under _t<hex> (ADVICE r11)") {
    val root = java.nio.file.Files.createTempDirectory("graft-ckpt-st")
    val io = new KafkaIO(spark, "broker:9092", root.toString)
    val topo = new Topology(io)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/in"),
      Set.empty, None, None, None)).isRight)
    // stateful node: windowAgg gives it a non-empty stateful signature
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/agg"),
      Set("kafka/in"),
      Some(OpSpec.WindowAgg("ts", "10 seconds", None, "5 seconds",
        Seq("key"), Seq("count(1) AS n"))),
      Some(BufferSpec.Fixed(10)), None)).isRight)
    val mgr = new StreamManager(topo)
    val ckpt = mgr.checkpointFor("kafka/agg")
    assert(ckpt.startsWith("kafka_sagg_t") && !ckpt.contains("_st"),
      s"stateful checkpoint uses the unforgeable _t suffix: $ckpt")
    // the same query's checkpoint as committed by a pre-rename deployment
    val hex = ckpt.stripPrefix("kafka_sagg_t")
    val old = root.resolve("kafka_sagg_st" + hex)
    java.nio.file.Files.createDirectories(old.resolve("offsets"))
    java.nio.file.Files.write(old.resolve("offsets").resolve("3"),
      """v1 {"kafka/in":{"0":7}}""".getBytes)
    java.nio.file.Files.write(old.resolve("metadata"), "id".getBytes)
    mgr.adoptStatefulRename("kafka/agg", "", ckpt)
    assert(java.nio.file.Files.exists(root.resolve(ckpt).resolve("metadata")),
      "pre-rename stateful checkpoint adopted under the new suffix")
    assert(!java.nio.file.Files.exists(old), "old _st dir renamed away")
    // idempotent: a second call (stray old dir reappearing) never clobbers
    java.nio.file.Files.createDirectories(old)
    mgr.adoptStatefulRename("kafka/agg", "", ckpt)
    assert(java.nio.file.Files.exists(root.resolve(ckpt).resolve("metadata")))
    // an _st dir whose offsets track a FOREIGN topic is refused (the
    // forged-collision case the rename fixed)
    val ckpt2 = "kafka_sother_t" + hex
    val old2 = root.resolve("kafka_sother_st" + hex)
    java.nio.file.Files.createDirectories(old2.resolve("offsets"))
    java.nio.file.Files.write(old2.resolve("offsets").resolve("1"),
      """v1 {"kafka/elsewhere":{"0":1}}""".getBytes)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/other"),
      Set("kafka/in"),
      Some(OpSpec.WindowAgg("ts", "10 seconds", None, "5 seconds",
        Seq("key"), Seq("count(1) AS n"))),
      Some(BufferSpec.Fixed(10)), None)).isRight)
    mgr.adoptStatefulRename("kafka/other", "", ckpt2)
    assert(java.nio.file.Files.exists(old2), "foreign-source _st dir preserved")
    assert(!java.nio.file.Files.exists(root.resolve(ckpt2)),
      "no adoption from a checkpoint tracking someone else's sources")
  }

  test("updateNode rejects cycles BEFORE stopping sinks; bad plans are isolated") {
    val io = new MemoryIO(spark)
    val (topo, mgr) = pipeline(io)
    try {
      // an independent sink chain that must survive everything below
      assert(topo.addNode(StreamNode(NodeName.parse("kafka/aux"),
        Set("kafka/input"), None, None, None)).isRight)
      io.publish("kafka/input", "k", "1")
      mgr.applyGraph()
      mgr.processAllAvailable()
      val before = mgr.runningQueries.keySet
      // cycle: process -> output -> process — Left, running graph untouched
      val cyc = StreamNode(NodeName.parse("stream/process"),
        Set("kafka/input", "kafka/output"),
        Some(OpSpec.MapExpr("value")), Some(BufferSpec.Fixed(10)), None)
      assert(mgr.updateNode(cyc).isLeft, "cycle must fail the railway")
      assert(mgr.runningQueries.keySet == before)
      // a sink updated to reference a node that doesn't exist: the update
      // lands (create-before-upstream is the normal management order), the
      // unbuildable sink is SKIPPED with a warning, nothing throws, and no
      // unrelated query is harmed
      val dangling = StreamNode(NodeName.parse("kafka/output"), Set("stream/typo"),
        None, None, None)
      val res = mgr.updateNode(dangling)
      assert(res.isRight, s"dangling upstream must not fail the railway: $res")
      assert(!mgr.runningQueries.contains("kafka/output"),
        "the unbuildable sink is down (skipped), not throwing")
      assert(mgr.runningQueries.contains("kafka/aux"),
        "unrelated queries keep running")
    } finally mgr.stopAll()
  }

  test("NodeSpec.parse is strict on present-but-malformed fields") {
    // typo'd op key: would otherwise deploy a PASS-EVERYTHING node
    assert(NodeSpec.parse(
      """{"name":"stream/x","upstream":["kafka/in"],"transducer":{"fliter":"v>0"},"buffer":10}""").isEmpty)
    // string upstream: would otherwise silently become a SOURCE node
    assert(NodeSpec.parse(
      """{"name":"stream/x","upstream":"kafka/in"}""").isEmpty)
    // malformed buffer object
    assert(NodeSpec.parse(
      """{"name":"stream/x","buffer":{"bounded":3}}""").isEmpty)
    // absent optional fields still parse
    assert(NodeSpec.parse("""{"name":"stream/x"}""").isDefined)
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

  test("audio-admission node: real WAV decode gates silence out of the stream") {
    import graft.ext.{Codecs, Multimodal}
    val io = new MemoryIO(spark)
    val reg = new FunctionRegistry
    // registry function = the codec-backed admission transformer (F1 + T3
    // + the r12 codec family composed in the streaming plane)
    reg.registerTransformer("audio_admit", Multimodal.audioAdmit(minRmsQ6 = 1000000L))
    val topo = new Topology(io, reg)
    topo.addNode(StreamNode(NodeName.parse("kafka/voice"), Set.empty, None, None, None))
    topo.addNode(StreamNode(NodeName.parse("stream/vad"), Set("kafka/voice"),
      Some(OpSpec.Named("audio_admit")), Some(BufferSpec.Fixed(100)), None))
    topo.addNode(StreamNode(NodeName.parse("kafka/kept"), Set("stream/vad"), None, None, None))
    val mgr = new StreamManager(topo)
    val b64 = java.util.Base64.getEncoder
    // loud sawtooth (rms ≈ 18.9k·1e6 q6), digital silence (all-zero PCM),
    // and a corrupt payload — only the loud one may pass
    io.publish("kafka/voice", "loud", b64.encodeToString(Codecs.synthWav(8000, 200, 1000, 0)))
    io.publish("kafka/voice", "silent", b64.encodeToString(Codecs.synthWav(8000, 200, 0, 32768)))
    io.publish("kafka/voice", "junk", "bm90LWEtd2F2") // base64("not-a-wav")
    mgr.applyGraph()
    mgr.processAllAvailable()
    val kept = io.collected("kept")
    assert(kept.map(_.getAs[String]("key")) == Seq("loud"),
      s"only the loud clip survives the VAD gate: ${kept.map(_.getAs[String]("key"))}")
    val rms = kept.head.getAs[Long]("rms_q6")
    val expect = Codecs.decodeWav(Codecs.synthWav(8000, 200, 1000, 0)).get.rmsQ6
    assert(rms == expect, s"admitted row carries the decoded RMS: $rms vs $expect")
    assert(kept.head.getAs[Long]("duration_ms") == 25L) // 200 / 8000 s
    mgr.stopAll()
  }

  test("intervalJoin op-spec: declarative stream-stream correlation node") {
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 01:$m%02d:00")
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/purchases"),
      Set.empty, None, None, None)).isRight)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/clicks"),
      Set.empty, None, None, None)).isRight)
    val spec = OpSpec.IntervalJoin("kafka/clicks", "key",
      "15 minutes", "0 seconds", "10 minutes", Seq("value"))
    assert(topo.addNode(StreamNode(NodeName.parse("stream/attrib"),
      Set("kafka/purchases"), Some(spec), Some(BufferSpec.Fixed(1000)), None)).isRight)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/attributed"),
      Set("stream/attrib"), None, None, None)).isRight)
    // the join dep is a REAL graph edge: clicks' downstream closure
    // includes the join and its sink; its sources feed the checkpoint
    assert(topo.downstreamOf("kafka/clicks") ==
      Set("stream/attrib", "kafka/attributed"))
    assert(topo.sourceTopics("stream/attrib") ==
      Set("kafka/purchases", "kafka/clicks"))
    assert(topo.statefulSignature("kafka/attributed").exists(_.contains("IntervalJoin")),
      "the join is a stateful change-class member")
    val mgr = new StreamManager(topo)
    io.publishAt("kafka/purchases", "u1", "p100", ts(10))
    io.publishAt("kafka/clicks", "u1", "c-early", ts(0))
    io.publishAt("kafka/clicks", "u1", "c-late", ts(20))   // after purchase
    io.publishAt("kafka/clicks", "u2", "c-other", ts(9))   // other user
    mgr.applyGraph()
    mgr.processAllAvailable()
    val rows = io.collected("attributed")
      .map(r => (r.getAs[String]("key"), r.getAs[String]("value"),
        r.getAs[String]("right_value")))
    assert(rows == Seq(("u1", "p100", "c-early")),
      s"only the in-window same-user click joins: $rows")
    mgr.stopAll()
  }

  test("intervalJoin malformed durations fail registration, not buildPlan") {
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/a"),
      Set.empty, None, None, None)).isRight)
    val bad = topo.addNode(StreamNode(NodeName.parse("stream/j"), Set("kafka/a"),
      Some(OpSpec.IntervalJoin("kafka/a", "key",
        "fortnight", "0 seconds", "1 minutes", Seq("value"))),
      Some(BufferSpec.Fixed(10)), None))
    assert(bad.isLeft && bad.swap.exists(_.contains("fortnight")), s"got $bad")
  }

  test("intervalJoin right-side cycles are rejected at registration") {
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    assert(topo.addNode(StreamNode(NodeName.parse("kafka/a"),
      Set.empty, None, None, None)).isRight)
    assert(topo.addNode(StreamNode(NodeName.parse("stream/b"), Set("kafka/a"),
      Some(OpSpec.IntervalJoin("stream/c", "key",
        "1 minutes", "0 seconds", "1 minutes", Seq("value"))),
      Some(BufferSpec.Fixed(1000)), None)).isRight)
    // c joining back against b closes a cycle THROUGH the join edge
    val cyc = topo.addNode(StreamNode(NodeName.parse("stream/c"), Set("kafka/a"),
      Some(OpSpec.IntervalJoin("stream/b", "key",
        "1 minutes", "0 seconds", "1 minutes", Seq("value"))),
      Some(BufferSpec.Fixed(1000)), None))
    assert(cyc.isLeft, s"join-edge cycle must fail registration: $cyc")
  }

  test("scrubPii op-spec: declarative redaction-at-ingest node") {
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    val spec = OpSpec.Comp(Seq(
      OpSpec.SelectExpr(Seq("value AS text")),
      OpSpec.ScrubPii("text")))
    val node = StreamNode(NodeName.parse("stream/scrub"), Set("kafka/docs"),
      Some(spec), Some(BufferSpec.Fixed(10)), None)
    // control-plane contract: the spec survives the stored-doc round-trip
    assert(NodeSpec.parse(NodeSpec.toJson(node)).contains(node))
    topo.addNode(StreamNode(NodeName.parse("kafka/docs"), Set.empty, None, None, None))
    topo.addNode(node)
    topo.addNode(StreamNode(NodeName.parse("kafka/out"), Set("stream/scrub"), None, None, None))
    val mgr = new StreamManager(topo)
    io.publish("kafka/docs", "k", "mail me at a@b.io from 10.0.0.1")
    mgr.applyGraph()
    mgr.processAllAvailable()
    val got = io.collected("out")
      .map(r => (r.getAs[String]("text_clean"), r.getAs[Long]("n_emails"),
        r.getAs[Long]("n_ips")))
    assert(got == Seq(("mail me at <EMAIL> from <IP>", 1L, 1L)))
    mgr.stopAll()
  }

  test("bloomAdmit op-spec: declarative decontamination-at-ingest node") {
    import spark.implicits._
    val bench = "the quick brown fox jumps over the lazy dog again and again today"
    val path = java.nio.file.Files.createTempDirectory("graft-badmit").toString + "/m"
    graft.ext.Corpus.stageBloomFilter(
      (1L to 5L).map(i => (i, bench)).toDF("doc_id", "text"), path)
    try {
      val io = new MemoryIO(spark)
      val topo = new Topology(io)
      val spec = OpSpec.Comp(Seq(
        OpSpec.SelectExpr(Seq("value AS text")),
        OpSpec.BloomAdmit(path, 500000L, "text")))
      val node = StreamNode(NodeName.parse("stream/clean"), Set("kafka/docs"),
        Some(spec), Some(BufferSpec.Fixed(10)), None)
      // control-plane contract: the spec survives the stored-doc round-trip
      assert(NodeSpec.parse(NodeSpec.toJson(node)).contains(node))
      topo.addNode(StreamNode(NodeName.parse("kafka/docs"), Set.empty, None, None, None))
      topo.addNode(node)
      topo.addNode(StreamNode(NodeName.parse("kafka/out"), Set("stream/clean"), None, None, None))
      val mgr = new StreamManager(topo)
      io.publish("kafka/docs", "a", bench) // verbatim benchmark copy → rejected
      io.publish("kafka/docs", "b",
        "completely novel material about compilers and register allocation")
      mgr.applyGraph()
      mgr.processAllAvailable()
      val got = io.collected("out").map(r =>
        (r.getAs[String]("text"), r.getAs[Long]("n_hit_bloom")))
      assert(got.map(_._1) ==
        Seq("completely novel material about compilers and register allocation"),
        s"only the benchmark-disjoint doc may pass: $got")
      assert(got.head._2 == 0L, s"disjoint doc must read zero hits: $got")
      mgr.stopAll()
    } finally graft.ext.Corpus.releaseBloomFilter(path)
  }

  test("classifierAdmit op-spec: trained quality gate at ingest") {
    import spark.implicits._
    val prose = "the quick brown fox jumps over the lazy dog and runs far " +
      "away into the deep green forest to hide from every hunter"
    val gib = (1 to 24).map(i => s"qz${i}xv").mkString(" ")
    val labeled = ((1L to 20L).map(i => (i, 1, prose + s" day$i")) ++
      (101L to 120L).map(i => (i, 0, gib.replace("qz1", s"qz$i"))))
      .toDF("doc_id", "y", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-cadmit").toString + "/m"
    graft.ext.Corpus.stageQualityClassifier(labeled, path, buckets = 256, rounds = 5)
    graft.core.CacheRegistry.unpersistAll()
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    val spec = OpSpec.Comp(Seq(
      OpSpec.SelectExpr(Seq("value AS text")),
      OpSpec.ClassifierAdmit(path, 500000L, "text")))
    val node = StreamNode(NodeName.parse("stream/quality"), Set("kafka/docs"),
      Some(spec), Some(BufferSpec.Fixed(10)), None)
    // control-plane contract: the spec survives the stored-doc round-trip
    assert(NodeSpec.parse(NodeSpec.toJson(node)).contains(node))
    topo.addNode(StreamNode(NodeName.parse("kafka/docs"), Set.empty, None, None, None))
    topo.addNode(node)
    topo.addNode(StreamNode(NodeName.parse("kafka/out"), Set("stream/quality"), None, None, None))
    val mgr = new StreamManager(topo)
    io.publish("kafka/docs", "a", prose + " daybreak") // prose-like → admitted
    io.publish("kafka/docs", "b", gib)                 // gibberish → rejected
    mgr.applyGraph()
    mgr.processAllAvailable()
    val got = io.collected("out").map(r =>
      (r.getAs[String]("text"), r.getAs[Long]("score_q6")))
    assert(got.map(_._1) == Seq(prose + " daybreak"),
      s"only prose-like text may pass the trained gate: $got")
    assert(got.head._2 >= 500000L, s"admitted row carries its score: $got")
    mgr.stopAll()
  }

  // F6 + S7/S8: the logical→physical topic mapping must be INJECTIVE or
  // two distinct nodes silently share a Kafka topic and cross-read. The
  // validation lives in NodeName.parse (the single construction funnel
  // for both REST registration and control-plane JSON via NodeSpec.parse).
  test("node naming: physical-topic collisions are rejected at parse") {
    // would collide with internal node stream/x's physical topic stream.x
    intercept[IllegalArgumentException](NodeName.parse("kafka/stream.x"))
    // would collide with the control-plane topic
    intercept[IllegalArgumentException](
      NodeName.parse("kafka/" + NodeName.ControlTopic))
    // '.' in an internal name would make stream/a.b ≡ stream/a/b
    intercept[IllegalArgumentException](NodeName.parse("stream/a.b"))
    intercept[IllegalArgumentException](NodeName.parse("stream/a/b"))
    // Kafka-illegal characters and degenerate names
    intercept[IllegalArgumentException](NodeName.parse("kafka/has space"))
    intercept[IllegalArgumentException](NodeName.parse("kafka/."))
    intercept[IllegalArgumentException](NodeName.parse("kafka/"))
    // legal names still parse, including dots in EXTERNAL topic names
    assert(NodeName.parse("kafka/raw.events-v2").name == "raw.events-v2")
    assert(NodeName.parse("stream/admit_2").name == "admit_2")
    // the control-plane JSON railway reports the same rejection as None
    assert(NodeSpec.parse("""{"name":"kafka/stream.x"}""").isEmpty)
    assert(NodeSpec.parse("""{"name":"kafka/raw.events-v2"}""").isDefined)
  }
}
