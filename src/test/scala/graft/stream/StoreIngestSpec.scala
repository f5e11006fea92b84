package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core.{BufferSpec, NodeName, OpSpec, StreamNode}
import graft.store.DocumentStore

/** §3.2 ingestion loop: stream → transform → bitemporal store → Datalog. */
class StoreIngestSpec extends SparkSpec {

  test("stream lands in the store as batched transactions; queryable by datalog") {
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    topo.addNode(StreamNode(NodeName.parse("kafka/signups"), Set.empty, None, None, None))
    topo.addNode(StreamNode(NodeName.parse("stream/users"), Set("kafka/signups"),
      Some(OpSpec.SelectExpr(Seq(
        "concat('user/', key) AS uid",
        "get_json_object(value, '$.name') AS name",
        "get_json_object(value, '$.plan') AS plan"))),
      Some(BufferSpec.Fixed(100)), None))
    val store = DocumentStore(spark,
      Files.createTempDirectory("ing").toString + "/db")

    io.publish("kafka/signups", "ada", """{"name":"ada","plan":"pro"}""")
    io.publish("kafka/signups", "bob", """{"name":"bob","plan":"free"}""")
    val q = StoreIngest.ingestNode(topo, store, "stream/users",
      idExpr = "uid", docCols = Seq("name", "plan"))
    q.processAllAvailable()

    // entity lookup (Q1) straight from the stream-ingested store
    assert(store.entity("user/ada").contains("""{"name":"ada","plan":"pro"}"""))

    // one micro-batch = one transaction: both docs share a tx-time
    assert(store.versions().select("txTime").distinct().count() == 1)

    // second batch: an update flows through the same pipe
    io.publish("kafka/signups", "bob", """{"name":"bob","plan":"pro"}""")
    q.processAllAvailable()
    assert(store.entity("user/bob").contains("""{"name":"bob","plan":"pro"}"""))

    // EDN datalog over the ingested universe
    val schema = StructType(Seq(StructField("name", StringType), StructField("plan", StringType)))
    val pros = store.q("""{:find [?n] :where [[?e :plan "pro"] [?e :name ?n]]}""", schema)
      .fold(fail(_), identity).collect().map(_.getString(0)).toSet
    assert(pros == Set("ada", "bob"))

    q.stop()

    // the stream is an UNTRUSTED boundary (StreamPush collectors feed it):
    // a payload whose id lands in the stored-function namespace must be
    // routed out, or a restart would ACTIVATE it as control-plane state.
    // This ingest takes the id STRAIGHT from the message key (no prefix).
    val q2 = StoreIngest.ingest(topo.buildPlan("kafka/signups"), store,
      idExpr = "key", docCols = Seq("value"), queryName = "raw_ingest")
    io.publish("kafka/signups", ":stream/evil", """{"name":"evil"}""")
    io.publish("kafka/signups", "carol", """{"name":"carol"}""")
    q2.processAllAvailable()
    assert(store.entity("carol").nonEmpty, "the clean doc in the same batch lands")
    assert(store.versions().filter("id LIKE ':%'").count() == 0,
      "no ':'-namespace doc may enter through the ingest sink")
    q2.stop()
  }

  test("crash-replay drill: duplicate micro-batch delivery (VERDICT r12 #5)") {
    // foreachBatch is at-least-once: a crash BETWEEN the sink write and the
    // checkpoint's offset commit re-delivers the same (batch, batchId) on
    // restart. The drill invokes the sink body directly with a repeated
    // batchId — exactly what the engine does after that crash.
    val store = DocumentStore(spark,
      Files.createTempDirectory("ing-replay").toString + "/db")
    import spark.implicits._
    val batch1 = Seq(("d/1", "a"), ("d/2", "b")).toDF("uid", "v")
    val body = StoreIngest.ingestBatch(store, "uid", Seq("v"), "drill",
      dedupeReplays = true) _
    body(batch1, 0L)
    val afterFirst = store.versions().count() // 2 docs + 1 ledger row
    assert(afterFirst == 3)
    assert(store.entity("d/1").contains("""{"v":"a"}"""))
    assert(StoreIngest.committedBatch(store, "drill").contains(0L))
    // the ledger row rode in the SAME transaction as the data
    assert(store.versions().select("txTime").distinct().count() == 1)
    // crash + restart: batch 0 re-delivered → must be a no-op
    body(batch1, 0L)
    assert(store.versions().count() == afterFirst,
      "a replayed micro-batch must not append duplicate versions")
    // the next batch advances normally
    body(Seq(("d/3", "c")).toDF("uid", "v"), 1L)
    assert(store.entity("d/3").contains("""{"v":"c"}"""))
    assert(StoreIngest.committedBatch(store, "drill").contains(1L))
    // a LATE replay of an older batch after newer commits is also a no-op
    body(batch1, 0L)
    assert(StoreIngest.committedBatch(store, "drill").contains(1L))
    assert(store.db().filter("id NOT LIKE ':%'").count() == 3)
    // the ledger lives in the reserved namespace: invisible to qPublic
    val schema = StructType(Seq(StructField("v", StringType)))
    val pub = store.qPublic("{:find [?e] :where [[?e :v ?x]]}", schema)
      .fold(fail(_), identity).count()
    assert(pub == 3)

    // WITHOUT a durable checkpoint there is no ledger (batch ids restart
    // at 0 per run — deduping would DROP data): documented at-least-once.
    // A replay appends duplicate versions; the read face stays correct.
    val store2 = DocumentStore(spark,
      Files.createTempDirectory("ing-replay2").toString + "/db")
    val body2 = StoreIngest.ingestBatch(store2, "uid", Seq("v"), "drill2",
      dedupeReplays = false) _
    body2(batch1, 0L)
    body2(batch1, 0L) // replayed
    assert(store2.versions().count() == 4, "at-least-once: versions duplicate")
    assert(store2.db().count() == 2, "…but the snapshot read face is unchanged")
    assert(store2.entity("d/1").contains("""{"v":"a"}"""))
  }

  test("putBatch parity: executor-side append yields the same store as putAll") {
    val base = Files.createTempDirectory("ingp").toString
    val a = DocumentStore(spark, base + "/a")
    val b = DocumentStore(spark, base + "/b")
    val docs = (1 to 50).map(i => (s"doc/$i", s"""{"n":$i}"""))
    a.putAll(docs)
    b.putBatch(spark.createDataFrame(docs).toDF("id", "doc"))

    // one transaction each: a single tx-time across the whole batch
    assert(a.versions().select("txTime").distinct().count() == 1)
    assert(b.versions().select("txTime").distinct().count() == 1)
    // identical current snapshots (id → doc)
    def snap(s: DocumentStore) =
      s.db().select("id", "doc").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(snap(a) == snap(b))
    // and the read path composes: entity / update-over supersedes
    b.put("doc/7", """{"n":700}""")
    assert(b.entity("doc/7").contains("""{"n":700}"""))
    assert(b.db().count() == 50)
  }

  test("putBatch never materializes the batch on the driver") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val store = DocumentStore(spark,
      Files.createTempDirectory("ingd").toString + "/db")
    // ~20 MB of payload: 2000 docs x ~10KB. A collect-based path would pull
    // all of it back through task results; the executor-side append returns
    // only write-commit messages (a few KB per task).
    val docs = spark.range(2000).selectExpr(
      "concat('doc/', id) AS id",
      "concat('{\"pad\":\"', repeat('x', 10000), '\"}') AS doc")
    val resultBytes = new java.util.concurrent.atomic.AtomicLong
    val tasksSeen = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) resultBytes.addAndGet(t.taskMetrics.resultSize)
        tasksSeen.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      store.putBatch(docs)
      // listener bus is async — poll until the task-end events stop arriving
      var last = -1L
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val cur = tasksSeen.get
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      assert(tasksSeen.get > 0, "expected at least one task")
      val bytes = resultBytes.get
      assert(bytes < 2L * 1000 * 1000,
        s"driver received $bytes bytes of task results for a ~20MB batch — " +
          "the ingest path is materializing data on the driver")
      // the data really landed: count + spot-check executor-written payloads
      assert(store.db().count() == 2000)
      assert(store.entity("doc/1999").exists(_.length > 10000))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
