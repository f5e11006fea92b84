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
  }
}
