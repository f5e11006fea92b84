package graft.stream

import java.nio.file.Files

import graft.SparkSpec
import graft.core.{BufferSpec, NodeName, OpSpec, StreamNode}

/** LIVE-broker end-to-end for the Kafka data plane (S7-S9, T16) —
  * conditionally enabled, so the moment an environment ships the Spark
  * Kafka connector + a reachable broker, the real path runs with NO code
  * change (VERDICT r11 #8). In this build environment (no
  * spark-sql-kafka/kafka-clients jar on disk, zero egress — COVERAGE
  * §2.1) both `assume`s fail and every test here CANCELS (reported as
  * canceled, not passed — an honest skip).
  *
  * To enable: put spark-sql-kafka-0-10 + kafka-clients on the classpath
  * and set GRAFT_KAFKA_BOOTSTRAP=host:port to a broker this machine can
  * reach. The option maps the live path feeds Spark are pinned
  * broker-lessly by KafkaOptionsSpec, so this spec only has to prove the
  * wire actually moves. */
class KafkaLiveSpec extends SparkSpec {

  private def connectorPresent: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: Throwable => false }

  private def clientsPresent: Boolean =
    try { Class.forName("org.apache.kafka.clients.admin.AdminClient"); true }
    catch { case _: Throwable => false }

  private val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")

  test("live broker: ensureTopic + publish + source→transducer→sink round trip") {
    assume(connectorPresent && clientsPresent,
      "kafka connector/clients jar not on classpath — env-blocked, skipping")
    assume(bootstrap.isDefined, "GRAFT_KAFKA_BOOTSTRAP not set — skipping")
    val ckpt = Files.createTempDirectory("kafka-live").toString
    // dev-cluster-friendly replication (RF 1); unique topics per run so a
    // rerun against a shared broker never replays a prior run's records
    val tag = java.lang.Long.toHexString(System.nanoTime())
    val io = new KafkaIO(spark, bootstrap.get, ckpt,
      topicPartitions = 1, topicReplication = 1)
    val in = s"kafka/live_in_$tag"
    val out = s"kafka/live_out_$tag"
    io.ensureTopic(in) // S9 — must create, not no-op, with clients present
    io.ensureTopic(out)
    val topo = new Topology(io)
    assert(topo.addNode(StreamNode(NodeName.parse(in), Set.empty,
      None, None, None)).isRight)
    assert(topo.addNode(StreamNode(NodeName.parse("stream/liveinc"), Set(in),
      Some(OpSpec.MapExpr("TRY_CAST(value AS DOUBLE) + 1")),
      Some(BufferSpec.Fixed(100)), None)).isRight)
    assert(topo.addNode(StreamNode(NodeName.parse(out), Set("stream/liveinc"),
      None, None, None)).isRight)
    val mgr = new StreamManager(topo)
    try {
      mgr.applyGraph()
      // sources subscribe at latest: the sink query must have planned its
      // first batch (offsets snapshotted) before the publish, or the
      // record predates the snapshot and is skipped
      mgr.processAllAvailable()
      io.publish(in, "k1", "41") // T16 stream! push through the connector
      val deadline = System.currentTimeMillis() + 30000
      var got = Seq.empty[Double]
      while (got.isEmpty && System.currentTimeMillis() < deadline) {
        mgr.processAllAvailable()
        got = spark.read.format("kafka")
          .option("kafka.bootstrap.servers", bootstrap.get)
          .option("subscribe", "live_out_" + tag)
          .option("startingOffsets", "earliest")
          .load()
          .selectExpr("CAST(value AS STRING) AS v")
          .collect().toSeq
          .flatMap(r => scala.util.Try(
            // sink writes the row as JSON (S10 wire format)
            org.json4s.jackson.JsonMethods.parse(r.getString(0)) \ "value" match {
              case org.json4s.JString(s) => Some(s.toDouble)
              case org.json4s.JDouble(d) => Some(d)
              case _ => None
            }).toOption.flatten)
        if (got.isEmpty) Thread.sleep(500)
      }
      assert(got == Seq(42.0),
        s"published 41 must arrive incremented through the live broker: $got")
    } finally mgr.stopAll()
  }
}
