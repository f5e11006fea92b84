package graft.stream

import graft.SparkSpec
import graft.core.{BufferSpec, NodeName, OpSpec, StreamNode}

/** The full crawl-ingest admission pipeline as ONE declarative node: per-key
  * quota → PII scrub → Bloom decontamination → trained quality floor. Each
  * stage is tested alone elsewhere; this pins that they STACK — every
  * stage's output schema feeds the next, evidence columns accumulate, and
  * one stored JSON spec round-trips the whole chain — the composition a
  * real training-data ingest deploys. */
class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("quota → scrub → bloomAdmit → classifierAdmit stack in one node") {
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")

    val prose = "the quick brown fox jumps over the lazy dog and then runs " +
      "far away into the deep green forest to hide from every hunter today"
    val bench = "every benchmark question about arithmetic and logic lives " +
      "in this held out evaluation suite with its own distinctive phrasing"
    val gib = (1 to 24).map(i => s"qz${i}xv").mkString(" ")

    // staged models: the eval-set Bloom filter and the trained classifier
    val bloomPath = java.nio.file.Files.createTempDirectory("graft-ing").toString + "/bloom"
    graft.ext.Corpus.stageBloomFilter(
      (1L to 5L).map(i => (i, bench)).toDF("doc_id", "text"), bloomPath)
    val clsPath = java.nio.file.Files.createTempDirectory("graft-ing2").toString + "/cls"
    val labeled = ((1L to 20L).map(i => (i, 1, prose + s" day$i")) ++
      (101L to 120L).map(i => (i, 0, gib.replace("qz1", s"qz$i"))))
      .toDF("doc_id", "y", "text")
    graft.ext.Corpus.stageQualityClassifier(labeled, clsPath, buckets = 256, rounds = 5)
    graft.core.CacheRegistry.unpersistAll()

    try {
      val io = new MemoryIO(spark)
      val topo = new Topology(io)
      val spec = OpSpec.Comp(Seq(
        // quota first, on the raw node row (key = source field in payload)
        OpSpec.QuotaAdmit("get_json_object(value, '$.src')", 2),
        // unwrap the payload text; keep the quota key as provenance
        OpSpec.SelectExpr(Seq("key AS source",
          "get_json_object(value, '$.text') AS text")),
        OpSpec.ScrubPii("text"),
        // downstream stages see the SCRUBBED text
        OpSpec.BloomAdmit(bloomPath, 500000L, "text_clean"),
        OpSpec.ClassifierAdmit(clsPath, 500000L, "text_clean")))
      val node = StreamNode(NodeName.parse("stream/ingest"), Set("kafka/crawl"),
        Some(spec), Some(BufferSpec.Fixed(100)), None)
      // one stored JSON doc carries the whole chain
      assert(NodeSpec.parse(NodeSpec.toJson(node)).contains(node))
      topo.addNode(StreamNode(NodeName.parse("kafka/crawl"), Set.empty, None, None, None))
      topo.addNode(node)
      topo.addNode(StreamNode(NodeName.parse("kafka/clean"), Set("stream/ingest"), None, None, None))
      val mgr = new StreamManager(topo)

      def doc(src: String, text: String) =
        s"""{"src":"$src","text":"$text"}"""
      io.publish("kafka/crawl", "k1", doc("web", prose + " plus contact me at bob@example.com"))
      // NB own source: quota is the FIRST stage, so a benchmark copy from
      // "web" would spend web's quota before bloom rejects it
      io.publish("kafka/crawl", "k2", doc("evalish", bench))      // bloom-rejected
      io.publish("kafka/crawl", "k3", doc("web", prose + " twice")) // 2nd web admit
      io.publish("kafka/crawl", "k4", doc("web", prose + " thrice")) // quota-rejected (cap 2)
      io.publish("kafka/crawl", "k5", doc("niche", gib))          // classifier-rejected
      mgr.applyGraph()
      // transformWithState under ProcessingTime re-arms batches; poll the sink
      val deadline = System.currentTimeMillis() + 60000
      def collected() = io.collected("clean").map(r =>
        (r.getAs[String]("text_clean"), r.getAs[Long]("score_q6")))
      while (collected().size < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      val got = collected()
      assert(got.map(_._1).toSet == Set(
        prose + " plus contact me at <EMAIL>", // scrubbed AND admitted
        prose + " twice"),
        s"exactly the clean, in-quota, non-benchmark prose passes: $got")
      assert(got.forall(_._2 >= 500000L), s"scores ride along as evidence: $got")
      // give the rejected rows' batches time to flush, then confirm absence
      Thread.sleep(2000)
      val texts = collected().map(_._1)
      assert(!texts.exists(_.contains("benchmark")), "benchmark copy must not pass")
      assert(!texts.exists(_.contains("qz")), "gibberish must not pass")
      assert(!texts.exists(_.contains("thrice")), "over-quota doc must not pass")
      mgr.stopAll()
    } finally {
      graft.ext.Corpus.releaseBloomFilter(bloomPath)
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
