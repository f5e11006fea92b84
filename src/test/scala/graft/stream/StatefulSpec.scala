package graft.stream

import graft.SparkSpec
import graft.core.{NodeName, StreamNode}

class StatefulSpec extends SparkSpec {

  test("mapGroupsWithState running counts accumulate across batches") {
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    topo.addNode(StreamNode(NodeName.parse("kafka/clicks"), Set.empty, None, None, None))
    val counts = Stateful.runningCounts(topo.buildPlan("kafka/clicks"))
    val seen = scala.collection.mutable.Map.empty[String, Long]
    val q = counts.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Stateful.RunningCount], _: Long) =>
        batch.collect().foreach(rc => seen.synchronized { seen(rc.key) = rc.n })
        ()
      }.start()
    io.publish("kafka/clicks", "a", "1")
    io.publish("kafka/clicks", "b", "2")
    q.processAllAvailable()
    assert(seen.synchronized(seen.toMap) == Map("a" -> 1L, "b" -> 1L))
    io.publish("kafka/clicks", "a", "3")
    q.processAllAvailable()
    // state survived the batch boundary: a's count continues from 1
    assert(seen.synchronized(seen.toMap) == Map("a" -> 2L, "b" -> 1L))
    q.stop()
  }

  test("flatMapGroupsWithState sessions close after the event-time gap") {
    def ts(minute: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    topo.addNode(StreamNode(NodeName.parse("kafka/visits"), Set.empty, None, None, None))
    val sessions = Stateful.sessionize(topo.buildPlan("kafka/visits"),
      gapMillis = 60000) // 1-minute silence closes a session
    val closed = scala.collection.mutable.Buffer.empty[Stateful.Session]
    val q = sessions.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Stateful.Session], _: Long) =>
        closed.synchronized { closed ++= batch.collect() }
        ()
      }.start()
    io.publishAt("kafka/visits", "u1", "page1", ts(0))
    io.publishAt("kafka/visits", "u1", "page2", ts(1))
    q.processAllAvailable()
    assert(closed.isEmpty, "session still open")
    // event-time advances past the gap → u1's timer fires on the next batches
    io.publishAt("kafka/visits", "u2", "page1", ts(5))
    q.processAllAvailable()
    io.publishAt("kafka/visits", "u3", "pageX", ts(10)) // watermark pusher
    q.processAllAvailable()
    io.publishAt("kafka/visits", "u4", "pageY", ts(15)) // flush u2 too
    q.processAllAvailable()
    val byKey = closed.synchronized(closed.toList).map(s => s.key -> s.nEvents).toMap
    assert(byKey.get("u1").contains(2L), s"u1 session of 2 events closed: $byKey")
    assert(byKey.get("u2").contains(1L), s"u2 closed after the gap: $byKey")
    q.stop()
  }

  test("transformWithState TTL dedup: repeats dropped, state re-admits after expiry") {
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // changelog checkpointing: commit writes a small changelog instead of
    // zipping+uploading a full RocksDB snapshot per store per micro-batch
    // (the full-snapshot path stalls for minutes even on toy state here)
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    // Spark 4.1's checksum checkpoint file manager awaits a background
    // checksum-write future that never completes under local[4] here
    // (threads park in ChecksumCheckpointFileManager.createWithChecksum);
    // checksums are a corruption probe, not a semantics change — off
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    topo.addNode(StreamNode(NodeName.parse("kafka/docs"), Set.empty, None, None, None))
    val seen = scala.collection.mutable.Buffer.empty[(String, String)]
    val session = spark
    // ProcessingTime TimeMode re-arms a micro-batch every trigger, so
    // processAllAvailable livelocks (the T20-era gotcha, now on
    // transformWithState). Data still flows batch to batch — so the test
    // polls the sink and uses SENTINEL keys for ordering: once a sentinel
    // published AFTER an event shows up, that event's batch has committed.
    val deduped = Stateful.dedupKeysTtl(topo.buildPlan("kafka/docs"), ttlMillis = 15000)
    val q = deduped.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Stateful.KeyedEvent], _: Long) =>
        org.apache.spark.sql.SparkSession.setActiveSession(session)
        seen.synchronized { seen ++= batch.collect().map(e => e.key -> e.value) }
        ()
      }.start()
    def awaitSeen(key: String, value: String): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!seen.synchronized(seen.contains(key -> value)) &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(seen.synchronized(seen.contains(key -> value)),
        s"expected $key -> $value in $seen")
    }
    try {
      io.publish("kafka/docs", "doc1", "v1")
      io.publish("kafka/docs", "doc2", "v1")
      awaitSeen("doc1", "v1"); awaitSeen("doc2", "v1")
      // 15 s TTL >> batch lag even under full-suite load (2 s flaked)
      io.publish("kafka/docs", "doc1", "v2") // dup within TTL → dropped
      io.publish("kafka/docs", "sentinel1", "x")
      awaitSeen("sentinel1", "x") // dup's batch committed by now
      assert(!seen.synchronized(seen.contains("doc1" -> "v2")),
        s"dup within TTL must drop: $seen")
      Thread.sleep(16000) // let doc1's state pass its TTL
      io.publish("kafka/docs", "doc1", "v3") // state expired → re-admitted
      awaitSeen("doc1", "v3")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("quotaAdmit: per-key cap enforced across micro-batches, key from payload") {
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    topo.addNode(StreamNode(NodeName.parse("kafka/crawl"), Set.empty, None, None, None))
    val seen = scala.collection.mutable.Buffer.empty[(String, String)]
    val session = spark
    // quota key extracted from the JSON payload, cap 2 per source
    val admitted = Stateful.quotaAdmit(topo.buildPlan("kafka/crawl"),
      "get_json_object(value, '$.src')", cap = 2)
    val q = admitted.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Stateful.KeyedEvent], _: Long) =>
        org.apache.spark.sql.SparkSession.setActiveSession(session)
        seen.synchronized { seen ++= batch.collect().map(e => e.key -> e.value) }
        ()
      }.start()
    def awaitSeen(key: String, value: String): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!seen.synchronized(seen.contains(key -> value)) &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(seen.synchronized(seen.contains(key -> value)),
        s"expected $key -> $value in $seen")
    }
    try {
      // batch 1: two from A (fills the quota), one from B
      io.publish("kafka/crawl", "k1", """{"src":"A","doc":"a1"}""")
      io.publish("kafka/crawl", "k2", """{"src":"A","doc":"a2"}""")
      io.publish("kafka/crawl", "k3", """{"src":"B","doc":"b1"}""")
      awaitSeen("A", """{"src":"A","doc":"a2"}""")
      awaitSeen("B", """{"src":"B","doc":"b1"}""")
      // batch 2: A is exhausted (state carried over), B has room
      io.publish("kafka/crawl", "k4", """{"src":"A","doc":"a3"}""")
      io.publish("kafka/crawl", "k5", """{"src":"B","doc":"b2"}""")
      io.publish("kafka/crawl", "k6", """{"src":"C","doc":"c1"}""")
      awaitSeen("B", """{"src":"B","doc":"b2"}""")
      awaitSeen("C", """{"src":"C","doc":"c1"}""") // same batch as a3
      assert(!seen.synchronized(seen.exists(_._2.contains("a3"))),
        s"A's third doc must drop (quota 2 spent in batch 1): $seen")
      assert(seen.synchronized(seen.count(_._1 == "A")) == 2)
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("quotaAdmit rolling: TTL'd count refills the key's budget") {
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    val io = new MemoryIO(spark)
    val topo = new Topology(io)
    topo.addNode(StreamNode(NodeName.parse("kafka/rolling"), Set.empty, None, None, None))
    val seen = scala.collection.mutable.Buffer.empty[String]
    val session = spark
    val admitted = Stateful.quotaAdmit(topo.buildPlan("kafka/rolling"),
      "key", cap = 1, ttlMillis = Some(15000))
    val q = admitted.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Stateful.KeyedEvent], _: Long) =>
        org.apache.spark.sql.SparkSession.setActiveSession(session)
        seen.synchronized { seen ++= batch.collect().map(_.value) }
        ()
      }.start()
    def awaitSeen(value: String): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!seen.synchronized(seen.contains(value)) &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(seen.synchronized(seen.contains(value)), s"expected $value in $seen")
    }
    try {
      io.publish("kafka/rolling", "A", "v1")
      io.publish("kafka/rolling", "S", "s1") // sentinel key, own budget
      awaitSeen("v1"); awaitSeen("s1")
      io.publish("kafka/rolling", "A", "v2") // within TTL -> over budget
      io.publish("kafka/rolling", "S2", "s2")
      awaitSeen("s2")
      assert(!seen.synchronized(seen.contains("v2")),
        s"within the TTL window the budget is spent: $seen")
      Thread.sleep(16000) // let A's count expire
      io.publish("kafka/rolling", "A", "v3") // budget refilled
      awaitSeen("v3")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

}
