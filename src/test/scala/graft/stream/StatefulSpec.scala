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
}
