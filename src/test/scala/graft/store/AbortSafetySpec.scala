package graft.store

import java.nio.file.Files

import graft.SparkSpec

/** Crash-consistency of the version log itself: an ABORTED append (task
  * interrupted mid-write — what an abrupt query stop or executor loss
  * does) must leave previously committed transactions readable. */
class AbortSafetySpec extends SparkSpec {
  import spark.implicits._

  test("an interrupted putBatch leaves committed data intact and readable") {
    val store = DocumentStore(spark,
      Files.createTempDirectory("graft-abort").toString + "/db")
    store.putBatch(Seq(("a1", "{\"v\":1}")).toDF("id", "doc"))
    assert(store.entity("a1").nonEmpty)

    // second append interrupted mid-job — the writing thread is killed the
    // way StreamingQuery.stop() kills a foreachBatch in flight
    val slow = spark.range(0, 4, 1, 4).mapPartitions { it =>
      Thread.sleep(3000); it
    }.selectExpr("CAST(value AS STRING) AS id", "'{}' AS doc")
    val t = new Thread(() => {
      try { store.putBatch(slow); () } catch { case _: Throwable => () }
    })
    t.start()
    Thread.sleep(1000) // let the job start writing
    t.interrupt()
    t.join(30000)

    // the committed transaction must survive the abort
    assert(store.entity("a1").nonEmpty,
      "committed store data lost after an aborted append")
  }

  test("a read racing the first in-flight append sees the empty committed view") {
    // continuous ingest means readers race writers constantly; mid-write
    // the store directory exists holding only _temporary task files —
    // schema INFERENCE throws UNABLE_TO_INFER_SCHEMA there (the r8 crash
    // drill caught it), the explicit-schema read returns the committed
    // view: empty
    val store = DocumentStore(spark,
      Files.createTempDirectory("graft-race").toString + "/db")
    val slow = spark.range(0, 4, 1, 4).mapPartitions { it =>
      Thread.sleep(3000); it
    }.selectExpr("CAST(value AS STRING) AS id", "'{}' AS doc")
    val t = new Thread(() => { store.putBatch(slow); () })
    t.start()
    try {
      Thread.sleep(1000) // the append is mid-flight: only _temporary exists
      assert(store.entity("0").isEmpty,
        "uncommitted rows must be invisible mid-write")
      t.join(30000)
      assert(store.entity("0").nonEmpty, "the commit must become visible")
    } finally t.join(30000)
  }
}
