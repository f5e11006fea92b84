package graft.core

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** The shared resident-pin contract three consumers now depend on
  * (Dedup.residentShingleIndex, Corpus.residentLmModel,
  * StreamScore's ratio table): load once per (session, path), rebuild —
  * and unpin the stale value — when the owning session changes, release
  * unpins, and unpin failures never propagate. */
class ResidentSpec extends SparkSpec {

  private final class Probe(val session: SparkSession, val path: String) {
    var unpinned = 0
  }

  private def fixture() = {
    var loads = 0
    val unpinnedLog = scala.collection.mutable.ArrayBuffer.empty[Probe]
    val r = new Resident[Probe](
      (s, p) => { loads += 1; new Probe(s, p) },
      v => { v.unpinned += 1; unpinnedLog += v })
    (r, () => loads, unpinnedLog)
  }

  test("same session and path loads once and reuses the pinned value") {
    val (r, loads, _) = fixture()
    val a = r.get(spark, "/model/a")
    assert(r.get(spark, "/model/a") eq a)
    assert(loads() == 1)
    val b = r.get(spark, "/model/b")
    assert((b ne a) && loads() == 2, "paths are independent cache keys")
  }

  test("a different owning session rebuilds and unpins the stale value") {
    val (r, loads, unpinnedLog) = fixture()
    val a = r.get(spark, "/model/a")
    val s2 = spark.newSession()
    val a2 = r.get(s2, "/model/a")
    assert(a2 ne a, "session A's value must never be served to session B")
    assert(a2.session eq s2)
    assert(loads() == 2)
    assert(unpinnedLog.toList == List(a), "the swapped-out value is unpinned")
    assert(r.get(s2, "/model/a") eq a2, "the rebound value is now the pinned one")
  }

  test("release unpins and the next get reloads") {
    val (r, loads, unpinnedLog) = fixture()
    val a = r.get(spark, "/model/a")
    r.release("/model/a")
    assert(unpinnedLog.toList == List(a))
    r.release("/model/a") // idempotent: nothing pinned, nothing unpinned
    assert(unpinnedLog.size == 1)
    assert(r.get(spark, "/model/a") ne a)
    assert(loads() == 2)
  }

  test("unpin exceptions are swallowed (the owning session may be stopped)") {
    val r = new Resident[String]((_, p) => p,
      _ => throw new IllegalStateException("session already stopped"))
    r.get(spark, "/model/a")
    r.release("/model/a") // must not throw
    val s2 = spark.newSession()
    assert(r.get(s2, "/model/b") == "/model/b")
    r.get(spark, "/model/b") // swap unpin throws too — must not propagate
  }
}
