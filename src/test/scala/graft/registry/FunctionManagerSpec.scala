package graft.registry

import java.nio.file.Files

import graft.SparkSpec
import graft.store.DocumentStore
import graft.stream.{MemoryIO, StreamManager, Topology}

/** Management-plane railway (F5/F6): create rejects duplicates and bad
  * names/specs; update rejects nonexistent functions
  * (`updating-correct-function?`); delete tombstones + tears down. */
class FunctionManagerSpec extends SparkSpec {

  private def fixture() = {
    val store = DocumentStore(spark, Files.createTempDirectory("fm").toString + "/db")
    val io = new MemoryIO(spark)
    val mgr = new StreamManager(new Topology(io))
    (store, io, mgr, new FunctionManager(store, mgr))
  }

  private val procSpec =
    """{"name":"stream/proc","upstream":["kafka/in"],
       "transducer":{"map":"upper(value)"},"buffer":10}""".replaceAll("\n\\s*", "")

  test("create: validates name, type, spec; rejects duplicates") {
    val (_, _, mgr, fm) = fixture()
    assert(fm.create("stream", "proc", procSpec) == Right(":stream/proc"))
    assert(mgr.topology.node("stream/proc").isDefined, "locally activated")
    assert(fm.create("stream", "proc", procSpec).swap.exists(_.contains("already exists")))
    assert(fm.create("stream", "9bad", procSpec).swap.exists(_.contains("invalid name")))
    assert(fm.create("widget", "x", procSpec).swap.exists(_.contains("unknown stored-function type")))
    assert(fm.create("stream", "x2", """{"nope":1}""").swap.exists(_.contains("unparseable")))
    // railway ordering: an invalid spec that ALSO fails node validation
    val noBuffer = """{"name":"stream/nb","transducer":{"map":"value"}}"""
    assert(fm.create("stream", "nb", noBuffer).swap.exists(_.contains("requires a buffer")))
  }

  test("update: requires existence (updating-correct-function?)") {
    val (store, _, _, fm) = fixture()
    assert(fm.update("stream", "ghost", procSpec.replace("stream/proc", "stream/ghost"))
      .swap.exists(_.contains("does not exist")))
    // identity rule (r8): the spec's node local name IS the function name —
    // a mismatched update would retarget the doc and orphan the live node
    assert(fm.update("stream", "ghost", procSpec)
      .swap.exists(_.contains("must have local name")))
    fm.create("stream", "proc", procSpec)
    // valid-update?: an identical redeploy is a FAILURE with the
    // reference's message vocabulary, not a new doc version + hot-swap
    assert(fm.update("stream", "proc", procSpec)
      .swap.exists(_.contains("no-change-from-existing-stream")))
    val v2 = procSpec.replace("upper(value)", "lower(value)")
    assert(fm.update("stream", "proc", v2) == Right(":stream/proc"))
    assert(store.entity(":stream/proc").contains(v2))
    // bitemporal audit: version history keeps both deploys — and exactly
    // two: the rejected no-change redeploy left no audit row
    assert(store.versions().filter("id = ':stream/proc'").count() == 2)
  }

  test("delete: tombstones and tears down the node") {
    val (store, _, mgr, fm) = fixture()
    fm.create("stream", "proc", procSpec)
    assert(fm.delete("stream", "proc") == Right(":stream/proc"))
    assert(store.entity(":stream/proc").isEmpty)
    assert(mgr.topology.node("stream/proc").isEmpty)
    assert(fm.delete("stream", "proc").swap.exists(_.contains("does not exist")))
  }
}
