package graft.store

import java.nio.file.Files

import graft.SparkSpec

/** CDC read side: `changes` / `changesSince` classification semantics. */
class ChangesSpec extends SparkSpec {

  private def newStore(): DocumentStore =
    DocumentStore(spark, Files.createTempDirectory("cdc").toString + "/db")

  test("changes classifies insert / update / delete / re-insert") {
    val store = newStore()
    store.put("a", """{"v":1}""")        // first version      -> insert
    store.put("a", """{"v":2}""")        // second             -> update
    store.put("b", """{"v":1}""")        // first of b         -> insert
    store.delete("a")                    // tombstone          -> delete
    store.put("a", """{"v":3}""")        // put after delete   -> insert (re-insert)

    val ops = store.changes()
      .orderBy("txTime")
      .collect()
      .map(r => (r.getAs[String]("id"), r.getAs[String]("op")))
      .toSeq
    assert(ops == Seq(
      ("a", "insert"), ("a", "update"), ("b", "insert"),
      ("a", "delete"), ("a", "insert")))
  }

  test("changesSince tails from a tx cut without reclassifying the tail") {
    val store = newStore()
    store.put("x", """{"v":1}""")
    val cut = store.put("y", """{"v":1}""")
    store.put("x", """{"v":2}""")        // after the cut; prior version BEFORE it
    store.delete("y")

    val tail = store.changesSince(cut)
      .orderBy("txTime")
      .collect()
      .map(r => (r.getAs[String]("id"), r.getAs[String]("op")))
      .toSeq
    // x's tail row is an UPDATE — its first version sits before the cut,
    // and the classification window sees the full chain
    assert(tail == Seq(("x", "update"), ("y", "delete")))

    // since epoch ≡ the full feed (the cut is exclusive)
    assert(store.changesSince(new java.sql.Timestamp(0L)).count() ==
      store.changes().count())
  }

  test("changes over an empty store is empty") {
    assert(newStore().changes().count() == 0)
  }
}
