package graft.stream

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.core.Staged
import graft.ext.Dedup
import graft.store.DocumentStore

/** The store tx log as a stream (appended files ARE the feed) and the
  * index-maintenance loop it powers. */
class StoreChangesSpec extends SparkSpec {
  import spark.implicits._

  test("the store path tails as a stream of committed transactions") {
    val store = DocumentStore(spark,
      Files.createTempDirectory("cdc-tail").toString + "/db")
    store.put("a", """{"v":1}""")
    store.put("b", """{"v":1}""")

    val seen = new ConcurrentLinkedQueue[String]()
    val q = StoreChanges.stream(spark, store.path).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select("id").as[String].collect().foreach(seen.add)
        ()
      }
      .queryName("cdc_tail_test")
      .start()
    try {
      // catch-up: every file already present replays
      q.processAllAvailable()
      assert(seen.toArray.toSet == Set("a", "b"))

      // steady state: a new commit = a new file = the next micro-batch
      store.put("c", """{"v":1}""")
      q.processAllAvailable()
      assert(seen.toArray.toSet == Set("a", "b", "c"))
    } finally q.stop()
  }

  test("feed-driven index maintenance ≡ full rebuild; updates and tombstones skip") {
    val docsA = Seq(
      ("1", "the quick brown fox jumps over the lazy dog near the river bank"),
      ("2", "soup recipes for a long cold winter evening with bread and cheese"))
    val docsB = Seq(
      ("3", "the quick brown fox jumps over the lazy cat near the river bank"),
      ("4", "entirely new content about mountains and oceans and deep valleys"))
    def json(t: String) =
      s"""{"text":${org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(org.json4s.JString(t)))}}"""

    val base = Files.createTempDirectory("cdc-maint").toString
    val store = DocumentStore(spark, base + "/db")
    val idx = base + "/idx"
    val full = base + "/full"

    // initial state: docsA staged AND already in the store — the stream's
    // catch-up replay must not double-index them (anti-join idempotence)
    Dedup.stageShingleIndex(docsA.toDF("doc_id", "text"), idx)
    docsA.foreach { case (id, t) => store.put(id, json(t)) }

    val q = StoreChanges.maintainShingleIndex(spark, store.path, idx,
      queryName = "cdc_maint_test")
    try {
      q.processAllAvailable()
      // the delta flows through the feed into the staged index
      docsB.foreach { case (id, t) => store.put(id, json(t)) }
      // an UPDATE to an indexed doc is skipped (re-index needs a re-stage),
      // and a doc tombstoned before its batch processes never lands
      store.put("1", json("completely different text after an update"))
      store.put("9", json("ephemeral doc deleted in the same batch"))
      store.delete("9")
      q.processAllAvailable()

      Dedup.stageShingleIndex((docsA ++ docsB).toDF("doc_id", "text"), full)
      def rows(p: String, t: String) =
        spark.read.parquet(Staged.resolve(spark, p) + "/" + t)
          .collect().map(_.toString).sorted.toSeq
      assert(rows(idx, "docs") == rows(full, "docs"))
      assert(rows(idx, "postings") == rows(full, "postings"))
    } finally q.stop()
  }
}
