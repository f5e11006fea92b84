package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ext.Dedup

/** Online near-dup admission: staged-index probe semantics in batch, then
  * the same decisions end-to-end through a real streaming query. */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep green forest to hide from every hunter"
  private val nearDup = base.replace("green", "dark") // one token changed
  private val fresh = "completely different words about spark catalyst " +
    "optimizer plans shuffles partitions and codegen stages in a cluster"
  private val freshDup = fresh.replace("cluster", "warehouse")

  private lazy val indexPath = {
    val p = java.nio.file.Files.createTempDirectory("graft-streamdedup-").toString
    Dedup.stageShingleIndex(
      Seq((10L, base), (11L, "soup recipes for a long cold winter evening " +
        "with bread and cheese and a warm fire burning slowly")).toDF("doc_id", "text"),
      p)
    p
  }

  test("batch: matches hit the staged corpus, filter admits the rest") {
    val index = Dedup.loadShingleIndex(spark, indexPath)
    val arrivals = Seq((1L, nearDup), (2L, fresh), (3L, base)).toDF("doc_id", "text")
    val m = Dedup.nearDupMatches(arrivals, index)
      .select("doc_id", "match_id").as[(Long, Long)].collect().toSet
    assert(m == Set((1L, 10L), (3L, 10L)),
      "exact copy and 1-token edit match corpus doc 10; fresh doc matches nothing")
    val admitted = Dedup.nearDupFilter(arrivals, index)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(2L))
  }

  test("short docs (single shingle) still match: minCommon caps at |sh|") {
    // a ≤3-token doc has exactly ONE shingle; a flat minCommon=2 would
    // exempt short-doc duplicates from admission filtering entirely
    val p = java.nio.file.Files.createTempDirectory("graft-shortdoc-").toString
    Dedup.stageShingleIndex(Seq((20L, "buy cheap pills")).toDF("doc_id", "text"), p)
    val index = Dedup.loadShingleIndex(spark, p)
    val arrivals = Seq((1L, "buy cheap pills"), (2L, "entirely unrelated text here"))
      .toDF("doc_id", "text")
    val m = Dedup.nearDupMatches(arrivals, index)
      .select("doc_id", "match_id").as[(Long, Long)].collect().toSet
    assert(m == Set((1L, 20L)), s"verbatim short-doc dup must be caught: $m")
    assert(Dedup.nearDupFilter(arrivals, index)
      .select("doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("batch: intraBatch also collapses mutual dups inside one batch") {
    val index = Dedup.loadShingleIndex(spark, indexPath)
    val arrivals = Seq((1L, fresh), (2L, freshDup), (3L, nearDup)).toDF("doc_id", "text")
    val without = StreamDedup.admitBatch(arrivals, index)
      .select("doc_id").as[Long].collect().toSet
    assert(without == Set(1L, 2L), "vs-corpus only: both fresh twins admitted")
    val withIntra = StreamDedup.admitBatch(arrivals, index, intraBatch = true)
      .select("doc_id").as[Long].collect().toSet
    assert(withIntra == Set(1L), "intra-batch pair keeps the lowest id")
  }

  test("resident index: re-staging a live path serves the NEW corpus; a new session re-pins") {
    val p = java.nio.file.Files.createTempDirectory("graft-restage-").toString
    Dedup.stageShingleIndex(Seq((1L, base)).toDF("doc_id", "text"), p)
    val arrivals = Seq((50L, fresh)).toDF("doc_id", "text")
    assert(Dedup.nearDupMatches(arrivals, Dedup.residentShingleIndex(spark, p))
      .count() == 0, "fresh doc matches nothing in the v1 index")
    // hot-swap flow: re-stage the SAME path with a corpus that now holds
    // the doc — the resident entry must not serve stale v1 blocks
    Dedup.stageShingleIndex(Seq((1L, base), (2L, fresh)).toDF("doc_id", "text"), p)
    val m = Dedup.nearDupMatches(arrivals, Dedup.residentShingleIndex(spark, p))
      .select("doc_id", "match_id").as[(Long, Long)].collect().toSet
    assert(m == Set((50L, 2L)), s"post-restage index must see the new corpus doc: $m")
    // a different session re-pins rather than serving session-bound plans
    val s2 = spark.newSession()
    val viaS2 = Dedup.residentShingleIndex(s2, p)
    assert(viaS2.docs.sparkSession eq s2, "cache entry must rebind to the caller's session")
    Dedup.releaseShingleIndex(p)
  }

  test("hot shingles are dropped at stage time: boilerplate can't flood candidates") {
    // one shingle shared by MANY corpus docs (df > maxDf=10) must be
    // pruned from the postings, so an arrival carrying only that shingle
    // generates zero candidate pairs instead of fanning out to every doc
    val boiler = "all rights reserved worldwide"
    val p = java.nio.file.Files.createTempDirectory("graft-hotshingle-").toString
    Dedup.stageShingleIndex(
      (1L to 40L).map(i => (i, boiler)).toDF("doc_id", "text"), p)
    val index = Dedup.loadShingleIndex(spark, p)
    assert(index.postings.count() == 0, "df-40 shingles must be pruned (maxDf=10)")
    assert(Dedup.nearDupMatches(Seq((99L, boiler)).toDF("doc_id", "text"), index)
      .count() == 0, "probe fan-out is bounded by the stage-time df cap")
  }

  test("restage while the stream runs: next batch probes the NEW index, no restart") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = java.nio.file.Files.createTempDirectory("graft-liveswap-").toString
    Dedup.stageShingleIndex(Seq((10L, base)).toDF("doc_id", "text"), p)
    val in = MemoryStream[(Long, String)]
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamDedup.admit(
      in.toDF().toDF("doc_id", "text"), p,
      batch => admitted.synchronized {
        admitted ++= batch.select("doc_id").as[Long].collect()
      },
      queryName = "liveswap_test")
    try {
      // batch 1 against v1: fresh doc admitted (not in the corpus yet)
      in.addData((1L, fresh))
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) == Set(1L))
      // absorb the admitted doc via the INCREMENTAL path while the query
      // runs — the documented production flow for growing the corpus
      Dedup.appendToShingleIndex(Seq((1L, fresh)).toDF("doc_id", "text"), p)
      // batch 2: a near-dup of the just-absorbed doc must now be dropped,
      // and an unrelated doc admitted — decisions from the NEW version,
      // picked up without restarting the query
      in.addData((2L, freshDup), (3L, "hexagonal basalt columns rise from " +
        "the cold northern shore under a pale winter sun"))
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) == Set(1L, 3L),
        s"post-restage batch must probe the appended corpus: " +
          admitted.synchronized(admitted.toSet))
      assert(q.isActive && q.exception.isEmpty,
        "the SAME query served both versions: no restart-loop, no stale-file reads")
    } finally { q.stop(); Dedup.releaseShingleIndex(p) }
  }

  test("skew stress: a shingle carried by EVERY arrival keeps probe fan-in " +
    "bounded by the stage-time df cap") {
    // corpus: hot shingle "zz qq ww" in exactly maxDf=10 docs (the worst
    // SURVIVING df) + 990 unrelated docs; batch: 200 arrivals ALL carrying
    // it. Without the stage-time cap a df-1000 boilerplate shingle would
    // fan the candidate join out to batch×corpus (200k rows); the cap
    // bounds it at batch×maxDf (2000). The join's numOutputRows metric IS
    // the fan-in — measured on the real probe plan, not a proxy.
    val p = java.nio.file.Files.createTempDirectory("graft-skew-").toString
    val corpus = ((1L to 10L).map(i =>
      (i, s"opening words number $i with distinct content zz qq ww")) ++
      (11L to 1000L).map(i =>
        (i, s"completely different text body $i about topic ${i * 7} " +
          s"with words ${i * 13} and ${i * 17} nothing shared here")))
      .toDF("doc_id", "text")
    Dedup.stageShingleIndex(corpus, p)
    val index = Dedup.loadShingleIndex(spark, p)
    val arrivals = (1L to 200L).map(i =>
      (5000L + i, s"arrival body $i talks about subject ${i * 11} " +
        s"then ends with the boilerplate zz qq ww"))
      .toDF("doc_id", "text")

    val m = Dedup.nearDupMatches(arrivals, index)
    val rows = m.collect()
    // semantics: ONE shared shingle stays below the minCommon=2 evidence
    // bar for long docs — boilerplate alone never makes a near-dup match
    assert(rows.isEmpty, s"single shared boilerplate shingle must not match: ${rows.toSeq}")
    // fan-in: every join in the executed probe plan stays ≤ batch×maxDf
    val joinOut = joinOutputRows(m)
    assert(joinOut.nonEmpty, "probe plan must contain the candidate join")
    assert(joinOut.max <= 200L * 10 + 500,
      s"candidate fan-in exceeded the batch×maxDf bound: $joinOut")
    assert(joinOut.max >= 200L * 10,
      s"the hot bucket was supposed to be probed (sanity): $joinOut")
    graft.core.CacheRegistry.unpersistAll()
    Dedup.releaseShingleIndex(p)
  }

  /** numOutputRows of every join node in an executed (adaptive) plan. */
  private def joinOutputRows(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def walk(p: SparkPlan): Seq[Long] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case j: BaseJoinExec =>
        j.metrics.get("numOutputRows").map(_.value).toSeq ++ j.children.flatMap(walk)
      case other => other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("streaming: per-micro-batch admission matches the batch contract") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamDedup.admit(
      in.toDF().toDF("doc_id", "text"), indexPath,
      batch => admitted.synchronized {
        admitted ++= batch.select("doc_id").as[Long].collect()
      },
      queryName = "admit_test", intraBatch = true)
    try {
      in.addData((1L, nearDup), (2L, fresh))
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) == Set(2L),
        "batch 1: near-dup of corpus dropped, fresh admitted")
      // batch 2: the index does NOT grow mid-query (documented contract) —
      // a near-dup of an ADMITTED doc still passes; a corpus dup still drops
      in.addData((4L, freshDup), (5L, base))
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.toSet) == Set(2L, 4L))
    } finally q.stop()
  }
}
