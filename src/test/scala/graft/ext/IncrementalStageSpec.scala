package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Staged

/** Incremental staged-artifact maintenance: a delta append must be
  * indistinguishable from a full rebuild over old ∪ new (the daily-append
  * contract of a 100 TB pipeline), and versioned staging must keep the
  * previous version readable through one restage cycle. */
class IncrementalStageSpec extends SparkSpec {
  import spark.implicits._

  private val docsA = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "soup recipes for a long cold winter evening with bread and cheese"),
    (3L, "catalyst optimizer plans shuffles partitions and codegen stages"))
  private val docsB = Seq(
    (4L, "the quick brown fox jumps over the lazy cat near the river bank"),
    (5L, "entirely new content about mountains and oceans and deep valleys"))

  test("appendToShingleIndex ≡ full rebuild over old ∪ new (probe parity)") {
    val inc = Files.createTempDirectory("inc-idx-").toString
    val full = Files.createTempDirectory("full-idx-").toString
    Dedup.stageShingleIndex(docsA.toDF("doc_id", "text"), inc)
    Dedup.appendToShingleIndex(docsB.toDF("doc_id", "text"), inc)
    Dedup.stageShingleIndex((docsA ++ docsB).toDF("doc_id", "text"), full)

    // table-level parity: same doc rows, same pruned postings
    def rows(p: String, t: String) =
      spark.read.parquet(Staged.resolve(spark, p) + "/" + t)
        .collect().map(_.toString).sorted.toSeq
    assert(rows(inc, "docs") == rows(full, "docs"))
    assert(rows(inc, "postings") == rows(full, "postings"))

    // probe-level parity: identical admission matches, including against
    // appended docs (arrival 50 near-matches doc 4, which arrived by delta)
    val arrivals = Seq(
      (50L, "the quick brown fox jumps over the lazy cat near the river bend"),
      (51L, "totally unrelated arrival text with none of those words at all"))
      .toDF("doc_id", "text")
    def probe(p: String) =
      Dedup.nearDupMatches(arrivals, Dedup.loadShingleIndex(spark, p))
        .select("doc_id", "match_id").as[(Long, Long)].collect().toSet
    val viaInc = probe(inc)
    assert(viaInc == probe(full))
    assert(viaInc.contains((50L, 4L)), s"delta-appended doc must be probeable: $viaInc")
  }

  test("appendToShingleIndex re-applies the maxDf prune over MERGED counts") {
    // boilerplate df crosses maxDf only after the merge: 6 old + 6 new
    // copies with maxDf=10 — a naive postings concat would keep them all
    val boiler = "all rights reserved worldwide forever"
    val p = Files.createTempDirectory("inc-prune-").toString
    Dedup.stageShingleIndex(
      (1L to 6L).map(i => (i, boiler)).toDF("doc_id", "text"), p)
    assert(spark.read.parquet(Staged.resolve(spark, p) + "/postings").count() > 0,
      "df=6 ≤ maxDf: postings present after the initial stage")
    Dedup.appendToShingleIndex(
      (7L to 12L).map(i => (i, boiler)).toDF("doc_id", "text"), p)
    assert(spark.read.parquet(Staged.resolve(spark, p) + "/postings").count() == 0,
      "merged df=12 > maxDf=10: the prune must apply to old ∪ new counts")
  }

  test("appendToLmModel ≡ retraining on old ∪ new (score parity)") {
    val refA = docsA.toDF("doc_id", "text")
    val refB = docsB.toDF("doc_id", "text")
    val inc = Files.createTempDirectory("inc-lm-").toString
    val full = Files.createTempDirectory("full-lm-").toString
    Corpus.stageLmModel(refA, inc)
    Corpus.appendToLmModel(refB, inc)
    Corpus.stageLmModel(refA.unionByName(refB), full)

    val score = Seq((100L, "the quick brown fox runs over the lazy dog"),
      (101L, "soup and bread and cheese for the cold evening"))
      .toDF("doc_id", "text")
    def scored(p: String) =
      Corpus.lmScoreBatch(score, Corpus.loadLmModel(spark, p))
        .as[(Long, Long, Long)].collect().toSet
    assert(scored(inc) == scored(full),
      "integer-exact NLL parity between delta-merged and retrained models")
  }

  test("appendCorpusDelta: delta↔corpus and delta↔delta pairs land in the " +
    "artifact; no false pairs vs a full rebuild") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bend today"),
      (3L, "soup recipes for a long cold winter evening with bread and cheese"))
    val delta = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank still"),
      (11L, "catalyst engines compile queries into stages for the executors"),
      (12L, "catalyst engines compile queries into stages for the workers"))
    val pairsP = Files.createTempDirectory("inc-pairs-").toString
    val idxP = Files.createTempDirectory("inc-pidx-").toString
    Dedup.stageShingleIndex(corpus.toDF("doc_id", "text"), idxP)
    Dedup.stagePairs(corpus.toDF("doc_id", "text"), pairsP)
    Dedup.appendCorpusDelta(delta.toDF("doc_id", "text"), idxP, pairsP)

    val inc = Dedup.stagedPairs(spark, pairsP)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(inc.contains((1L, 2L)), "pre-delta corpus pair survives")
    assert(inc.contains((1L, 10L)) && inc.contains((2L, 10L)),
      s"delta doc near-dups both old twins via the index probe: $inc")
    assert(inc.contains((11L, 12L)), s"delta-internal pair found: $inc")
    assert(!inc.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 11L && p._2 == 10L),
      "no spurious pairs")
    // every incremental pair is a TRUE pair: the full rebuild agrees on
    // this fixture (df margins identical here)
    val fullP = Files.createTempDirectory("full-pairs-").toString
    Dedup.stagePairs((corpus ++ delta).toDF("doc_id", "text"), fullP)
    val full = Dedup.stagedPairs(spark, fullP)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(inc == full, s"inc=$inc full=$full")
    // and the index absorbed the delta: a new arrival matching doc 11
    // is caught by the updated admission index
    val m = Dedup.nearDupMatches(
      Seq((99L, "catalyst engines compile queries into stages for the machines"))
        .toDF("doc_id", "text"),
      Dedup.loadShingleIndex(spark, idxP))
      .select("match_id").as[Long].collect().toSet
    assert(m == Set(11L, 12L), s"post-delta index must cover delta docs: $m")
  }

  test("appendToDsirModel ≡ re-staging on old ∪ new (ratio-table parity)") {
    val rawA = docsA.toDF("doc_id", "text")
    val rawB = docsB.toDF("doc_id", "text")
    val tgtA = Seq((100L, "soup recipes for the cold winter evening")).toDF("doc_id", "text")
    val tgtB = Seq((101L, "bread and cheese by a warm fire")).toDF("doc_id", "text")
    val inc = Files.createTempDirectory("inc-dsir-").toString
    val full = Files.createTempDirectory("full-dsir-").toString
    Corpus.stageDsirModel(rawA, tgtA, inc, buckets = 101)
    Corpus.appendToDsirModel(Some(rawB), Some(tgtB), inc)
    Corpus.stageDsirModel(rawA.unionByName(rawB), tgtA.unionByName(tgtB),
      full, buckets = 101)
    def ratio(p: String) = Corpus.loadDsirRatio(spark, p)
      .collect().map(_.toString).sorted.toSeq
    assert(ratio(inc) == ratio(full),
      "merged-count ratio table must equal the retrained one row-for-row")
    // raw-only refresh also works (target side unchanged)
    Corpus.appendToDsirModel(Some(rawA), None, inc)
    assert(Corpus.loadDsirRatio(spark, inc).count() == 101)
  }

  test("versioned staging: previous version stays readable through one restage") {
    val p = Files.createTempDirectory("staged-ver-").toString
    Staged.stageVersion(spark, p)(d => Seq(1).toDF("v").write.parquet(d + "/t"))
    val v1 = Staged.resolve(spark, p)
    val captured = spark.read.parquet(v1 + "/t") // a live consumer's plan
    Staged.stageVersion(spark, p)(d => Seq(2).toDF("v").write.parquet(d + "/t"))
    val v2 = Staged.resolve(spark, p)
    assert(v2 != v1, "resolve moves to the new version")
    assert(spark.read.parquet(v2 + "/t").as[Int].head() == 2)
    assert(captured.as[Int].head() == 1,
      "the un-restarted consumer still reads its consistent old snapshot")
    // a THIRD stage prunes v1 (keep=2): only the newest two remain
    Staged.stageVersion(spark, p)(d => Seq(3).toDF("v").write.parquet(d + "/t"))
    assert(!new java.io.File(v1).exists(), "keep=2: v1 pruned on the 3rd stage")
    assert(new java.io.File(v2).exists())
    assert(spark.read.parquet(Staged.resolve(spark, p) + "/t").as[Int].head() == 3)
  }

  test("resolve falls back to the flat pre-versioning layout") {
    val p = Files.createTempDirectory("staged-flat-").toString
    assert(Staged.resolve(spark, p.toString) == p.toString)
  }
}
